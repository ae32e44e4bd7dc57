#!/bin/bash
# Dev board runner: the full 658-query sf0.1 board in prefix chunks so
# each java invocation stays under a 10-minute cap. Writes one JSON line
# per chunk to target/bench_chunk_<i>.json (via Bench's bench_last.json
# persistence). NOT the driver's bench — a dev feedback loop only.
set -u
cd /root/repo
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CHUNKS=("q0,q1" "q2,q3" "q4,q5" "q6,q7,q8,q9")
i=0
for c in "${CHUNKS[@]}"; do
  i=$((i+1))
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY="$c" \
    java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > "target/bench_chunk_raw_$i.log" 2>&1
  cp target/bench_last.json "target/bench_chunk_$i.json" 2>/dev/null
  echo "chunk $i ($c) done rc=$?"
done
