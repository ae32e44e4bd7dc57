#!/usr/bin/env bash
# Pre-snapshot gate. Rounds 4 and 5 were both formally zeroed because the
# end-of-round snapshot did not compile; run this before EVERY commit that
# could be swept into the snapshot, so the snapshot commit is nothing but
# `git commit` of an already-validated tree.
#
# Usage:
#   tools/presnapshot.sh                      # compile + Test/compile gate
#   tools/presnapshot.sh q255_a,q256_b        # + smoke those queries (sf0.001)
#   tools/presnapshot.sh all                  # + full Verify gate (sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== presnapshot: sbt compile + Test/compile =="
sbt -batch compile Test/compile

ONLY="${1:-}"
if [ -n "$ONLY" ]; then
  OUT=target/presnapshot_out
  rm -rf "$OUT"
  echo "== presnapshot: Verify sf0.001 ($ONLY) =="
  if [ "$ONLY" = "all" ]; then
    sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $OUT"
  else
    sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $OUT $ONLY"
  fi
  python3 tools/check_oracle.py /root/testdata/sf0.001 "$OUT"
fi

echo "== presnapshot: working-tree status =="
git status --short
echo "== presnapshot: OK =="
