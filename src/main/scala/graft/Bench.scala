package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.local("graft-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")

    // consume through queryExecution.toRdd: every output column is actually
    // computed. A count() action would let Catalyst prune all projections
    // and eliminate sorts, timing a bare scan for map-only queries.
    def consume(name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd
          .foreach(_ => ())
        true
      } catch { case _: Throwable => false }

    // dev aid: SPARK_GRAFT_ONLY=q23,q35 restricts the run to matching keys
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    // streaming drains run LAST: their state-store residue (see
    // SparkEntry.streamingQueries) must never precede a batch timing
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
      .sortBy(SparkEntry.streamingQueries.contains)
    // warm-up pass: JVM JIT + codegen compilation; then two measured passes
    // with min-per-query — steady-state throughput with less scheduler/GC
    // noise than a single pass (this box shows ±20% run-to-run)
    names.foreach(consume)
    def once(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = consume(name)
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val results = names.map { name =>
      val (t1, ok1) = once(name)
      val (t2, ok2) = once(name)
      (name, math.min(t1, t2), ok1 && ok2)
    }
    val out = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$out,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
