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

    // sf1 section: when the staged 10×-replica directory exists (built by
    // `runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1 10`), time a
    // batch headline subset there too — the above-sf0.1 exercise of the 2×
    // gate. Guarded so a missing/partial stage can never break the main
    // JSON line; one warm-up + one measured pass (wall-time bound).
    val sf1Json: String = {
      val sf1Dir = "/root/repo/target/sf1"
      val staged = graft.sources.Tables.all.forall(t =>
        new java.io.File(s"$sf1Dir/$t.parquet/_SUCCESS").exists())
      val forced = sys.env.get("SPARK_GRAFT_SF1").contains("1")
      if (!staged || (only.nonEmpty && !forced)) ""
      else try {
        val headline = Seq(
          "q07_agg_full", "q08_filter_pushdown", "q09_join_broadcast",
          "q10_join_multiway", "q11_window", "q13_distinct_topk",
          "q14_events_hourly", "q15_sessionize", "q18_quantiles",
          "q19_skew_salted_agg", "q21_dedup_exact", "q22_dedup_minhash",
          "q31_token_count", "q42_explode_words", "q85_tfidf",
          "q100_pagerank", "q138_seq_packing", "q156_vocab_build")
        def consume1(name: String): Boolean =
          try {
            SparkEntry.queries(name)(spark, sf1Dir).queryExecution.toRdd
              .foreach(_ => ())
            true
          } catch { case _: Throwable => false }
        headline.foreach(consume1)
        val r1 = headline.map { name =>
          val t0 = System.nanoTime()
          val ok = consume1(name)
          (name, (System.nanoTime() - t0) / 1e9, ok)
        }
        val q1 = r1.map { case (k, v, _) => s"\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        val f1 = r1.collect { case (k, _, false) => s"\"" + k + "\"" }
          .mkString("[", ",", "]")
        s""","sf1":{"value":${r1.map(_._2).sum},"queries":$q1,"failed":$f1,"dir":"$sf1Dir"}"""
      } catch { case _: Throwable => "" }
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$out,"failed":$failed,"sf":"$sfDir"$sf1Json}""")
    spark.stop()
  }
}
