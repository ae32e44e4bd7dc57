package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev timing probe — not part of the driver contract. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local("graft-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    println("[probe] docs rows=" + docs.count())
    println("[probe] total words=" + docs.select(
      sum(size(graft.functions.TextFunctions.words(col("text"))))).head().getLong(0))

    // warm-up
    graft.operators.Dedup.simhashes(docs, "doc_id", "text").queryExecution.toRdd.foreach(_ => ())

    val sim = time("simhashes") {
      val s = graft.operators.Dedup.simhashes(docs, "doc_id", "text").localCheckpoint(true)
      s.queryExecution.toRdd.foreach(_ => ())
      s
    }
    time("pairsFromSigs") {
      graft.operators.Dedup.simhashNearDupPairsFromSigs(
        sim.select(col("doc_id").as("id"), col("simhash")))
        .queryExecution.toRdd.foreach(_ => ())
    }
    val sh = graft.operators.Dedup.simhashes(docs, "doc_id", "text")
    sh.queryExecution.toRdd.foreach(_ => ())
    println("[plan-start]")
    val cg = org.apache.spark.sql.execution.debug.codegenString(
      sh.queryExecution.executedPlan)
    println(cg.linesIterator.filter(l =>
      l.contains("WholeStageCodegen") || l.contains("HashAggregate") ||
        l.contains("Generate") || l.contains("maxMethodCodeSize") ||
        l.contains("Found")).map("[plan] " + _.take(160)).mkString("\n"))
    time("words+hash only") {
      docs.select(col("doc_id"), explode(graft.functions.TextFunctions.words(col("text"))).as("__w"))
        .select(col("doc_id"), xxhash64(col("__w")).as("__h"))
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
