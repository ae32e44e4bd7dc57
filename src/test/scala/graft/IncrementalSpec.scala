package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Incremental
import graft.sources.{PartitionedLake, VersionedLake}

class IncrementalSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/lake"
  }

  /** Sum of numFiles over every file scan in an executed plan. AQE wraps
    * finished stages as leaf QueryStageExec nodes, so the scans have to be
    * dug out recursively.
    */
  private def scanFiles(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scanFiles(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scanFiles(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec =>
      f.metrics("numFiles").value
    case other => other.children.map(scanFiles).sum
  }

  private def frame(rows: Seq[(String, String, Long, Double)]) = {
    val schema = StructType(Seq(
      StructField("p", StringType), StructField("k", StringType),
      StructField("n", LongType), StructField("v", DoubleType)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3, r._4)): _*),
      schema)
  }

  test("mergeAdditive re-aggregates only the affected partition") {
    val lake = tmp("inc")
    PartitionedLake.writeAll(
      frame(Seq(("a", "x", 10L, 1.5), ("a", "y", 5L, 2.0), ("b", "x", 7L, 3.0))),
      lake, Seq("p"))
    // snapshot the untouched partition's files before the merge
    val aDir = Paths.get(lake, "p=a")
    def listing(dir: java.nio.file.Path) = {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f))
          .toMap
      } finally s.close()
    }
    val before = listing(aDir)
    assert(before.nonEmpty)

    // delta: new partial counts for (b, x) and a brand-new key (b, z)
    Incremental.mergeAdditive(spark, lake,
      frame(Seq(("b", "x", 3L, 0.5), ("b", "z", 1L, 9.0))),
      keyCols = Seq("k"), partCol = "p", measureCols = Seq("n", "v"))

    // partition a: byte-identical files (never read, never rewritten)
    assert(listing(aDir) == before, "unaffected partition must not be rewritten")
    // partition b: state + partials re-aggregated
    val out = PartitionedLake.read(spark, lake)
      .select(col("p").cast("string"), col("k"), col("n"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      ("a", "x", 10L, 1.5), ("a", "y", 5L, 2.0),
      ("b", "x", 10L, 3.5), ("b", "z", 1L, 9.0)))
  }

  test("mergeJoinAppend enriches only the delta and touches only its partition") {
    val lake = tmp("incj")
    val dim = {
      val schema = StructType(Seq(
        StructField("k", StringType), StructField("seg", StringType)))
      spark.createDataFrame(java.util.Arrays.asList(
        Row("x", "S1"), Row("y", "S2"), Row("z", "S3")), schema)
    }
    // base view: (fact ⋈ dim) for partitions a and b
    PartitionedLake.writeAll(
      frame(Seq(("a", "x", 1L, 1.0), ("b", "y", 2L, 2.0)))
        .join(dim, Seq("k")), lake, Seq("p"))
    def listing(dir: java.nio.file.Path) = {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f))
          .toMap
      } finally s.close()
    }
    val beforeA = listing(Paths.get(lake, "p=a"))
    // late fact rows for partition b only
    Incremental.mergeJoinAppend(spark, lake,
      frame(Seq(("b", "z", 3L, 3.0))), dim, "k", "p")
    assert(listing(Paths.get(lake, "p=a")) == beforeA,
      "unaffected partition must not be rewritten")
    val out = PartitionedLake.read(spark, lake)
      .select(col("p").cast("string"), col("k"), col("seg"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      ("a", "x", "S1", 1L), ("b", "y", "S2", 2L), ("b", "z", "S3", 3L)))
  }

  test("versioned lake: as-of reads replay upserts and deletes per version") {
    val lake = tmp("ver")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("val", StringType),
      StructField("op", StringType)))
    def changes(rows: (Long, String, String)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*), schema)

    VersionedLake.writeVersion(changes((1L, "a1", "U"), (2L, "b1", "U")), lake, 1L)
    VersionedLake.writeVersion(changes((1L, "a2", "U"), (2L, "", "D")), lake, 2L)
    VersionedLake.writeVersion(changes((2L, "b3", "U"), (3L, "c3", "U")), lake, 3L)

    def asOf(v: Long) = VersionedLake.readAsOf(spark, lake, v, Seq("k"))
      .select(col("k"), col("val"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asOf(1L) == Map(1L -> "a1", 2L -> "b1"))
    assert(asOf(2L) == Map(1L -> "a2")) // delete dropped key 2
    assert(asOf(3L) == Map(1L -> "a2", 2L -> "b3", 3L -> "c3")) // re-insert after delete
  }

  test("versioned lake: re-writing a version id replaces that change set") {
    val lake = tmp("idem")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("op", StringType)))
    def changes(rows: (Long, String)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
    VersionedLake.writeVersion(changes((1L, "U"), (2L, "U")), lake, 1L)
    VersionedLake.writeVersion(changes((9L, "U")), lake, 1L) // backfill replaces v1
    val keys = VersionedLake.readAsOf(spark, lake, 1L, Seq("k"))
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(keys == Set(9L))
  }

  test("compact: checkpointed base bounds the scan, history stays readable") {
    val lake = tmp("compact")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("val", StringType),
      StructField("op", StringType)))
    def changes(rows: (Long, String, String)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*), schema)
    VersionedLake.writeVersion(changes((1L, "a1", "U"), (2L, "b1", "U")), lake, 1L)
    VersionedLake.writeVersion(changes((2L, "", "D"), (3L, "c2", "U")), lake, 2L)
    VersionedLake.compact(spark, lake, version = 2L, keyCols = Seq("k"), newVersion = 3L)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("val")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Map(1L -> "a1", 3L -> "c2")
    // compacted base reproduces the snapshot it checkpointed
    assert(rows(VersionedLake.readAsOf(spark, lake, 3L, Seq("k"), floorVersion = 3L))
      == expected)
    // pre-compaction history is untouched
    assert(rows(VersionedLake.readAsOf(spark, lake, 1L, Seq("k")))
      == Map(1L -> "a1", 2L -> "b1"))
    // the floored read scans ONE change set however long the history is
    val df = VersionedLake.readAsOf(spark, lake, 3L, Seq("k"), floorVersion = 3L)
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    assert(scanFiles(plan) == 1,
      "floored as-of read must scan only the compacted base")
  }

  test("as-of read partition-prunes later versions at the scan") {
    val lake = tmp("prune")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("op", StringType)))
    def changes(rows: (Long, String)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
    (1L to 4L).foreach(v => VersionedLake.writeVersion(changes((v, "U")), lake, v))
    val df = VersionedLake.readAsOf(spark, lake, 2L, Seq("k"))
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters") &&
      plan.toString.contains("version"),
      s"version filter must prune partition directories, plan was:\n$plan")
    // execute THIS plan and read its scan metric: only the v<=2 files read
    plan.execute().count()
    val numFiles = scanFiles(plan)
    assert(numFiles == 2, s"expected 2 change files scanned, got $numFiles")
  }
}
