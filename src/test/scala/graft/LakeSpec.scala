package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{JdbcSink, PartitionedLake}

class LakeSpec extends SparkSuite {
  import spark.implicits._

  test("deleteInsert replaces only the partitions present in the refresh") {
    val dir = Files.createTempDirectory("graft_lake_spec").toString
    val initial = Seq(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L),
      ("2024-01-02", "a", 3L), ("2024-01-03", "a", 4L))
      .toDF("date_id", "k", "v")
    PartitionedLake.writeAll(initial, dir, Seq("date_id"))
    // refresh one day with different content (fewer rows, new values)
    val refresh = Seq(("2024-01-02", "z", 99L)).toDF("date_id", "k", "v")
    PartitionedLake.deleteInsert(refresh, dir, Seq("date_id"))
    val back = PartitionedLake.read(spark, dir)
      .select(col("date_id").cast("string"), col("k"), col("v"))
      .as[(String, String, Long)].collect().toSet
    assert(back == Set(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L),
      ("2024-01-02", "z", 99L), ("2024-01-03", "a", 4L)))
  }

  test("mergeUpsert updates matched keys, inserts new keys, leaves other partitions' files alone") {
    val dir = Files.createTempDirectory("graft_lake_merge").toString
    val initial = Seq(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L),
      ("2024-01-02", "a", 3L))
      .toDF("date_id", "k", "v")
    PartitionedLake.writeAll(initial, dir, Seq("date_id"))
    val untouched = new java.io.File(s"$dir/date_id=2024-01-01")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap
    // update (2024-01-02, a) and insert (2024-01-02, c)
    val updates = Seq(("2024-01-02", "a", 30L), ("2024-01-02", "c", 5L))
      .toDF("date_id", "k", "v")
    PartitionedLake.mergeUpsert(spark, dir, updates,
      keyCols = Seq("date_id", "k"), partCols = Seq("date_id"))
    val back = PartitionedLake.read(spark, dir)
      .select(col("date_id").cast("string"), col("k"), col("v"))
      .as[(String, String, Long)].collect().toSet
    assert(back == Set(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L),
      ("2024-01-02", "a", 30L), ("2024-01-02", "c", 5L)))
    // the unaffected partition's files were not rewritten
    val after = new java.io.File(s"$dir/date_id=2024-01-01")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == untouched)
  }

  test("deleteInsert is idempotent") {
    val dir = Files.createTempDirectory("graft_lake_spec2").toString
    val df = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("date_id", "v")
    PartitionedLake.writeAll(df, dir, Seq("date_id"))
    PartitionedLake.deleteInsert(df.filter(col("date_id") === "2024-01-02"),
      dir, Seq("date_id"))
    PartitionedLake.deleteInsert(df.filter(col("date_id") === "2024-01-02"),
      dir, Seq("date_id"))
    assert(PartitionedLake.read(spark, dir).count() == 2)
  }

  test("registerTable + recoverPartitions resolves the lake by name with pruning") {
    val dir = Files.createTempDirectory("graft_lake_cat").toString
    val df = Seq(("2024-01-01", 1L), ("2024-01-01", 2L), ("2024-01-02", 3L))
      .toDF("date_id", "v")
    PartitionedLake.writeAll(df, dir, Seq("date_id"))
    PartitionedLake.registerTable(spark, "graft_cat_events", dir,
      "v BIGINT, date_id STRING", Seq("date_id"))
    val day1 = spark.table("graft_cat_events")
      .filter(col("date_id") === "2024-01-01")
    assert(day1.count() == 2)
    // partition metadata really is in the catalog (Glue-partition analogue)
    assert(spark.sql("SHOW PARTITIONS graft_cat_events").count() == 2)
  }

  test("compact rewrites a partition's many small files into one") {
    val dir = Files.createTempDirectory("graft_lake_compact").toString
    val df = spark.range(1000)
      .selectExpr("id", "CASE WHEN id % 2 = 0 THEN '2024-01-01' ELSE '2024-01-02' END AS date_id")
      .repartition(8)
    PartitionedLake.writeAll(df, dir, Seq("date_id"))
    def files(day: String) =
      new java.io.File(s"$dir/date_id=$day").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(files("2024-01-01") > 1)
    PartitionedLake.compact(spark, dir, "date_id", Seq("2024-01-01"))
    assert(files("2024-01-01") == 1)
    assert(files("2024-01-02") > 1) // untouched partition keeps its files
    assert(PartitionedLake.read(spark, dir).count() == 1000)
    // filesPerPartition actually controls the output file count
    PartitionedLake.compact(spark, dir, "date_id", Seq("2024-01-02"),
      filesPerPartition = 3)
    assert(files("2024-01-02") == 3)
    assert(PartitionedLake.read(spark, dir).count() == 1000)
  }

  test("overBudgetPartitions flags only fragmented partitions") {
    val dir = Files.createTempDirectory("graft_lake_budget").toString
    val frag = spark.range(100)
      .selectExpr("id", "'2024-02-01' AS date_id").repartition(4)
    val tidy = spark.range(100)
      .selectExpr("id", "'2024-02-02' AS date_id").coalesce(1)
    PartitionedLake.writeAll(frag.unionByName(tidy).repartition(4, col("date_id"), col("id") % 4), dir, Seq("date_id"))
    // both days now hold up to 4 files; rewrite day 2 down to one
    PartitionedLake.compact(spark, dir, "date_id", Seq("2024-02-02"))
    val over = PartitionedLake.overBudgetPartitions(spark, dir, "date_id", maxFiles = 1)
    assert(over == Seq("2024-02-01"),
      s"only the fragmented day must be flagged, got $over")
  }

  test("partition evolution: per-generation pruning, nothing rewritten") {
    val root = Files.createTempDirectory("graft_lake_evolve").toString + "/t"
    val gen1 = spark.range(100).selectExpr("id",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS kind",
      "'2024-01-01' AS date_id")
    val gen2 = spark.range(100, 200).selectExpr("id",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS kind",
      "'2024-01-02' AS date_id")
    PartitionedLake.writeSegment(gen1, root, "gen1", Seq("date_id"))
    PartitionedLake.writeSegment(gen2, root, "gen2", Seq("date_id", "kind"))
    val all = PartitionedLake.readSegments(spark, root)
    assert(all.count() == 200, "generations union without loss or overlap")
    // a filter on the EVOLVED column prunes directories only where that
    // generation partitions by it: gen2 opens kind=a files only, gen1
    // (kind is a data column there) necessarily opens its day's files
    val pruned = all.filter(col("kind") === "a")
    assert(pruned.count() == 100)
    // _metadata does not resolve through a union; input_file_name is
    // evaluated at each leaf scan and survives it
    val opened = pruned.select(input_file_name())
      .distinct().collect().map(_.getString(0))
    assert(opened.exists(_.contains("/gen1/")), "gen1 must still be read")
    assert(opened.filter(_.contains("/gen2/")).forall(_.contains("/kind=a/")),
      "the finer generation must prune the kind=b directories")
    // the old generation was never rewritten into the new spec
    assert(!new java.io.File(s"$root/gen1/date_id=2024-01-01")
      .listFiles().exists(_.getName.startsWith("kind=")))
    // a drifted manifest (hand-copied segment, wrong spec) must fail the
    // read loudly, not silently union under the wrong layout
    Files.write(java.nio.file.Paths.get(s"$root/gen2/_layout"),
      "date_id".getBytes("UTF-8"))
    val drift = intercept[IllegalArgumentException] {
      PartitionedLake.readSegments(spark, root).count()
    }
    assert(drift.getMessage.contains("layout drift"))
  }

  test("jdbc delete statement is keyed and parameterized") {
    assert(JdbcSink.deleteStatement("dashboard", "north_america_weather", "date_id") ==
      """DELETE FROM dashboard.north_america_weather WHERE "date_id" = ?""")
  }

  test("jdbc stage identifier stays within the DB bound with the key tag intact") {
    val tag = "0123456789abcdef0123456789abcdef" // 32-hex md5 key tag
    // short table: untruncated
    assert(JdbcSink.stageName("gold", tag) == s"gold__stage_$tag")
    // long table: bounded at 63, full key tag preserved at the end —
    // Postgres truncates at 63 bytes silently, which would chop the tag
    val long = "a_very_long_serving_table_name_that_overflows_identifiers"
    val s = JdbcSink.stageName(long, tag)
    assert(s.length <= 63 && s.endsWith(s"__stage_$tag"))
    // two long tables sharing a 60-char prefix still stage separately
    val s2 = JdbcSink.stageName(long + "_v2", tag)
    assert(s2 != s && s2.length <= 63)
  }

  test("jdbc sink delete-by-key + append against embedded Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties()
    // day 1 (to be refreshed) + day 2 (must survive)
    val seed = Seq(
      ("2024-01-01", "old_a", 1.0), ("2024-01-01", "old_b", 2.0),
      ("2024-01-02", "keep", 3.0)).toDF("date_id", "city", "temp")
    seed.write.mode("overwrite")
      .option("createTableColumnTypes", "date_id VARCHAR(10), city VARCHAR(50)")
      .jdbc(url, "dashboard.weather", props)
    val refresh = Seq(("2024-01-01", "new_a", 9.0)).toDF("date_id", "city", "temp")
    JdbcSink.load(refresh, url, "dashboard", "weather", "date_id", "2024-01-01",
      props, numPartitions = 1)
    val back = spark.read.jdbc(url, "dashboard.weather", props)
      .select("date_id", "city", "temp")
      .as[(String, String, Double)].collect().toSet
    assert(back == Set(
      ("2024-01-02", "keep", 3.0), ("2024-01-01", "new_a", 9.0)))
  }
}
