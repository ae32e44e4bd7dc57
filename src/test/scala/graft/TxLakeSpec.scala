package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.TxLake

class TxLakeSpec extends SparkSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_txlake").toString + "/t"

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select(col("id")).collect().map(_.getLong(0)).toSet

  test("append and overwrite commits; time travel reads every snapshot") {
    val lake = tmp()
    assert(TxLake.commit(spark, lake, df(1, 2)) == 1L)
    assert(TxLake.commit(spark, lake, df(3)) == 2L)
    assert(TxLake.commit(spark, lake, df(9), overwrite = true) == 3L)
    assert(ids(TxLake.readSnapshot(spark, lake, 1L)) == Set(1L, 2L))
    assert(ids(TxLake.readSnapshot(spark, lake, 2L)) == Set(1L, 2L, 3L))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(9L))
    assert(TxLake.latestVersion(lake) == 3L)
  }

  test("a reserved version makes a concurrent commit fail, not corrupt") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1))
    // simulate a concurrent writer that reserved v2 first
    val reserved = java.nio.file.Paths.get(lake, "_log", "00000002.json")
    Files.createDirectories(reserved.getParent)
    Files.createFile(reserved)
    intercept[TxLake.ConcurrentCommitException] {
      TxLake.commit(spark, lake, df(2))
    }
    // the pending reservation also hides nothing and blocks later reads
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L))
    // janitor clears it; the log moves forward again
    assert(TxLake.abandonPending(lake))
    assert(TxLake.commit(spark, lake, df(2)) == 2L)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L))
  }

  test("tagged commits are exactly-once: a re-delivered batch no-ops") {
    val lake = tmp()
    val v1 = TxLake.commit(spark, lake, df(1, 2), tag = "batch-0")
    // redelivery of the same batch (poison payload proves it's skipped)
    val v1b = TxLake.commit(spark, lake, df(99), tag = "batch-0")
    assert(v1b == v1)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L))
    assert(TxLake.commit(spark, lake, df(3), tag = "batch-1") == 2L)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 3L))
  }

  test("deleteWhere rewrites only the files containing matches") {
    val lake = tmp()
    // one file per commit so the affected-file accounting is deterministic
    TxLake.commit(spark, lake, df(1, 2, 3).coalesce(1))     // v1: no matches
    TxLake.commit(spark, lake, df(10, 11, 12).coalesce(1))  // v2: 10, 12 match
    val before = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    TxLake.deleteWhere(spark, lake, col("id") % 2 === 0 && col("id") >= 10)
    val after = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 3L, 11L))
    // v1's untouched file is still the ACTIVE original, not a copy
    val v1Files = before.filter(_.contains("/data/v1/"))
    assert(v1Files.nonEmpty && v1Files.subsetOf(after),
      "files without matching rows must stay active, never rewritten")
    // v2's affected file was swapped out
    assert(before.filter(_.contains("/data/v2/")).forall(!after.contains(_)))
  }

  test("updateWhere rewrites only affected files; null-predicate rows untouched") {
    val lake = tmp()
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("flag", LongType, nullable = true),
      StructField("v", LongType, nullable = false)))
    def f(rows: (Long, java.lang.Long, Long)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => R(r._1, r._2, r._3)): _*),
      schema).coalesce(1)
    TxLake.commit(spark, lake, f((1L, 7L, 10L), (2L, null, 20L)))  // v1: match + null
    TxLake.commit(spark, lake, f((3L, 1L, 30L)))                   // v2: no match
    val before = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    TxLake.updateWhere(spark, lake, col("flag") === 7L,
      Map("v" -> (col("v") + 100L)))
    val after = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    // untouched file stays active; affected file swapped
    assert(before.filter(_.contains("/data/v2/")).subsetOf(after))
    assert(before.filter(_.contains("/data/v1/")).forall(!after.contains(_)))
    val out = TxLake.readSnapshot(spark, lake)
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 110L, 2L -> 20L, 3L -> 30L),
      "matched row updated; null-predicate row rides through unchanged")
  }

  test("mergeByKey replaces matched keys, inserts the rest, prunes files") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2).coalesce(1))   // v1: contains key 2
    TxLake.commit(spark, lake, df(5, 6).coalesce(1))   // v2: no matched key
    import spark.implicits._
    val updates = Seq(2L, 9L).toDF("id")
    val before = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    TxLake.mergeByKey(spark, lake, updates, "id")
    val after = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 5L, 6L, 9L))
    // v2's file had no matched key: still the active original
    assert(before.filter(_.contains("/data/v2/")).subsetOf(after))
    assert(before.filter(_.contains("/data/v1/")).forall(!after.contains(_)))
    // duplicate update keys are rejected
    intercept[IllegalArgumentException] {
      TxLake.mergeByKey(spark, lake, Seq(3L, 3L).toDF("id"), "id")
    }
  }

  test("deleteWhere keeps null-predicate rows (three-valued logic)") {
    val lake = tmp()
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("user_id", LongType, nullable = true)))
    // ONE file mixing a genuine match (user_id=42), null-predicate rows,
    // and a plain survivor — the dangerous layout: the nulls share a file
    // with the match, so they ride through the rewrite
    val mixed = spark.createDataFrame(
      java.util.Arrays.asList(
        R(1L, 42L), R(2L, null), R(3L, 7L), R(4L, null)),
      schema).coalesce(1)
    TxLake.commit(spark, lake, mixed)
    TxLake.deleteWhere(spark, lake, col("user_id") === 42L)
    val out = TxLake.readSnapshot(spark, lake)
      .select(col("id"), col("user_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // only the TRUE-predicate row is gone; NULL-predicate rows survive
    assert(out == Map(2L -> None, 3L -> Some(7L), 4L -> None),
      s"null-predicate rows must survive an erasure rewrite, got $out")
  }

  test("logged file stats prune reads without touching skipped files") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2, 3).coalesce(1), statsCol = "id")
    TxLake.commit(spark, lake, df(10, 11).coalesce(1), statsCol = "id")
    TxLake.commit(spark, lake, df(20, 25).coalesce(1), statsCol = "id")
    // only the middle file's [10, 11] range overlaps [9, 15]
    val kept = TxLake.prunedFiles(lake, 9L, 15L)
    assert(kept.size == 1 && kept.head.contains("/data/v2/"),
      s"expected only v2's file, got $kept")
    assert(ids(TxLake.readPruned(spark, lake, 9L, 15L)) == Set(10L, 11L))
    // a file committed WITHOUT stats is conservatively kept
    TxLake.commit(spark, lake, df(100).coalesce(1))
    assert(TxLake.prunedFiles(lake, 9L, 15L).size == 2)
  }

  test("optimize compacts atomically; vacuum reclaims below the horizon only") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1).coalesce(1))
    TxLake.commit(spark, lake, df(2).coalesce(1))
    TxLake.commit(spark, lake, df(3).coalesce(1))
    val v = TxLake.optimize(spark, lake) // v4: one file supersedes three
    assert(v == 4L)
    def activeCount = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct().count()
    assert(activeCount == 1L)
    // pre-optimize time travel still works — removed files are on disk
    assert(ids(TxLake.readSnapshot(spark, lake, 2L)) == Set(1L, 2L))
    // vacuum at the horizon reclaims exactly the three superseded files
    assert(TxLake.vacuum(lake, retainVersion = v) == 3L)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 3L))
    // below-horizon snapshots are gone by design
    intercept[Exception] {
      TxLake.readSnapshot(spark, lake, 2L).collect()
    }
    // idempotent: nothing left to reclaim
    assert(TxLake.vacuum(lake, retainVersion = v) == 0L)
  }

  test("branch: zero-copy fork, isolated in both directions, fully operable") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2).coalesce(1))
    TxLake.commit(spark, lake, df(3).coalesce(1))
    val bp = TxLake.branch(lake, "exp")
    // the fork copies no data: the branch's active files ARE the parent's
    val parentFiles = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    val branchFiles = TxLake.readSnapshot(spark, bp)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(branchFiles == parentFiles)
    // divergent writes stay on their side
    TxLake.commit(spark, bp, df(99))
    TxLake.commit(spark, lake, df(4))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 3L, 4L))
    assert(ids(TxLake.readSnapshot(spark, bp)) == Set(1L, 2L, 3L, 99L))
    // rewriting ops work on the branch without touching the parent: the
    // erasure rewrites the SHARED file on the branch side only
    TxLake.deleteWhere(spark, bp, col("id") === 2L)
    assert(ids(TxLake.readSnapshot(spark, bp)) == Set(1L, 3L, 99L))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 3L, 4L),
      "a branch-side rewrite must never mutate the parent's view")
    // double-fork of the same name is rejected
    intercept[IllegalArgumentException] { TxLake.branch(lake, "exp") }
  }

  test("a pending (crashed) commit is invisible to readers") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1))
    // crashed writer: reservation exists, data landed, content never swapped
    val reserved = java.nio.file.Paths.get(lake, "_log", "00000002.json")
    Files.createFile(reserved)
    df(99).write.mode("overwrite").parquet(s"$lake/data/v2")
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L),
      "half-published commit must be invisible")
    assert(TxLake.latestVersion(lake) == 1L)
  }

  test("checkpoint: reads replay only post-checkpoint entries; time travel intact") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2)) // v1
    TxLake.commit(spark, lake, df(3))    // v2
    TxLake.commit(spark, lake, df(4))    // v3
    assert(TxLake.replayCount(lake) == 3)
    assert(TxLake.checkpoint(lake) == 3L)
    assert(TxLake.replayCount(lake) == 0,
      "a latest read must start at the checkpoint, replaying nothing")
    TxLake.commit(spark, lake, df(5))                 // v4
    TxLake.deleteWhere(spark, lake, col("id") === 1L) // v5
    assert(TxLake.replayCount(lake) == 2)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(2L, 3L, 4L, 5L))
    // pre-checkpoint time travel replays the full history unaffected
    assert(ids(TxLake.readSnapshot(spark, lake, 2L)) == Set(1L, 2L, 3L))
    assert(TxLake.replayCount(lake, 2L) == 2)
    assert(TxLake.latestVersion(lake) == 5L)
  }

  test("checkpoint preserves data-skipping stats") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2, 3), statsCol = "id")
    TxLake.commit(spark, lake, df(100, 200), statsCol = "id")
    val before = TxLake.prunedFiles(lake, 100L, 300L).toSet
    val all = TxLake.prunedFiles(lake, 0L, 300L).toSet
    assert(before.size < all.size, "the probe range must actually prune")
    TxLake.checkpoint(lake)
    assert(TxLake.prunedFiles(lake, 100L, 300L).toSet == before,
      "checkpointed stats must keep pruning exactly as the log did")
  }

  test("commitChecked: violations reject atomically, null checks count") {
    import spark.implicits._
    val lake = tmp()
    val good = Seq((1L, 5.0), (2L, 7.0)).toDF("k", "v")
    assert(TxLake.commitChecked(spark, lake, good,
      Seq("v_positive" -> (col("v") > 0))) == 1L)
    // a violating batch — including a NULL check result — must be
    // rejected with nothing reserved or written
    val bad = Seq((3L, -1.0), (4L, Double.NaN)).toDF("k", "v")
      .withColumn("v", when(col("k") === 4L, lit(null).cast("double"))
        .otherwise(col("v")))
    val e = intercept[IllegalArgumentException] {
      TxLake.commitChecked(spark, lake, bad, Seq("v_positive" -> (col("v") > 0)))
    }
    assert(e.getMessage.contains("v_positive=2"),
      "both the negative and the null row must count as violations")
    assert(TxLake.latestVersion(lake) == 1L,
      "a rejected commit must leave no version (not even a pending one)")
    assert(ids(TxLake.readSnapshot(spark, lake).select(col("k").as("id"))) ==
      Set(1L, 2L))
  }

  test("mergeByKeyNewest: only newer rows win; re-delivery is idempotent") {
    import spark.implicits._
    val lake = tmp()
    TxLake.commit(spark, lake,
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "ver", "v"))
    // stale update for k=1, fresh for k=2, brand-new k=3
    val u = Seq((1L, 5L, "stale"), (2L, 25L, "fresh"), (3L, 1L, "new"))
      .toDF("k", "ver", "v")
    def state() = TxLake.readSnapshot(spark, lake)
      .select(col("k"), col("ver"), col("v"))
      .as[(Long, Long, String)].collect().toSet
    TxLake.mergeByKeyNewest(spark, lake, u, "k", Seq("ver"))
    val want = Set((1L, 10L, "a"), (2L, 25L, "fresh"), (3L, 1L, "new"))
    assert(state() == want, "stale rows must lose, fresh win, new insert")
    TxLake.mergeByKeyNewest(spark, lake, u, "k", Seq("ver"))
    assert(state() == want, "re-delivering the same batch must be a no-op")
  }

  test("mergeByKeyNewest: null keys always insert and never collapse") {
    import spark.implicits._
    val lake = tmp()
    // one null-key row rides in the same table as keyed rows
    TxLake.commit(spark, lake,
      Seq((Option(1L), 10L, "a"), (Option.empty[Long], 0L, "anon1"))
        .toDF("k", "ver", "v"))
    // two null-key inserts in ONE batch must both land (not be rejected
    // as duplicates), and the table's existing null-key row must survive
    // the rewrite of its file
    val u = Seq((Option(1L), 20L, "fresh"), (Option.empty[Long], 0L, "anon2"),
      (Option.empty[Long], 0L, "anon3")).toDF("k", "ver", "v")
    TxLake.mergeByKeyNewest(spark, lake, u, "k", Seq("ver"))
    val vs = TxLake.readSnapshot(spark, lake)
      .select(col("v")).as[String].collect().toSet
    assert(vs == Set("fresh", "anon1", "anon2", "anon3"),
      s"got $vs — keyed row updated, every null-key row present")
  }

  test("multi-column stats prune conjunctively; checkpoint and branch keep them") {
    import spark.implicits._
    val lake = tmp()
    // 2x2 grid of files over (a, b) ranges: a conjunctive predicate on
    // both columns must keep exactly ONE of the four
    for { ai <- 0 to 1; bi <- 0 to 1 }
      TxLake.commit(spark, lake,
        Seq((ai * 100L + 1L, bi * 100L + 1L)).toDF("a", "b").coalesce(1),
        statsCols = Seq("a", "b"))
    def kept(p: String) = TxLake.readPrunedBy(spark, p,
      Seq(("a", 0L, 50L), ("b", 0L, 50L))).inputFiles.length
    assert(TxLake.prunedFilesBy(lake, "a", 0L, 50L).size == 2,
      "one column alone only halves the grid")
    assert(kept(lake) == 1, "both columns together isolate one file")
    // a summarizing checkpoint must carry the NAMED stats forward
    TxLake.checkpoint(lake)
    assert(TxLake.replayCount(lake) == 0)
    assert(kept(lake) == 1, "post-checkpoint reads prune from the checkpoint")
    // and so must a branch base entry
    val bp = TxLake.branch(lake, "mstats")
    assert(kept(bp) == 1)
  }

  test("optimizeZorder turns an unskippable layout into a skippable one") {
    import spark.implicits._
    val lake = tmp()
    // hash-scattered commits: every file spans the whole (a, b) space, so
    // log stats can prove nothing and every file must be kept
    val rows = (0L until 256L).map(i => (i % 16, i / 16))
    (0 to 3).foreach(m => TxLake.commit(spark, lake,
      rows.filter(r => (r._1 * 16 + r._2) % 4 == m).toDF("a", "b").coalesce(1),
      statsCols = Seq("a", "b")))
    val v1 = TxLake.latestVersion(lake)
    def kept() = TxLake.readPrunedBy(spark, lake,
      Seq(("a", 0L, 3L), ("b", 0L, 3L))).inputFiles.length
    assert(kept() == 4, "scattered: stats can exclude nothing")
    TxLake.optimizeZorder(spark, lake, Seq("a", "b"), bits = 4, targetFiles = 8)
    assert(kept() < 4,
      "z-clustered files cover tight (a, b) rectangles: most must skip")
    // the corner query still sees exactly its 16 rows, and time travel to
    // the pre-optimize layout still replays the scattered files
    assert(TxLake.readPrunedBy(spark, lake, Seq(("a", 0L, 3L), ("b", 0L, 3L)))
      .filter(col("a") <= 3 && col("b") <= 3).count() == 16)
    assert(TxLake.readSnapshot(spark, lake, v1).count() == 256)
  }

  test("branch inherits the parent's data-skipping stats") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2, 3), statsCol = "id")
    TxLake.commit(spark, lake, df(100, 200), statsCol = "id")
    val parentPruned = TxLake.prunedFiles(lake, 100L, 300L).toSet
    assert(parentPruned.size < TxLake.prunedFiles(lake, 0L, 300L).size)
    val bp = TxLake.branch(lake, "stats")
    assert(TxLake.prunedFiles(bp, 100L, 300L).toSet == parentPruned,
      "the branch base entry must carry the per-file min/max forward")
  }

  test("schema evolution: add + rename are metadata-only and survive checkpoint") {
    import spark.implicits._
    val lake = tmp()
    TxLake.commit(spark, lake, Seq((1L, 10L), (2L, 20L)).toDF("id", "value"))
    val vOld = TxLake.latestVersion(lake)
    TxLake.addColumn(lake, "src", "string")
    TxLake.commit(spark, lake,
      Seq((3L, 30L, "b2")).toDF("id", "value", "src"))
    TxLake.renameColumn(lake, "value", "amount")
    TxLake.commit(spark, lake,
      Seq((4L, 40L, "b3")).toDF("id", "amount", "src"))
    def state(p: String) = TxLake.readSnapshot(spark, p)
      .select(col("id"), col("amount"), col("src"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    val want = Set((1L, 10L, None), (2L, 20L, None),
      (3L, 30L, Some("b2")), (4L, 40L, Some("b3")))
    assert(state(lake) == want,
      "old files read NULL for added columns and map value->amount — no rewrite")
    // time travel to the pre-evolution version sees the ORIGINAL schema
    val old = TxLake.readSnapshot(spark, lake, vOld)
    assert(old.columns.toSet == Set("id", "value"))
    // a summarizing checkpoint and a branch base must carry the mapping
    TxLake.checkpoint(lake)
    assert(TxLake.replayCount(lake) == 0)
    assert(state(lake) == want, "post-checkpoint reads keep the evolved schema")
    assert(state(TxLake.branch(lake, "evo")) == want)
  }

  test("changeFeed reports net per-commit row changes, survivors cancel") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2, 3)) // v1
    TxLake.commit(spark, lake, df(4, 5))    // v2 append
    TxLake.deleteWhere(spark, lake, col("id") === 2L) // v3 rewrite
    def feed(from: Long, to: Long = Long.MaxValue) =
      TxLake.changeFeed(spark, lake, from, to)
        .select(col("_commit_version"), col("_change_type"), col("id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(feed(1L) == Set((2L, "insert", 4L), (2L, "insert", 5L),
      (3L, "delete", 2L)),
      "survivors 1 and 3 were rewritten with 2's file and must cancel")
    // range selection: only v2's changes
    assert(feed(1L, 2L) == Set((2L, "insert", 4L), (2L, "insert", 5L)))
    // from the beginning, the initial load is an insert commit too
    assert(feed(0L, 1L) == Set((1L, "insert", 1L), (1L, "insert", 2L),
      (1L, "insert", 3L)))
    // an overwrite nets out as delete-everything + insert-replacement
    TxLake.commit(spark, lake, df(7), overwrite = true) // v4
    assert(feed(3L) == Set((4L, "insert", 7L), (4L, "delete", 1L),
      (4L, "delete", 3L), (4L, "delete", 4L), (4L, "delete", 5L)))
  }

  test("deleteWhereDv: merge-on-read delete without touching a data file") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2, 3))
    TxLake.commit(spark, lake, df(4, 5))
    val dataFiles = {
      val d = java.nio.file.Paths.get(lake, "data")
      val s = Files.walk(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
      } finally s.close()
    }
    val v = TxLake.deleteWhereDv(spark, lake, col("id") === 2L || col("id") === 5L)
    assert(v == 3L)
    // data files: same set, same mtimes — nothing was rewritten
    val after = {
      val d = java.nio.file.Paths.get(lake, "data")
      val s = Files.walk(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
      } finally s.close()
    }
    assert(after == dataFiles, "a DV delete must not touch data files")
    assert(TxLake.dvFiles(lake).nonEmpty, "the vector sidecar must be logged")
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 3L, 4L))
    // time travel below the DV commit still sees the rows
    assert(ids(TxLake.readSnapshot(spark, lake, 2L)) == Set(1L, 2L, 3L, 4L, 5L))
    // vectors accumulate
    TxLake.deleteWhereDv(spark, lake, col("id") === 4L)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 3L))
  }

  test("deleteWhereDv keeps null-predicate rows; optimize materializes vectors") {
    import spark.implicits._
    val lake = tmp()
    val rows = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("id", "v")
    TxLake.commit(spark, lake, rows)
    TxLake.deleteWhereDv(spark, lake, col("v") === 10L)
    // row 2's predicate is NULL — it must survive (three-valued logic)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(2L, 3L))
    // copy-on-write ops on a DV-bearing table must NOT resurrect masked
    // rows when they rewrite an affected file
    TxLake.updateWhere(spark, lake, col("id") === 3L, Map("v" -> lit(31L)))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(2L, 3L))
    assert(TxLake.readSnapshot(spark, lake).filter(col("id") === 3L)
      .head().getLong(1) == 31L)
    // optimize rewrites the DV-applied snapshot; vectors become no-ops
    TxLake.optimize(spark, lake)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(2L, 3L))
    // checkpoint carries the dv references (they're inert here, but a
    // dvs-blind checkpoint on a non-optimized table would resurrect rows)
    TxLake.checkpoint(lake)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(2L, 3L))
  }

  test("key index: lookups open only containing files, stale index rejected, DVs applied") {
    import spark.implicits._
    val lake = tmp()
    // three single-file commits with disjoint known keys
    TxLake.commit(spark, lake, df(1, 2).coalesce(1))
    TxLake.commit(spark, lake, df(10, 11).coalesce(1))
    TxLake.commit(spark, lake, df(20, 21).coalesce(1))
    val idx = lake + "_idx"
    TxLake.buildKeyIndex(spark, lake, "id", idx)
    val probe = Seq(10L, 999L).toDF("key")
    val opened = TxLake.filesForKeys(spark, lake, idx, probe)
    assert(opened.size == 1 && opened.head.contains("/data/v2/"),
      s"only v2's file holds key 10; got $opened")
    assert(ids(TxLake.readByKeys(spark, lake, idx, probe)
      .filter(col("id").isin(10L, 999L))) == Set(10L))
    // a commit after the build makes the index stale — hard error
    TxLake.commit(spark, lake, df(30).coalesce(1))
    intercept[IllegalArgumentException] {
      TxLake.filesForKeys(spark, lake, idx, probe)
    }
    // rebuilt index sees the new file; a DV-deleted row stops surfacing
    TxLake.deleteWhereDv(spark, lake, col("id") === 10L)
    TxLake.buildKeyIndex(spark, lake, "id", idx)
    assert(ids(TxLake.readByKeys(spark, lake, idx, probe)
      .filter(col("id").isin(10L, 999L))).isEmpty,
      "the DV mask must apply to index-routed reads")
  }

  test("deleteWhereDv masking survives a checkpoint on a non-optimized table") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2, 3))
    TxLake.deleteWhereDv(spark, lake, col("id") === 2L)
    TxLake.checkpoint(lake)
    assert(TxLake.replayCount(lake) == 0)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 3L),
      "the checkpoint summary must carry the deletion vectors")
    // and a branch forked after the DV inherits the masking
    val bp = TxLake.branch(lake, "dv")
    assert(ids(TxLake.readSnapshot(spark, bp)) == Set(1L, 3L))
  }

  test("bloom index: lookups open only candidate files; stale index rejected") {
    val lake = tmp()
    val idx = tmp() + "_bidx"
    TxLake.commit(spark, lake, df(1L to 100L: _*))
    TxLake.commit(spark, lake, df(101L to 200L: _*))
    TxLake.commit(spark, lake, df(201L to 300L: _*))
    TxLake.buildBloomIndex(spark, lake, "id", idx)
    import spark.implicits._
    val probe = Seq(150L).toDF("id")
    val cand = TxLake.filesForKeysBloom(spark, lake, idx, probe)
    // auto-sizing floors at 4096 bits for these 100-key files: FP odds
    // for the other two files are ~1e-5 — candidate = the containing file
    assert(cand.size == 1 && cand.head.contains("/data/v2/"),
      s"only v2's file holds key 150; got $cand")
    assert(ids(TxLake.readByKeysBloom(spark, lake, idx, probe)
      .filter(col("id") === 150L)) == Set(150L))
    // absent key: no file qualifies
    assert(TxLake.filesForKeysBloom(spark, lake, idx, Seq(999L).toDF("id")).isEmpty)
    // the index pins the build version: any commit staleness rejects
    TxLake.commit(spark, lake, df(301L))
    intercept[IllegalArgumentException](
      TxLake.filesForKeysBloom(spark, lake, idx, probe))
  }

  test("restore rolls back zero-copy; history, guards and accounting intact") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2))                     // v1
    TxLake.commit(spark, lake, df(3))                        // v2
    TxLake.deleteWhere(spark, lake, col("id") === 2L)        // v3 rewrite
    TxLake.commit(spark, lake, df(9))                        // v4
    def mtimes() = {
      val s = Files.walk(java.nio.file.Paths.get(lake, "data"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
      } finally s.close()
    }
    val before = mtimes()
    assert(TxLake.restore(lake, 2L) == 5L)
    assert(mtimes() == before, "restore must not move a byte of data")
    assert(!Files.exists(java.nio.file.Paths.get(lake, "data", "v5")),
      "restore writes no data directory")
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 3L))
    // the rolled-back span is still time-travelable
    assert(ids(TxLake.readSnapshot(spark, lake, 4L)) == Set(1L, 3L, 9L))
    assert(TxLake.countRows(spark, lake) == Some(3L),
      "re-added files must carry their row counts forward")
    // restoring to the current state is a no-op
    assert(TxLake.restore(lake, 5L) == 5L)
    // a restore ACROSS a deletion-vector commit is rejected, not wrong
    TxLake.deleteWhereDv(spark, lake, col("id") === 1L)      // v6
    intercept[IllegalArgumentException](TxLake.restore(lake, 2L))
    // the table stays fully operable after a restore
    TxLake.commit(spark, lake, df(7))                        // v7
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(2L, 3L, 7L))
  }

  test("upsertKeysDv: delta adds + DV masks in ONE atomic entry, no rewrite") {
    import spark.implicits._
    val lake = tmp()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(TxLake.commit(spark, lake, base) == 1L)
    val up = Seq((2L, "B"), (4L, "d")).toDF("id", "v")
    assert(TxLake.upsertKeysDv(spark, lake, up, "id", tag = "b1") == 2L)
    val got = TxLake.readSnapshot(spark, lake)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
    // merge-on-read: the upsert commit ADDED exactly the 2 delta rows
    // (never the affected file's survivors — that's mergeByKey's
    // copy-on-write shape) and masked the superseded row via a sidecar
    assert(TxLake.commitAddCounts(lake) ==
      Seq((1L, "", 3L), (2L, "b1", 2L)))
    assert(TxLake.dvFiles(lake).nonEmpty)
    // time travel below the upsert still reads the pre-image
    assert(TxLake.readSnapshot(spark, lake, 1L)
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // exactly-once: a re-delivered tag is a no-op returning its version
    assert(TxLake.upsertKeysDv(spark, lake, up, "id", tag = "b1") == 2L)
    assert(TxLake.latestVersion(lake) == 2L)
    // a checkpoint carries the sidecars (a dvs-blind summary would
    // resurrect the superseded row)
    TxLake.checkpoint(lake)
    assert(TxLake.readSnapshot(spark, lake)
      .as[(Long, String)].collect().toMap == got)
    // insert-only upsert against an empty table degrades to plain commit
    val lake2 = tmp()
    assert(TxLake.upsertKeysDv(spark, lake2, base, "id", tag = "b0") == 1L)
    assert(TxLake.readSnapshot(spark, lake2).count() == 3L)
    assert(TxLake.dvFiles(lake2).isEmpty)
  }

  test("countRows is metadata-only and DV/rewrite/checkpoint-exact") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1L to 10L: _*), tag = "b1")
    TxLake.commit(spark, lake, df(11L to 15L: _*), tag = "b2")
    assert(TxLake.countRows(spark, lake) == Some(15L))
    assert(TxLake.countRows(spark, lake, 1L) == Some(10L))
    assert(TxLake.commitAddCounts(lake).map(t => (t._1, t._2, t._3)) ==
      Seq((1L, "b1", 10L), (2L, "b2", 5L)))
    // DV masks subtract without opening data files
    TxLake.deleteWhereDv(spark, lake, col("id") % 2L === 0L)
    assert(TxLake.countRows(spark, lake) == Some(8L))
    // copy-on-write rewrite re-counts its replacement files
    TxLake.deleteWhere(spark, lake, col("id") === 1L)
    assert(TxLake.countRows(spark, lake) == Some(7L))
    // checkpoint + branch carry the per-file counts
    TxLake.checkpoint(lake)
    assert(TxLake.replayCount(lake) == 0)
    assert(TxLake.countRows(spark, lake) == Some(7L))
    val bp = TxLake.branch(lake, "cnt")
    assert(TxLake.countRows(spark, bp) == Some(7L))
    // the decisive metadata-only proof: move every data file away — the
    // count still answers (DV sidecars stay: they are the one set of
    // bytes the contract does read)
    val hidden = java.nio.file.Paths.get(lake, "data_hidden")
    Files.move(java.nio.file.Paths.get(lake, "data"), hidden)
    try assert(TxLake.countRows(spark, lake) == Some(7L),
      "countRows must not open data files")
    finally Files.move(hidden, java.nio.file.Paths.get(lake, "data"))
  }

  test("OCC: stale rewrites conflict, disjoint writers land, burned slots are no-ops") {
    import spark.implicits._
    val lake = tmp()
    // two physical files: ids 1-4 split by parity
    TxLake.commit(spark, lake,
      (1L to 4L).toDF("id").repartition(2, pmod(col("id"), lit(2))))
    val v1 = TxLake.latestVersion(lake)
    // writer A deletes id=2 (rewrites the even file) — lands
    val v2 = TxLake.deleteWhereTx(spark, lake, col("id") === 2L, v1)
    assert(v2 == 2L && ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 3L, 4L))
    // writer B, ALSO prepared at v1, rewrites the same even file → conflict;
    // the burned reservation must advance the log as a harmless no-op
    intercept[TxLake.CommitConflictException] {
      TxLake.deleteWhereTx(spark, lake, col("id") === 4L, v1)
    }
    assert(TxLake.latestVersion(lake) == 3L, "conflicted slot burns as a no-op")
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 3L, 4L))
    // B rebases against the new latest and now succeeds
    TxLake.deleteWhereTx(spark, lake, col("id") === 4L, TxLake.latestVersion(lake))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 3L))
    // an append prepared at the ORIGINAL version still lands: no removes,
    // no conflict surface
    TxLake.commitTransaction(spark, lake, df(9), Seq.empty, v1)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 3L, 9L))
    // a deletion vector attached after the read conflicts a file rewrite
    val vNow = TxLake.latestVersion(lake)
    TxLake.deleteWhereDv(spark, lake, col("id") === 3L)
    intercept[TxLake.CommitConflictException] {
      TxLake.compactTx(spark, lake, vNow)
    }
    // rebased compaction applies the DV mask and converges to one file
    TxLake.compactTx(spark, lake, TxLake.latestVersion(lake))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 9L))
  }

  test("mergeByKeyEvolve adds unseen source columns; old rows read NULL, old versions keep the old shape") {
    import spark.implicits._
    val lake = tmp()
    val v1 = TxLake.commit(spark, lake,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "bal"))
    TxLake.mergeByKeyEvolve(spark, lake,
      Seq((2L, 25.0, "gold"), (4L, 40.0, "new")).toDF("id", "bal", "tier"), "id")
    val now = TxLake.readSnapshot(spark, lake)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), Option(r.get(2)).map(_.toString)))).toMap
    assert(now == Map(
      1L -> ((10.0, None)),          // untouched row: NULL in the new column
      2L -> ((25.0, Some("gold"))),  // updated in place with the new column
      3L -> ((30.0, None)),
      4L -> ((40.0, Some("new"))))) // inserted
    // time travel to before the evolution sees the ORIGINAL two-column shape
    val old = TxLake.readSnapshot(spark, lake, v1)
    assert(old.columns.toSeq == Seq("id", "bal"))
    assert(ids(old.select(col("id"))) == Set(1L, 2L, 3L))
  }

  test("mergeCdc: one batch deletes, updates and inserts; absent-key delete no-ops") {
    import spark.implicits._
    val lake = tmp()
    def kv(rows: (Long, Double)*) = rows.toDF("id", "v")
    def state() = TxLake.readSnapshot(spark, lake)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    TxLake.commit(spark, lake, kv(1L -> 1.0, 2L -> 2.0, 3L -> 3.0).coalesce(1)) // v1
    TxLake.commit(spark, lake, kv(5L -> 5.0, 6L -> 6.0).coalesce(1))            // v2
    TxLake.commit(spark, lake, kv(7L -> 7.0).coalesce(1))                       // v3: untouched
    val before = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    val cdc = Seq(
      (2L, 2.0, true),    // matched delete
      (5L, 50.0, false),  // matched update
      (9L, 9.0, false),   // unmatched insert
      (99L, 0.0, true))   // unmatched delete: must no-op
      .toDF("id", "v", "del")
    TxLake.mergeCdc(spark, lake, cdc, "id", "del")
    assert(state() == Map(1L -> 1.0, 3L -> 3.0, 5L -> 50.0, 6L -> 6.0,
      7L -> 7.0, 9L -> 9.0))
    // v3 held no key from the batch: its file must still be the original
    val after = TxLake.readSnapshot(spark, lake)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(before.filter(_.contains("/data/v3/")).subsetOf(after))
    assert(before.filter(_.contains("/data/v1/")).forall(!after.contains(_)))
    // delete-then-reinsert across two CDC batches round-trips
    TxLake.mergeCdc(spark, lake, Seq((9L, 9.0, true)).toDF("id", "v", "del"),
      "id", "del")
    assert(!state().contains(9L))
    TxLake.mergeCdc(spark, lake, Seq((9L, 90.0, false)).toDF("id", "v", "del"),
      "id", "del")
    assert(state()(9L) == 90.0)
    // a NULL delete flag upserts (three-valued logic: only TRUE deletes)
    TxLake.mergeCdc(spark, lake,
      Seq((6L, 60.0)).toDF("id", "v")
        .withColumn("del", lit(null).cast("boolean")), "id", "del")
    assert(state()(6L) == 60.0)
  }

  test("dropWhereExpired: metadata-only TTL cut; straddling or stats-less files reject") {
    import spark.implicits._
    val lake = tmp()
    // coalesce(1): each batch is ONE file spanning its day range, so the
    // straddle check below has a genuinely multi-day file to reject
    def days(ds: (Long, Long)*) = ds.toDF("id", "day").coalesce(1)
    TxLake.commit(spark, lake, days(1L -> 10L, 2L -> 11L), statsCols = Seq("day"))
    TxLake.commit(spark, lake, days(3L -> 20L, 4L -> 21L), statsCols = Seq("day"))
    TxLake.commit(spark, lake, days(5L -> 30L), statsCols = Seq("day"))
    def mtimes() = {
      val s = Files.walk(java.nio.file.Paths.get(lake, "data"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
      } finally s.close()
    }
    val before = mtimes()
    // a cutoff inside a file's [min, max] must reject, not half-delete
    intercept[IllegalArgumentException](
      TxLake.dropWhereExpired(lake, "day", cutoff = 21L))
    val v = TxLake.dropWhereExpired(lake, "day", cutoff = 20L)
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(3L, 4L, 5L))
    assert(mtimes() == before, "expiry must not touch a data byte")
    // time travel below the drop still sees the expired rows
    assert(ids(TxLake.readSnapshot(spark, lake, v - 1)) ==
      Set(1L, 2L, 3L, 4L, 5L))
    // nothing expired → no new version
    assert(TxLake.dropWhereExpired(lake, "day", cutoff = 20L) == v)
    // row accounting survives the metadata-only delete
    assert(TxLake.countRows(spark, lake) == Some(3L))
    // a file without day stats can't prove expiry → reject
    TxLake.commit(spark, lake, days(6L -> 40L))
    intercept[IllegalArgumentException](
      TxLake.dropWhereExpired(lake, "day", cutoff = 20L))
  }

  test("publishBranch: audited appends land atomically; unsafe branches are rejected") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2))
    // stage on a branch, parent stays unaware until publish
    val br = TxLake.branch(lake, "wap")
    TxLake.commit(spark, br, df(3, 4))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L))
    val v = TxLake.publishBranch(lake, "wap", tag = "audited")
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 3L, 4L))
    // zero-copy: the published entry references the branch's data files
    assert(TxLake.countRows(spark, lake) == Some(4L),
      "staged per-file row accounting must ride into the parent entry")
    // time travel below the publish still sees the pre-publish table
    assert(ids(TxLake.readSnapshot(spark, lake, v - 1)) == Set(1L, 2L))
    // a branch that rewrote inherited files must not publish
    val br2 = TxLake.branch(lake, "rewrites")
    TxLake.deleteWhere(spark, br2, col("id") === 1L)
    intercept[IllegalArgumentException](TxLake.publishBranch(lake, "rewrites"))
    // a branch forked before the parent advanced must not publish
    val br3 = TxLake.branch(lake, "stale")
    TxLake.commit(spark, br3, df(9))
    TxLake.commit(spark, lake, df(5)) // parent moves on
    intercept[IllegalArgumentException](TxLake.publishBranch(lake, "stale"))
    // a branch that staged deletion vectors must not publish
    val br4 = TxLake.branch(lake, "dv")
    TxLake.deleteWhereDv(spark, br4, col("id") === 2L)
    intercept[IllegalArgumentException](TxLake.publishBranch(lake, "dv"))
  }

  test("mergeCdc never resurrects rows a deletion vector already masked") {
    import spark.implicits._
    val lake = tmp()
    def kv(rows: (Long, Double)*) = rows.toDF("id", "v")
    TxLake.commit(spark, lake, kv(1L -> 1.0, 2L -> 2.0, 3L -> 3.0).coalesce(1))
    // DV-mask row 3 (no rewrite), then CDC-touch the SAME file via key 1:
    // the affected-file rewrite must come from the DV-applied view
    TxLake.deleteWhereDv(spark, lake, col("id") === 3L)
    TxLake.mergeCdc(spark, lake, Seq((1L, 10.0, false)).toDF("id", "v", "del"),
      "id", "del")
    val got = TxLake.readSnapshot(spark, lake)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 2.0), "the masked row must stay deleted")
  }

  test("cloneTable: zero-copy, then fully independent evolution both ways") {
    import spark.implicits._
    val src = tmp(); val cl = src + "-clone"
    def kv(rows: (Long, Double)*) = rows.toDF("id", "v")
    TxLake.commit(spark, src, kv(1L -> 1.0, 2L -> 2.0).coalesce(1))
    TxLake.cloneTable(src, cl)
    // clone-side mutations: append + delete
    TxLake.commit(spark, cl, kv(3L -> 3.0).coalesce(1))
    TxLake.deleteWhere(spark, cl, col("id") === 1L)
    // source-side append after the clone point
    TxLake.commit(spark, src, kv(4L -> 4.0).coalesce(1))
    def ids(p: String) = TxLake.readSnapshot(spark, p)
      .select("id").as[Long].collect().toSet
    assert(ids(src) == Set(1L, 2L, 4L), "clone mutations invisible to source")
    assert(ids(cl) == Set(2L, 3L), "source append invisible to clone")
  }

  test("cloneTable refuses to overwrite an existing table") {
    import spark.implicits._
    val src = tmp(); val cl = src + "-clone"
    TxLake.commit(spark, src, Seq(1L -> 1.0).toDF("id", "v"))
    TxLake.cloneTable(src, cl)
    assertThrows[IllegalArgumentException](TxLake.cloneTable(src, cl))
  }

  test("replaceWhere: atomic day swap, straddler survivors kept, guard enforced") {
    import spark.implicits._
    val lake = tmp()
    def rows(rs: (Long, Long, Double)*) = rs.toDF("id", "day", "v")
    // one file holds BOTH day 1 and day 2 — the straddler case
    TxLake.commit(spark, lake,
      rows((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 2L, 3.0)).coalesce(1))
    val v = TxLake.replaceWhere(spark, lake, col("day") === 1L,
      rows((10L, 1L, 10.0)))
    val got = TxLake.readSnapshot(spark, lake)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(10L -> ((1L, 10.0)), 3L -> ((2L, 3.0))),
      "day-1 rows replaced, day-2 straddler survives the rewrite")
    assert(TxLake.latestVersion(lake) == v, "one atomic commit")
    // out-of-scope batch row must be rejected before anything lands
    assertThrows[IllegalArgumentException](
      TxLake.replaceWhere(spark, lake, col("day") === 1L,
        rows((11L, 1L, 11.0), (12L, 2L, 12.0))))
    assert(TxLake.latestVersion(lake) == v, "rejected replace commits nothing")
  }

  test("refreshBloomIndex: delta-only rebuild, stale files dropped, lookups exact") {
    import spark.implicits._
    val root = tmp(); val lake = s"$root/lake"; val idx = s"$root/idx"
    def kv(rows: (Long, Double)*) = rows.toDF("id", "v")
    TxLake.commit(spark, lake, kv(1L -> 1.0, 2L -> 2.0).coalesce(1))
    TxLake.commit(spark, lake, kv(3L -> 3.0, 4L -> 4.0).coalesce(1))
    TxLake.buildBloomIndex(spark, lake, "id", idx)
    // merge touches only the file holding key 1; adds key 9
    TxLake.mergeByKey(spark, lake, kv(1L -> 10.0, 9L -> 9.0).coalesce(1), "id")
    val (nNew, nDropped, nKept) = TxLake.refreshBloomIndex(spark, lake, "id", idx)
    assert(nNew >= 1, "rewritten + inserted rows live in unindexed files")
    assert(nDropped >= 1, "the pre-merge file holding key 1 must drop")
    assert(nKept >= 1, "the untouched commit-2 file must carry over")
    val got = TxLake.readByKeysBloom(spark, lake, idx,
        Seq(1L, 3L, 9L).toDF("k"))
      .filter(col("id").isin(1L, 3L, 9L))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 3L -> 3.0, 9L -> 9.0),
      "post-refresh lookups see merged truth, never the rewritten file")
  }

  test("replaceWhere with no matching rows is a pure scoped insert") {
    import spark.implicits._
    val lake = tmp()
    def rows(rs: (Long, Long, Double)*) = rs.toDF("id", "day", "v")
    TxLake.commit(spark, lake, rows((1L, 1L, 1.0)).coalesce(1))
    TxLake.replaceWhere(spark, lake, col("day") === 9L, rows((9L, 9L, 9.0)))
    val got = TxLake.readSnapshot(spark, lake)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 9L))
  }

  test("sketch store: log-only percentiles, data dir deleted, checkpoint/branch carry") {
    import spark.implicits._
    val lake = tmp()
    val rows = (1L to 3000L).map(i => (i, (i * 37 % 1000).toDouble))
    val d = rows.toDF("id", "v")
    val spec = TxLake.SketchSpec("id", "v", 64)
    TxLake.commit(spark, lake, d.filter(col("id") % 2 === 0).repartition(3),
      sketch = Some(spec))
    TxLake.commit(spark, lake, d.filter(col("id") % 2 === 1).repartition(2),
      sketch = Some(spec))
    val qs = Seq(0.5, 0.9, 0.99)
    // the metadata answer equals the direct corpus sketch at the same k
    val direct = graft.operators.Sketches.quantileSketch(
      d, (col("id") % 5).cast("string"), "id", "v", 64, qs)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    def metaAnswer() = TxLake.sketchQuantiles(spark, lake, "v", qs)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(metaAnswer() == direct, "log sketch must equal the corpus sketch")
    // survives a checkpoint (replay starts from the summarizing entry)
    TxLake.checkpoint(lake)
    assert(TxLake.replayCount(lake) == 0)
    assert(metaAnswer() == direct, "checkpoint must carry the sketches")
    // a branch base carries them too
    val bp = TxLake.branch(lake, "stats-br")
    assert(TxLake.sketchQuantiles(spark, bp, "v", qs)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq == direct)
    // THE proof: physically delete every data file — the percentile
    // read never notices, because it opens none
    graft.sources.LocalFs.deleteRecursively(s"$lake/data")
    assert(metaAnswer() == direct, "answer must survive data deletion")
    // partial coverage fails loudly instead of under-reporting
    val lake2 = tmp()
    TxLake.commit(spark, lake2, d.limit(10), sketch = Some(spec))
    TxLake.commit(spark, lake2, d.limit(5)) // no sketch
    val e = intercept[IllegalArgumentException](
      TxLake.sketchQuantiles(spark, lake2, "v", qs))
    assert(e.getMessage.contains("without a 'v' sketch"))
    // DV-masked tables are refused (sketches describe file contents)
    val lake3 = tmp()
    TxLake.commit(spark, lake3, d.limit(100), sketch = Some(spec))
    TxLake.deleteWhereDv(spark, lake3, col("id") <= 3)
    val e2 = intercept[IllegalArgumentException](
      TxLake.sketchQuantiles(spark, lake3, "v", qs))
    assert(e2.getMessage.contains("deletion vectors"))
  }

  test("orphanFiles/gcOrphans: crashed-writer residue reclaimed, racer safe") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2))
    TxLake.commit(spark, lake, df(3))
    assert(TxLake.orphanFiles(lake).isEmpty, "a clean lake has no orphans")
    // crashed writer: data landed under v3, reservation never filled
    df(90, 91).coalesce(1).write.mode("overwrite").parquet(s"$lake/data/v3")
    val orphans = TxLake.orphanFiles(lake)
    assert(orphans.size == 1 && orphans.head.contains("/data/v3/"))
    // racer-ahead safety: a FILLED later entry's files are reachable the
    // moment the pending reservation clears — they must never be flagged,
    // even while an empty reservation stalls the log below them
    val logDir = java.nio.file.Paths.get(s"$lake/_log")
    java.nio.file.Files.createFile(logDir.resolve("00000003.json"))
    df(77).coalesce(1).write.mode("overwrite").parquet(s"$lake/data/v4")
    val racerAdd = new java.io.File(s"$lake/data/v4").listFiles()
      .map(_.toString).filter(_.endsWith(".parquet")).sorted.head
    java.nio.file.Files.write(logDir.resolve("00000004.json"),
      s"""{"version":4,"tag":"","adds":["$racerAdd"],"removes":[]}"""
        .getBytes("UTF-8"))
    val flagged = TxLake.orphanFiles(lake)
    assert(flagged.size == 1 && flagged.head.contains("/data/v3/"),
      "the racer's landed file must not be treated as an orphan")
    val removed = TxLake.gcOrphans(lake)
    assert(removed == flagged && TxLake.orphanFiles(lake).isEmpty)
    // the stalled log is untouched: snapshot still reads v2's rows
    java.nio.file.Files.delete(logDir.resolve("00000003.json"))
    java.nio.file.Files.delete(logDir.resolve("00000004.json"))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(1L, 2L, 3L))
  }

  test("expireSnapshots: surviving versions replay, history below is gone") {
    val lake = tmp()
    TxLake.commit(spark, lake, df(1, 2))                     // v1
    TxLake.commit(spark, lake, df(10), overwrite = true)     // v2: v1 removed
    TxLake.commit(spark, lake, df(11))                       // v3
    TxLake.commit(spark, lake, df(12))                       // v4
    TxLake.commit(spark, lake, df(13))                       // v5
    val v3Before = ids(TxLake.readSnapshot(spark, lake, 3L))
    val (cutoff, dropped, reclaimed) = TxLake.expireSnapshots(lake, keepLast = 3)
    assert(cutoff == 3L)
    assert(dropped == 2L, "entries v1 and v2 must drop")
    assert(reclaimed >= 1L, "v1's overwritten files reclaim")
    // every surviving version replays bit-identically
    assert(ids(TxLake.readSnapshot(spark, lake, 3L)) == v3Before)
    assert(ids(TxLake.readSnapshot(spark, lake, 4L)) == Set(10L, 11L, 12L))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(10L, 11L, 12L, 13L))
    // appends after expiry keep working on the checkpointed log
    TxLake.commit(spark, lake, df(14))
    assert(ids(TxLake.readSnapshot(spark, lake)) == Set(10L, 11L, 12L, 13L, 14L))
    // time travel below the cutoff is gone BY DESIGN
    val below = scala.util.Try(
      TxLake.readSnapshot(spark, lake, 2L).count()).getOrElse(0L)
    assert(below == 0L)
  }
}
