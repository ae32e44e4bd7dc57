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
}
