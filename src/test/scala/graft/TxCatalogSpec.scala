package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.TxCatalog

class TxCatalogSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_txcat").toString + "/cat"

  private def vals(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select(col("v")).collect().map(_.getLong(0)).toSet

  test("one transaction spans tables; versions are mutually consistent") {
    val root = tmp()
    TxCatalog.commit(spark, root, Seq(
      "facts" -> Seq(1L, 2L).toDF("v"), "rollup" -> Seq(3L).toDF("v")))
    TxCatalog.commit(spark, root, Seq(
      "facts" -> Seq(10L, 20L).toDF("v"), "rollup" -> Seq(30L).toDF("v")),
      overwrite = true)
    assert(vals(TxCatalog.readSnapshot(spark, root, "facts")) == Set(10L, 20L))
    assert(vals(TxCatalog.readSnapshot(spark, root, "rollup")) == Set(30L))
    // time travel is TRANSACTION-level: version 1 of both members together
    assert(vals(TxCatalog.readSnapshot(spark, root, "facts", 1L)) == Set(1L, 2L))
    assert(vals(TxCatalog.readSnapshot(spark, root, "rollup", 1L)) == Set(3L))
  }

  test("a crash between table writes leaves EVERY member unchanged") {
    val root = tmp()
    TxCatalog.commit(spark, root, Seq(
      "facts" -> Seq(1L).toDF("v"), "rollup" -> Seq(2L).toDF("v")))
    // simulate a writer that reserved v2 and landed ONE table's data
    // before dying: the pending (empty) entry must hide everything
    Files.createFile(java.nio.file.Paths.get(root, "_log", "00000002.json"))
    Seq(99L).toDF("v").write.parquet(s"$root/facts/data/v2")
    assert(vals(TxCatalog.readSnapshot(spark, root, "facts")) == Set(1L),
      "half-landed transaction data must be invisible")
    assert(vals(TxCatalog.readSnapshot(spark, root, "rollup")) == Set(2L))
    // and a new writer racing for the same version fails loudly
    intercept[TxCatalog.ConcurrentCommitException] {
      TxCatalog.commit(spark, root, Seq("facts" -> Seq(5L).toDF("v")))
    }
  }

  test("overwrite replaces only the tables the transaction writes") {
    val root = tmp()
    TxCatalog.commit(spark, root, Seq(
      "facts" -> Seq(1L).toDF("v"), "aside" -> Seq(7L).toDF("v")))
    TxCatalog.commit(spark, root, Seq("facts" -> Seq(2L).toDF("v")),
      overwrite = true)
    assert(vals(TxCatalog.readSnapshot(spark, root, "facts")) == Set(2L))
    assert(vals(TxCatalog.readSnapshot(spark, root, "aside")) == Set(7L),
      "a member the transaction does not write is untouched")
  }
}
