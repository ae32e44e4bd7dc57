package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{IcebergLite, TxLake}

class IcebergLiteSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_iceberg").toString

  test("export walks back bit-identical through the manifest chain") {
    val root = tmp()
    val lake = s"$root/lake"
    val a = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
    val b = (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v")
    TxLake.commit(spark, lake, a.repartition(3))
    TxLake.commit(spark, lake, b.repartition(2))
    val ice = s"$root/ice"
    val snap = IcebergLite.export(spark, lake, ice, filesPerManifest = 2)
    assert(snap == 2L)
    val back = IcebergLite.read(spark, ice)
      .as[(Long, String)].collect().toSet
    assert(back == (1L to 15L).map(i => (i, s"v$i")).toSet)
    // the published schema is applied, not footer-inferred
    assert(IcebergLite.read(spark, ice).schema.map(_.name) == Seq("id", "v"))
    // chain accounting: 5 data files -> 3 manifests of <= 2; rows total
    val (id, nManifests, nFiles, nRows) = IcebergLite.snapshotInfo(spark, ice)
    assert(id == 2L && nManifests == 3L && nFiles == 5L && nRows == 15L)
  }

  test("export refuses DV-masked tables instead of resurrecting rows") {
    val root = tmp()
    val lake = s"$root/lake"
    TxLake.commit(spark, lake, (1L to 10L).toDF("id"))
    TxLake.deleteWhereDv(spark, lake, col("id") > 8L)
    val e = intercept[IllegalArgumentException] {
      IcebergLite.export(spark, lake, s"$root/ice")
    }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("a re-export after a new commit advances the version hint") {
    val root = tmp()
    val lake = s"$root/lake"
    TxLake.commit(spark, lake, (1L to 5L).toDF("id"))
    val ice = s"$root/ice"
    assert(IcebergLite.export(spark, lake, ice) == 1L)
    assert(IcebergLite.read(spark, ice).count() == 5L)
    TxLake.commit(spark, lake, (6L to 9L).toDF("id"))
    assert(IcebergLite.export(spark, lake, ice) == 2L)
    // the reader follows the hint to the NEW snapshot
    assert(IcebergLite.read(spark, ice).count() == 9L)
    // TIME TRAVEL: the old chain stays readable by snapshot id, and a
    // never-exported id fails loudly
    assert(IcebergLite.readAt(spark, ice, 1L).count() == 5L)
    intercept[IllegalArgumentException] {
      IcebergLite.readAt(spark, ice, 7L)
    }
  }
}
