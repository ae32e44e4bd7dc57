package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Reconcile

class ReconcileSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def frame(rows: (Long, String)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)

  test("identical tables reconcile to an empty diff") {
    val a = frame((1L, "x"), (2L, "y"), (3L, "z"))
    assert(Reconcile.diffKeys(a, frame((1L, "x"), (2L, "y"), (3L, "z")), "k",
      buckets = 4).isEmpty)
  }

  test("drifted keys are labelled by side and difference") {
    val a = frame((1L, "x"), (2L, "y"), (3L, "z"))
    val b = frame((1L, "x"), (2L, "CHANGED"), (9L, "new"))
    val out = Reconcile.diffKeys(a, b, "k", buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "differs", 3L -> "A_only", 9L -> "B_only"))
  }

  test("schema mismatch is rejected up front") {
    val a = frame((1L, "x"))
    val e = intercept[IllegalArgumentException] {
      Reconcile.diffKeys(a, a.withColumnRenamed("v", "w"), "k")
    }
    assert(e.getMessage.contains("schemas must align"))
  }
}
