package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Medallion

class MedallionSpec extends SparkSuite {
  import spark.implicits._

  test("bucketize maps the reference temperature ladder") {
    val df = Seq(-5.0, 0.0, 5.0, 15.0, 25.0).toDF("t")
      .select(Medallion.bucketize(col("t"),
        Seq(0.0 -> "Freezing", 10.0 -> "Cold", 20.0 -> "Mild"), "Warm").as("c"))
    assert(df.as[String].collect().toSeq ==
      Seq("Freezing", "Cold", "Cold", "Mild", "Warm"))
  }

  test("parseJson flattens a typed field") {
    val df = Seq("""{"k": 87}""", """{"k": 3}""").toDF("props")
      .select(Medallion.parseJson(col("props"),
        StructType(Seq(StructField("k", IntegerType)))).getField("k").as("k"))
    assert(df.as[Int].collect().toSeq == Seq(87, 3))
  }

  test("enforceSchema casts to the declared types") {
    val df = Seq(("1", "2.5")).toDF("a", "b")
    val out = Medallion.enforceSchema(df,
      Seq("a" -> LongType, "b" -> DoubleType))
    assert(out.schema.map(_.dataType) == Seq(LongType, DoubleType))
    assert(out.head() == org.apache.spark.sql.Row(1L, 2.5))
  }

  test("unionBranches tags and unions") {
    val a = Seq(1).toDF("x")
    val b = Seq(2, 3).toDF("x")
    val out = Medallion.unionBranches(Seq(a -> "us", b -> "ca"), "branch")
    assert(out.count() == 3)
    assert(out.filter(col("branch") === "ca").count() == 2)
  }
}
