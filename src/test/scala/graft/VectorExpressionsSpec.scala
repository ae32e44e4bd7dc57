package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.{GraftExtensions, VectorExpressions}
import graft.sources.Tables

class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("codegen vec_dot equals the HOF formulation bit-for-bit") {
    val emb = Tables.load(spark, sf, "embeddings").limit(100)
    val diff = emb.select(
      VectorFunctions.dot(col("embedding"), col("embedding")).as("fast"),
      VectorFunctions.dotHof(col("embedding"), col("embedding")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("vec_dot handles mixed float/double arrays") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("f", "d")
    val r = df.select(VectorExpressions.vecDot(col("f"), col("d"))).head().getDouble(0)
    assert(r == 11.0)
  }

  test("fused vec_cosine equals the unfused dot/norm formulation bit-for-bit") {
    val emb = Tables.load(spark, sf, "embeddings").limit(50)
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv")).limit(5)
    val diff = emb.crossJoin(q)
      .select(
        VectorFunctions.cosine(col("embedding"), col("qv")).as("fused"),
        (VectorFunctions.dot(col("embedding"), col("qv")) /
          (sqrt(VectorFunctions.dot(col("embedding"), col("embedding"))) *
            sqrt(VectorFunctions.dot(col("qv"), col("qv"))))).as("unfused"))
      .filter(col("fused") =!= col("unfused"))
    assert(diff.count() == 0)
  }

  test("codegen vec_l2sq equals the HOF formulation bit-for-bit") {
    val emb = Tables.load(spark, sf, "embeddings").limit(50)
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv")).limit(5)
    val hof = aggregate(
      zip_with(col("embedding"), col("qv"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb.crossJoin(q)
      .select(
        VectorFunctions.l2sq(col("embedding"), col("qv")).as("fast"),
        hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
    val zero = emb
      .select(VectorFunctions.l2sq(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") =!= lit(0.0))
    assert(zero.count() == 0)
  }

  test("vec_dot is available in SQL after registration") {
    VectorExpressions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("extensions class injects without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
