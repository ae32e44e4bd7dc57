package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profiling, TextPipeline}

class ProfilingSpec extends SparkSuite {
  import spark.implicits._

  test("jsonSchemaProfile classifies long/double/bool/null/string and counts coverage") {
    val df = Seq(
      """{"a": 1, "b": 1.5, "c": true, "d": null, "e": "x"}""",
      """{"a": -7, "b": 0.25, "c": false, "e": "1x"}""",
      """{"a": "txt"}""").toDF("j")
    val got = Profiling.jsonSchemaProfile(df, "j")
      .select("path", "vtype", "n").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", "long")) == 2L)
    assert(got(("a", "string")) == 1L) // mixed-type key: two rows reported
    assert(got(("b", "double")) == 2L)
    assert(got(("c", "bool")) == 2L)
    assert(got(("d", "null")) == 1L)   // explicit null, distinct from absent
    assert(got(("e", "string")) == 2L) // "1x" is not a number
    assert(!got.keySet.exists(_._1 == "f")) // absent keys report nothing
    val cov = Profiling.jsonSchemaProfile(df, "j")
      .filter(col("path") === "a" && col("vtype") === "long")
      .select("coverage").as[Double].head()
    assert(math.abs(cov - 2.0 / 3.0) < 1e-6)
  }

  test("lexicalDiversity: exact token/type/hapax counts") {
    val df = Seq((1L, "a b a  c"), (2L, "x x x")).toDF("id", "text")
    val got = TextPipeline.lexicalDiversity(df, "id", "text")
      .select("id", "n_tokens", "n_types", "n_hapax")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 3L, 2L))) // a×2, b, c → hapax {b, c}
    assert(got(2L) == ((2L, 3L, 1L, 0L)))
  }
}
