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

  test("zipfFit recovers the closed-form OLS on a constructed spectrum") {
    // counts 8/4/2/1 at ranks 1..4
    val text = (Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++
      Seq.fill(2)("w3") ++ Seq("w4")).mkString(" ")
    val got = TextPipeline.zipfFit(Seq(text).toDF("text"), "text", 500)
      .select("n", "slope", "intercept").as[(Long, Double, Double)].head()
    val xs = (1 to 4).map(r => math.log(r.toDouble))
    val ys = Seq(8, 4, 2, 1).map(c => math.log(c.toDouble))
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(got._1 == 4L)
    assert(math.abs(got._2 - slope) < 1e-5)
    assert(math.abs(got._3 - (sy - slope * sx) / n) < 1e-5)
  }
}
