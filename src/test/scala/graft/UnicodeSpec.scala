package graft

import org.apache.spark.sql.functions._

import graft.plans.UnicodeExpressions.accentFold

class UnicodeSpec extends SparkSuite {
  import spark.implicits._

  test("accentFold strips decomposable accents, keeps ASCII untouched") {
    val df = Seq(
      ("café", "cafe"),
      ("ÁÉÍÓÚ áéíóú", "AEIOU aeiou"),
      ("öü Ñ ç è", "ou N c e"),
      ("plain ascii 123", "plain ascii 123"),
      ("", "")).toDF("in", "exp")
    val out = df.select(accentFold($"in").as("got"), $"exp")
      .as[(String, String)].collect()
    out.foreach { case (got, exp) => assert(got == exp) }
  }

  test("accentFold is idempotent and handles pre-decomposed (NFD) input") {
    // "é" as 'e' + COMBINING ACUTE (U+0301): the NFD spelling must fold
    // identically to the composed one
    val nfd = "éclair"
    val df = Seq((nfd, "éclair")).toDF("a", "b")
    val out = df.select(accentFold($"a"), accentFold($"b"),
        accentFold(accentFold($"b")))
      .as[(String, String, String)].head()
    assert(out._1 == "eclair" && out._2 == "eclair" && out._3 == "eclair")
  }

  test("accent_fold is registered as a SQL function via GraftExtensions") {
    val got = spark.sql("SELECT accent_fold('séñor') AS s").head().getString(0)
    assert(got == "senor")
  }
}
