package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("word and char counters") {
    val df = Seq("Hello, world!  foo   bar").toDF("text")
    val r = df.select(
      TextFunctions.wordCount(col("text")).as("wc"),
      TextFunctions.alphaChars(col("text")).as("alpha"),
      TextFunctions.punctChars(col("text")).as("punct")).head()
    assert(r.getAs[Long]("wc") == 4L)
    assert(r.getAs[Long]("alpha") == 16L) // Helloworldfoobar
    assert(r.getAs[Long]("punct") == 2L)  // comma + bang
  }

  test("markerCount counts single-pass non-overlapping occurrences") {
    // "the the the" yields 2: replace() scans once left-to-right, so the
    // middle occurrence's leading space is consumed by the first match.
    // DuckDB's replace has the same semantics — which is what parity needs.
    val df = Seq("the the the cat").toDF("text")
    val r = df.select(TextFunctions.markerCount(col("text"), " the ").as("c")).head()
    assert(r.getAs[Double]("c") == 2.0)
  }

  test("langId picks the dominant marker language deterministically") {
    val r = Seq(
      "the cat sat on a mat",
      "der hund und der vogel und",
      "xyzzy plugh").toDF("text")
      .select(TextFunctions.langId(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(r == Seq("en", "de", "unknown"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A  b\tC", "a b c")).toDF("t1", "t2")
    val r = df.select(
      (TextFunctions.fingerprint(col("t1")) ===
        TextFunctions.fingerprint(col("t2"))).as("eq")).head()
    assert(r.getAs[Boolean]("eq"))
  }

  test("bpeish token count splits letter runs, digit runs, punctuation") {
    val df = Seq("abc123!x y").toDF("text")
    // tokens: abc | 123 | ! | x | y
    assert(df.select(TextFunctions.bpeishTokenCount(col("text"))).head().getLong(0) == 5L)
  }
}
