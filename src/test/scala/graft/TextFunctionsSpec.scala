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

  test("normalizeUrl canonicalizes scheme, host, ports, params, slashes") {
    val cases = Seq(
      // upper scheme/host, www, default https port, utm params, fragment
      "HTTPS://WWW.Ex.COM:443/Docs/1?utm_source=x&ref=de#top" ->
        "https://ex.com/Docs/1?ref=de",
      // trailing slash, http default port
      "http://ex.com:80/docs/2/" -> "http://ex.com/docs/2",
      // non-default port survives; all params were tracking → no query
      "https://ex.com:8080/docs/3?utm_medium=y" -> "https://ex.com:8080/docs/3",
      // mobile alias collapses; path case is preserved
      "https://m.ex.com/DOCS/4" -> "https://m.ex.com/DOCS/4"
        .replace("m.ex.com", "ex.com"),
      // non-utm params and their order are untouched
      "https://ex.com/p?b=2&a=1" -> "https://ex.com/p?b=2&a=1")
    val df = cases.map(_._1).toDF("u")
      .select(col("u"), TextFunctions.normalizeUrl(col("u")).as("n"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"for $in") }
  }

  test("urlHost extracts the registrable host from a normalized url") {
    val df = Seq("https://ex.com:8080/docs/3").toDF("u")
    assert(df.select(TextFunctions.urlHost(col("u"))).head().getString(0)
      == "ex.com")
  }
}
