package graft

import org.apache.spark.sql.functions._

import graft.plans.{TextHashExpressions, XsHash, XsMix}

class TextHashSpec extends SparkSuite {
  import spark.implicits._

  // values cross-checked against the DuckDB HUGEINT macro implementation
  // (tools-side parity probe) — pin them so either side drifting fails here
  private val pinned = Seq(
    "hello" -> 7320341468028616870L,
    "a" -> -2586341935350450804L,
    "Zürich" -> 7118429231165783676L,
    "the" -> -8438829333835550309L,
    "123" -> 1594599057582460663L,
    "word-with-dash" -> 8226536115018188388L,
    "" -> -7046029254386353131L)

  test("XsHash matches the DuckDB-verified reference values (codegen path)") {
    val got = pinned.map(_._1).toDF("w")
      .select(col("w"), TextHashExpressions.xsHash(col("w")).as("h"))
      .as[(String, Long)].collect().toMap
    pinned.foreach { case (w, exp) => assert(got(w) == exp, s"word=$w") }
  }

  test("XsHash codegen agrees with the reference implementation on random strings") {
    val rnd = new scala.util.Random(7)
    val words = (0 until 500).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(20)).mkString + (if (rnd.nextBoolean()) "é" else ""))
    val got = words.toDF("w")
      .select(col("w"), TextHashExpressions.xsHash(col("w")).as("h"))
      .as[(String, Long)].collect()
    got.foreach { case (w, h) =>
      assert(h == XsHash.hash(w.getBytes("UTF-8")), s"word=$w")
    }
  }

  test("xs_hash is SQL-reachable via GraftExtensions and type-checks at analysis") {
    assert(spark.sql("SELECT xs_hash('hello') AS h").as[Long].head() ==
      7320341468028616870L)
    assert(spark.sql("SELECT xs_mix(1L, 2L) AS h").as[Long].head() ==
      graft.plans.XsMix.mix(1L, 2L))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT xs_hash(42)").collect()
    }
    assert(err.getMessage.contains("xs_hash") || err.getMessage.contains("STRING"))
  }

  test("XsWindowCuts codegen equals the HOF formulation on real documents") {
    // the one-pass expression replaced sequence/transform/filter in
    // contentChunks; prove it computes the IDENTICAL bounds array,
    // including multi-byte (UTF-8) text where byte and char windows differ
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((90001L, "Zürich Zürich straße ünïcödé test here"),
        (90002L, "short")).toDF("doc_id", "text"))
    val w = 8
    val hof = array_distinct(concat(
      when(length(col("text")) >= w,
        filter(
          transform(sequence(lit(w), length(col("text"))),
            i => when(pmod(TextHashExpressions.xsHash(
              col("text").substr(i - lit(w - 1), lit(w))), lit(64L)) === 0,
              i.cast("long"))),
          c => c.isNotNull)).otherwise(typedlit(Seq.empty[Long])),
      array(length(col("text")).cast("long"))))
    val mismatches = docs
      .select(col("doc_id"), hof.as("a"),
        TextHashExpressions.xsWindowCuts(col("text"), w, 64L).as("b"))
      .filter(not(col("a") === col("b")))
      .count()
    assert(mismatches == 0)
  }

  test("XsWindowCuts interpreted eval matches its reference implementation") {
    val r = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val s = (0 until r.nextInt(60)).map(_ =>
        "aäb💡 cd".charAt(r.nextInt(7))).mkString
      val bytes = org.apache.spark.unsafe.types.UTF8String.fromString(s).getBytes
      val viaExpr = graft.plans.XsWindowCuts(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)), 3, 16L)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(viaExpr == graft.plans.XsWindowCuts.cuts(bytes, 3, 16L).toSeq, s"s=$s")
    }
  }

  test("XsMix fold matches the reference and is order-sensitive") {
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val folded = Seq(col("a"), col("b"), col("c"))
      .foldLeft(lit(0x9E3779B97F4A7C15L): org.apache.spark.sql.Column)(
        TextHashExpressions.xsMix)
    val got = df.select(folded.as("h")).as[Long].head()
    val exp = Seq(1L, 2L, 3L).foldLeft(0x9E3779B97F4A7C15L)(XsMix.mix)
    assert(got == exp)
    val swapped = Seq(2L, 1L, 3L).foldLeft(0x9E3779B97F4A7C15L)(XsMix.mix)
    assert(exp != swapped)
  }
}
