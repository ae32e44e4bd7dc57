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
