package graft

import org.apache.spark.sql.functions._

import graft.plans.{PhoneticExpressions, PhoneticKey}

class PhoneticSpec extends SparkSuite {
  import spark.implicits._

  test("PhoneticKey: the classic Soundex reference names (codegen path)") {
    // Robert/Rupert collide (the point of phonetic blocking); Ashcraft
    // exercises H-transparency (c after h collapses into s), Tymczak the
    // vowel reset (z re-emits 2 after a? no — z collapses into c, k
    // re-emits after the vowel a), Pfister the head-code collapse
    // (f never emits after P), Honeyman the H head.
    val expected = Map(
      "Robert" -> "R163", "Rupert" -> "R163", "Ashcraft" -> "A261",
      "Tymczak" -> "T522", "Pfister" -> "P236", "Honeyman" -> "H555")
    val got = expected.keys.toSeq.toDF("w")
      .select(col("w"), PhoneticExpressions.phoneticKey(col("w")).as("k"))
      .as[(String, String)].collect().toMap
    expected.foreach { case (w, k) => assert(got(w) == k, s"name=$w") }
  }

  test("PhoneticKey: non-letters drop without separating; no letters -> empty") {
    val cases = Seq(
      "O'Brien" -> PhoneticKey.key("OBrien"), // apostrophe is invisible
      "van der Berg" -> PhoneticKey.key("vanderBerg"),
      "Customer#000000001" -> "C235", // digits/punctuation invisible
      "12345!" -> "", "" -> "")
    val got = cases.map(_._1).toDF("w")
      .select(col("w"), PhoneticExpressions.phoneticKey(col("w")).as("k"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (w, k) => assert(got(w) == k, s"input=$w") }
    // null propagates
    val n = Seq[Option[String]](None).toDF("w")
      .select(PhoneticExpressions.phoneticKey(col("w"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("PhoneticKey codegen agrees with the reference on random strings") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ '-é9"
    val words = (0 until 500).map(_ =>
      (0 until rnd.nextInt(16)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = words.toDF("w")
      .select(col("w"), PhoneticExpressions.phoneticKey(col("w")).as("k"))
      .as[(String, String)].collect()
    got.foreach { case (w, k) => assert(k == PhoneticKey.key(w), s"input=$w") }
  }

  test("phonetic_key is SQL-reachable via GraftExtensions") {
    val r = spark.sql("SELECT phonetic_key('Ashcraft') AS k").collect()
    assert(r.head.getString(0) == "A261")
    val err = intercept[Exception](spark.sql("SELECT phonetic_key(1, 2)"))
    assert(err.getMessage.contains("phonetic_key"))
  }
}
