package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.Lineage

class LineageSpec extends SparkSuite {
  import spark.implicits._

  private def edges(df: org.apache.spark.sql.DataFrame,
      inputs: Map[String, org.apache.spark.sql.DataFrame]) =
    Lineage.columnLineage(df, inputs)
      .as[(String, String, String)].collect().toSet

  test("aliases, joins and windows trace to leaf columns; literals to null") {
    val a = Seq((1L, 2.0, "x")).toDF("k", "v", "s")
    val b = Seq((1L, 5L)).toDF("k2", "w")
    val q = a.join(b, col("k") === col("k2"))
      .groupBy(col("s"))
      .agg(sum(col("v") + col("w")).as("t"), count(lit(1)).as("n"))
      .withColumn("share", col("t") / sum(col("t")).over(Window.partitionBy()))
      .withColumn("lbl", lit("z"))
    val got = edges(q, Map("a" -> a, "b" -> b))
    assert(got == Set(
      ("s", "a", "s"),
      ("t", "a", "v"), ("t", "b", "w"),
      ("n", null, null),
      ("share", "a", "v"), ("share", "b", "w"),
      ("lbl", null, null)))
  }

  test("union merges branch sources positionally; explode fans generator refs") {
    val a = Seq((1L, "p")).toDF("k", "t")
    val b = Seq((2L, "q")).toDF("k", "t")
    val u = a.select(col("k").as("id"), col("t"))
      .unionByName(b.select(col("k").as("id"), col("t")))
    val gu = edges(u, Map("a" -> a, "b" -> b))
    assert(gu == Set(("id", "a", "k"), ("id", "b", "k"),
      ("t", "a", "t"), ("t", "b", "t")))
    val e = a.select(col("k"), explode(split(col("t"), " ")).as("tok"))
    val ge = edges(e, Map("a" -> a))
    assert(ge == Set(("k", "a", "k"), ("tok", "a", "t")))
  }

  test("columnLineageSql anchors on view names; view internals stay opaque") {
    // the view itself is built from a projection — lineage must stop at
    // the VIEW's columns, not dissolve through to the underlying frame
    Seq((1L, 2.0, "x")).toDF("k0", "v0", "s0")
      .select(col("k0").as("k"), (col("v0") * 2).as("v"), col("s0").as("s"))
      .createOrReplaceTempView("base_v")
    val q = spark.sql(
      "SELECT s AS grp, sum(v) AS total, count(*) AS n, 'z' AS lit " +
        "FROM base_v GROUP BY s")
    val got = Lineage.columnLineageSql(q, Set("base_v"))
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("grp", "base_v", "s"),
      ("total", "base_v", "v"),
      ("n", null, null),
      ("lit", null, null)))
  }

  test("columnLineageLake anchors file-scan leaves by lake path, longest root wins") {
    val root = java.nio.file.Files.createTempDirectory("graft_lin_lake")
    val outer = root.resolve("outer").toString
    val inner = root.resolve("outer/nested").toString
    Seq((1L, 2.0)).toDF("k", "v").write.mode("overwrite").parquet(outer)
    Seq((1L, "x")).toDF("k", "s").write.mode("overwrite").parquet(inner)
    val a = spark.read.parquet(outer)
    val b = spark.read.parquet(inner)
    val q = a.join(b, Seq("k"))
      .select(col("k"), (col("v") * 2).as("v2"), upper(col("s")).as("su"))
    val got = Lineage.columnLineageLake(q,
        Map("outer_t" -> outer, "inner_t" -> inner))
      .as[(String, String, String)].collect().toSet
    // the nested table's files sit under BOTH roots: the longer (more
    // specific) registration must claim them. An inner USING join emits
    // the LEFT side's key attribute, so k traces to outer_t alone.
    assert(got == Set(
      ("k", "outer_t", "k"),
      ("v2", "outer_t", "v"),
      ("su", "inner_t", "s")))
    // an unregistered scan stays unresolved rather than mislabeled
    val loose = Lineage.columnLineageLake(
        b.select((col("k") + 1).as("k1")), Map("outer_only" -> (outer + "/zz")))
      .as[(String, String, String)].collect().toSet
    assert(loose == Set(("k1", null, null)))
  }
}
