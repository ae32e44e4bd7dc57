package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// temporary dev probe — removed before final round
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.operators.Dedup
    val base = df.select(
      col("doc_id").as("id"),
      array_sort(array_distinct(
        transform(Dedup.shingles(col("text"), 2), g => xxhash64(g)))).as("grams"))
      .withColumn("bucket", array_min(col("grams")))
    time("base count")(println(base.count()))
    val wb = Window.partitionBy(col("bucket")).orderBy(col("id"))
    val capped = base.withColumn("__rn", row_number().over(wb)).filter(col("__rn") <= 64)
    time("capped count")(println(capped.count()))
    val a = capped.select(col("bucket"), col("id").as("id_a"), col("grams").as("g_a"))
    val b = capped.select(col("bucket"), col("id").as("id_b"), col("grams").as("g_b"))
    val joined = a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
    time("pair count")(println(joined.count()))
    val scored = joined.select(col("id_a"), col("id_b"),
      (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
        size(array_union(col("g_a"), col("g_b"))).cast("double")).as("jaccard")).distinct()
    time("scored count")(println(scored.count()))
    time("full q24")(println(Dedup.ngramJaccardTopPairs(df, "doc_id", "text").count()))
    time("bucket dist")(base.groupBy("bucket").count().orderBy(col("count").desc).show(5))
    spark.stop()
  }
}
