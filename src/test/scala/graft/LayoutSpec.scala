package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zorderValue interleaves bits exactly (reference check)") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(11)
    val pairs = (0 until 200).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 16), s"($x,$y)") }
  }

  test("zorderWrite clusters both dimensions: per-file key ranges are narrow") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val rnd = new scala.util.Random(7)
    val df = (0 until 20000)
      .map(i => (i.toLong, rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("id", "x", "y")
    Layout.zorderWrite(df, dir, "x", "y", bits = 12, files = 8)
    // each parquet file should cover a fraction of BOTH key domains — a
    // single-dimension sort would leave the other dimension's per-file
    // range at ~full domain
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col("x")) - min(col("x"))).as("xr"), (max(col("y")) - min(col("y"))).as("yr"))
      .agg(avg(col("xr")).as("ax"), avg(col("yr")).as("ay"))
      .head()
    assert(perFile.getAs[Double]("ax") < 4096 * 0.8, s"x range too wide: $perFile")
    assert(perFile.getAs[Double]("ay") < 4096 * 0.8, s"y range too wide: $perFile")
  }
}
