package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroIo

class AvroIoSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("active", BooleanType),
    StructField("payload", BinaryType)))

  test("round-trip preserves rows, nulls and bytes across partitions") {
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null),
      Row(3L, "gamma", -0.25, null, Array[Byte]()),
      Row(4L, "", 0.0, true, Array[Byte](-128, 127)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema).repartition(3)
    val dir = Files.createTempDirectory("graft_avro").toString
    assert(AvroIo.write(df, dir) == 4L)
    // one container file per non-empty partition, none oversized
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 3)
    val back = AvroIo.read(spark, dir, schema)
    assert(back.schema == schema)
    val got = back.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq)))
      .sortBy(_._1).toSeq
    val exp = rows.map(r =>
      (r.getLong(0), Option(r.getString(1)), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq)))
      .sortBy(_._1)
    assert(got == exp)
  }

  test("an aggregate over the read-back equals one over the source") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"k${i % 7}", i * 0.5))
      .toDF("id", "k", "v")
    val dir = Files.createTempDirectory("graft_avro2").toString
    AvroIo.write(df.repartition(4), dir)
    val back = AvroIo.read(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("k", StringType),
      StructField("v", DoubleType))))
    val a = back.groupBy(col("k")).agg(count(lit(1)).as("n"),
      sum(col("v").cast(DecimalType(18, 2))).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    val b = df.groupBy(col("k")).agg(count(lit(1)).as("n"),
      sum(col("v").cast(DecimalType(18, 2))).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    assert(a == b)
  }

  test("unsupported staging types are rejected loudly") {
    import spark.implicits._
    val nested = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    intercept[IllegalArgumentException] {
      AvroIo.avroSchemaFor(nested.schema, "r")
    }
  }
}
