package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on the public Avro core
  * API (`org.apache.avro`, on the classpath) — the spark-avro DataSource
  * module is not available in this environment, so the round-trip is
  * implemented the way a custom format integration would be: one Avro
  * object-container file per partition on write, one read task per file on
  * read. Everything data-sized stays on executors; the driver only ever
  * sees the file listing and the schema string.
  *
  * Scale shape: write is `mapPartitionsWithIndex` (no shuffle, no driver
  * data); read parallelizes the file list into one task per container
  * file and decodes lazily — a file is streamed record by record, never
  * buffered whole. Nullable columns map to Avro `["null", T]` unions,
  * matching what spark-avro would emit for the same schema.
  */
object AvroIo {

  /** Avro record schema for a DataFrame schema (primitive columns only —
    * the engine's staging surface; nested data flattens first, q51-style).
    */
  def avroSchemaFor(schema: StructType, name: String): Schema = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType    => "long"
        case IntegerType => "int"
        case DoubleType  => "double"
        case FloatType   => "float"
        case StringType  => "string"
        case BooleanType => "boolean"
        case BinaryType  => "bytes"
        case other => throw new IllegalArgumentException(
          s"unsupported Avro staging type: $other (column ${f.name})")
      }
      if (f.nullable)
        s"""{"name":"${f.name}","type":["null","$t"],"default":null}"""
      else s"""{"name":"${f.name}","type":"$t"}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"$name","fields":[$fields]}""")
  }

  /** Write one Avro container file per partition under `dir`. Returns the
    * row count (forcing the job). Deflate-compressed, the container
    * format's standard codec.
    */
  def write(df: DataFrame, dir: String): Long = {
    val schemaJson = avroSchemaFor(df.schema, "graft_rec").toString
    val names = df.schema.fieldNames
    val binary = df.schema.fields.map(_.dataType == BinaryType)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val sch = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(sch, new java.io.File(dir, f"part-$pid%05d.avro"))
      var n = 0L
      try it.foreach { row =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < names.length) {
          val v = row.get(i)
          rec.put(i,
            if (v == null) null
            else if (binary(i)) java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
            else v)
          i += 1
        }
        w.append(rec)
        n += 1
      } finally w.close()
      Iterator.single(n)
    }.sum().toLong
  }

  /** Read every container file under `dir` as a DataFrame of `schema` —
    * one task per file, records decoded lazily off the streaming reader.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted.toSeq
    val binary = schema.fields.map(_.dataType == BinaryType)
    val width = schema.length
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.length, 1))
      .flatMap { path =>
        val reader = DataFileReader.openReader(new java.io.File(path),
          new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          private var open = true
          def hasNext: Boolean = {
            if (open && !reader.hasNext) { reader.close(); open = false }
            open
          }
          def next(): Row = {
            val rec = reader.next()
            val vals = new Array[Any](width)
            var i = 0
            while (i < width) {
              vals(i) = rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case b: java.nio.ByteBuffer if binary(i) =>
                  val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
                case v => v
              }
              i += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
