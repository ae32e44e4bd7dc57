package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** READ-ONLY interop with an ICEBERG-SHAPED table layout — the external
  * table-format noun of the reference architecture (the reference serves
  * its lake as Apache Iceberg tables; see reference README "Apache
  * Iceberg table format") re-expressed against this engine's TxLake.
  *
  * The layout models the Iceberg metadata CHAIN, not the full spec:
  *
  *   `metadata/version-hint.text`      → latest metadata version
  *   `metadata/vN.metadata.json`       → current snapshot id + its
  *                                       manifest-LIST path + schema DDL
  *   `metadata/snap-<id>/` (avro)      → manifest list: one row per
  *                                       manifest (path, file count, rows)
  *   `metadata/manifest-<k>/` (avro)   → data-file entries
  *                                       (path, record_count)
  *   data files                        → referenced IN PLACE (zero-copy)
  *
  * What is faithful: manifests are real Avro container files, readers
  * traverse ONLY metadata the chain names (never a directory listing of
  * data), per-file record counts ride the manifests, and the version
  * hint makes the latest snapshot discoverable without parsing history.
  * What is scoped out (read-only interop, not a write path): partition
  * specs, sequence-number inheritance, delete files, multi-snapshot
  * history.
  *
  * Scale: the chain is METADATA-sized end to end — export writes
  * O(#files / manifestSize) manifest rows from the TxLake log alone
  * (no data file opened), read collects O(#manifests + #files) strings
  * and hands the file list to one parquet scan.
  */
object IcebergLite {

  private val manifestSchema = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("record_count", LongType, nullable = true)))

  private val manifestListSchema = StructType(Seq(
    StructField("manifest_path", StringType, nullable = false),
    StructField("added_files_count", LongType, nullable = false),
    StructField("added_rows_count", LongType, nullable = true)))

  /** EXPORT the latest TxLake snapshot as an Iceberg-shaped table at
    * `outDir` — zero-copy (data files referenced in place), metadata-only
    * cost. Refuses DV-masked tables loudly: the foreign layout has no
    * delete-file tier in scope, and exporting the raw files would
    * resurrect masked rows. Returns the snapshot id.
    */
  def export(
      spark: SparkSession,
      txPath: String,
      outDir: String,
      filesPerManifest: Int = 4): Long = {
    require(filesPerManifest >= 1)
    require(TxLake.dvFiles(txPath).isEmpty,
      "export: table carries deletion vectors; the read-only interop " +
        "layout has no delete-file tier — OPTIMIZE (rewrite) first")
    val snapshotId = TxLake.latestVersion(txPath)
    require(snapshotId > 0L, s"no committed data at $txPath")
    val perFile = TxLake.fileRowCounts(txPath)
    val schemaDdl = TxLake.readSnapshot(spark, txPath).schema.toDDL
    require(!schemaDdl.exists(c => c == '"' || c == '\\'),
      s"schema DDL not JSON-safe: $schemaDdl")
    val meta = Paths.get(outDir, "metadata")
    Files.createDirectories(meta)
    import spark.implicits._
    // manifests are namespaced by snapshot: a re-export must never
    // overwrite an older chain's files or time travel silently reads the
    // new data through the old metadata
    val manifests = perFile.grouped(filesPerManifest).zipWithIndex.map {
      case (group, k) =>
        val mDir = meta.resolve(f"manifest-$snapshotId-$k%05d").toString
        val rows = AvroIo.write(
          group.map { case (f, n) => (f, n.getOrElse(-1L)) }
            .toDF("file_path", "record_count").coalesce(1), mDir)
        require(rows == group.size.toLong, "manifest write incomplete")
        (mDir, group.size.toLong,
          group.flatMap(_._2).sum)
    }.toSeq
    val listDir = meta.resolve(s"snap-$snapshotId").toString
    AvroIo.write(manifests
      .toDF("manifest_path", "added_files_count", "added_rows_count")
      .coalesce(1), listDir)
    val json =
      s"""{"format-version":2,"location":"$outDir",""" +
        s""""current-snapshot-id":$snapshotId,""" +
        s""""schema-ddl":"$schemaDdl",""" +
        s""""snapshots":[{"snapshot-id":$snapshotId,""" +
        s""""manifest-list":"$listDir"}]}"""
    val vFile = meta.resolve(s"v$snapshotId.metadata.json")
    val tmp = meta.resolve(s".tmp-v$snapshotId")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, vFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // the hint lands LAST: a reader never sees a hint without its metadata
    Files.write(meta.resolve("version-hint.text"),
      snapshotId.toString.getBytes("UTF-8"))
    snapshotId
  }

  private def metadataJson(dir: String, snapshotId: Long = -1L): String = {
    val meta = Paths.get(dir, "metadata")
    val v =
      if (snapshotId > 0L) snapshotId.toString
      else new String(
        Files.readAllBytes(meta.resolve("version-hint.text")), "UTF-8").trim
    val f = meta.resolve(s"v$v.metadata.json")
    require(Files.exists(f), s"no exported snapshot v$v at $dir")
    new String(Files.readAllBytes(f), "UTF-8")
  }

  private def field(json: String, key: String): String =
    s""""$key":"([^"]*)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"metadata missing $key")).group(1)

  /** Read the current snapshot by WALKING THE CHAIN: version hint →
    * metadata json → manifest list (avro) → manifests (avro) → one
    * parquet scan over exactly the named files, with the published
    * schema applied (never inferred from footers). No directory of data
    * files is ever listed.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAt(spark, dir, -1L)

  /** [[read]] pinned at an exported snapshot id — TIME TRAVEL through
    * the foreign layout: older metadata files stay on disk after a
    * re-export (only the hint advances), so every exported snapshot
    * keeps reading through its own manifest chain (the Iceberg
    * `snapshot-id` read option). Fails loudly on a never-exported id.
    */
  def readAt(spark: SparkSession, dir: String, snapshotId: Long): DataFrame = {
    val json = metadataJson(dir, snapshotId)
    val schema = StructType.fromDDL(field(json, "schema-ddl"))
    val listDir = field(json, "manifest-list")
    val manifestDirs = AvroIo.read(spark, listDir, manifestListSchema)
      .select("manifest_path").collect().map(_.getString(0)).sorted
    val files = manifestDirs.flatMap { m =>
      AvroIo.read(spark, m, manifestSchema)
        .select("file_path").collect().map(_.getString(0))
    }.toSeq.sorted
    require(files.nonEmpty, s"empty manifest chain at $dir")
    spark.read.schema(schema).parquet(files: _*)
  }

  /** Chain accounting without touching a data file: snapshot id, manifest
    * count, data-file count, and the manifest-recorded row total.
    */
  def snapshotInfo(spark: SparkSession, dir: String): (Long, Long, Long, Long) = {
    val json = metadataJson(dir)
    val snapshotId = """"current-snapshot-id":(\d+)""".r
      .findFirstMatchIn(json).getOrElse(sys.error("missing snapshot id"))
      .group(1).toLong
    val listDir = field(json, "manifest-list")
    val list = AvroIo.read(spark, listDir, manifestListSchema).collect()
    (snapshotId, list.length.toLong,
      list.map(_.getLong(1)).sum, list.map(_.getLong(2)).sum)
  }
}
