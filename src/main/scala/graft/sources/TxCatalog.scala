package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-level transactions: ONE atomic commit spanning SEVERAL tables.
  *
  * A single-table log ([[TxLake]]) makes each table internally consistent,
  * but a pipeline that writes a fact table AND its derived aggregate in
  * two commits exposes readers to the window between them — the classic
  * fact/rollup drift. Here the tables share one log:
  *
  * {{{
  *   <root>/_log/<%08d version>.json        one entry per TRANSACTION
  *   <root>/<table>/data/v<version>/part-….parquet
  * }}}
  *
  * An entry carries per-table adds/removes (`"adds:<table>"` flat keys,
  * same escape-free parsing as TxLake's). Readers of ANY member table
  * replay the same log, so a transaction is visible to all tables or to
  * none — the multi-statement transaction semantics Delta/Iceberg gain
  * from a shared catalog, re-expressed with the same reserve-then-publish
  * filesystem protocol as TxLake (atomic create claims the version, data
  * for EVERY table lands, then one atomic rename publishes the entry; a
  * crash between table writes leaves a pending reservation that hides
  * everything and is eventually janitored).
  */
object TxCatalog {

  final class ConcurrentCommitException(v: Long)
    extends RuntimeException(s"version $v was reserved by a concurrent writer")

  private def logDir(root: String): Path = Paths.get(root, "_log")
  private def logFile(root: String, v: Long): Path =
    logDir(root).resolve(f"$v%08d.json")

  /** Committed (non-pending) entries in version order; replay stops at the
    * first pending (empty) reservation, exactly like TxLake.
    */
  private def entries(root: String): Seq[(Long, String)] = {
    val dir = logDir(root)
    if (!Files.isDirectory(dir)) return Seq.empty
    val all = Files.list(dir)
    val named = try all.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(f => f.getFileName.toString.stripSuffix(".json").toLong -> f)
      .toSeq.sortBy(_._1)
    finally all.close()
    named.iterator
      .map { case (v, f) => (v, new String(Files.readAllBytes(f), "UTF-8")) }
      .takeWhile(_._2.nonEmpty)
      .toSeq
  }

  private def jsonList(json: String, key: String): Seq[String] = {
    val m = s""""$key":\\[([^\\]]*)\\]""".r.findFirstMatchIn(json)
    m.map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
  }

  def latestVersion(root: String): Long =
    entries(root).lastOption.map(_._1).getOrElse(0L)

  private def activeFiles(root: String, table: String, version: Long): Seq[String] = {
    val active = scala.collection.mutable.LinkedHashSet[String]()
    entries(root).takeWhile(_._1 <= version).foreach { case (_, json) =>
      jsonList(json, s"removes:$table").foreach(active.remove)
      active ++= jsonList(json, s"adds:$table")
    }
    active.toSeq
  }

  /** Commit every (table, frame) pair as ONE transaction. `overwrite`
    * replaces each written table's current content (tables not in `loads`
    * are untouched either way). Returns the committed version.
    */
  def commit(
      spark: SparkSession,
      root: String,
      loads: Seq[(String, DataFrame)],
      overwrite: Boolean = false): Long = {
    require(loads.nonEmpty, "a transaction must write at least one table")
    require(loads.map(_._1).distinct.size == loads.size,
      "one frame per table and transaction")
    loads.foreach { case (t, _) =>
      require(t.matches("[A-Za-z0-9_]+"), s"unsafe table name: $t")
    }
    val next = latestVersion(root) + 1
    Files.createDirectories(logDir(root))
    val log = logFile(root, next)
    try Files.createFile(log)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(next)
    }
    // land EVERY table's data while the entry is still pending (invisible);
    // a crash anywhere in this loop leaves no table changed for readers
    val parts = loads.map { case (table, df) =>
      val dataDir = s"$root/$table/data/v$next"
      df.write.mode("overwrite").parquet(dataDir)
      val d = Paths.get(dataDir)
      val s = Files.list(d)
      val adds = try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally s.close()
      require(adds.forall(p => !p.contains("\"") && !p.contains("\\")),
        "data paths must be JSON-safe")
      val removes = if (overwrite) activeFiles(root, table, next - 1) else Seq.empty
      s""""adds:$table":[${adds.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""removes:$table":[${removes.map("\"" + _ + "\"").mkString(",")}]"""
    }
    val json =
      s"""{"version":$next,"tables":[${loads.map("\"" + _._1 + "\"").mkString(",")}],""" +
        parts.mkString(",") + "}"
    val tmp = logDir(root).resolve(f".tmp-$next%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Snapshot of one member table at `version` (default: latest). The
    * version is TRANSACTION-level: reading two tables at the same version
    * is guaranteed mutually consistent.
    */
  def readSnapshot(
      spark: SparkSession,
      root: String,
      table: String,
      version: Long = Long.MaxValue): DataFrame = {
    val files = activeFiles(root, table, version)
    require(files.nonEmpty, s"table $table is empty as of version $version")
    spark.read.parquet(files: _*)
  }
}
