package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction-log table format over plain parquet — the
  * Delta/Iceberg commit idea re-expressed with filesystem primitives.
  *
  * Layout:
  * {{{
  *   <path>/data/v<version>/part-*.parquet   immutable data files
  *   <path>/_log/<%08d version>.json         one commit entry per file
  * }}}
  * Each log entry records the files the commit ADDS and the files it
  * REMOVES (logically — removed files stay on disk so older snapshots
  * remain readable). A snapshot at version V = replay entries 1..V,
  * union the surviving files. That gives:
  *
  *   - ATOMIC multi-file commits: readers either see all of a commit's
  *     files or none, because visibility is the log entry, not the data
  *     files (which land before the entry is published).
  *   - Optimistic concurrency: a commit RESERVES its version by an
  *     atomic create of the log filename; a concurrent writer racing for
  *     the same version gets [[ConcurrentCommitException]] and retries on
  *     top of the new latest. (On an object store this maps to a
  *     conditional put / put-if-absent.)
  *   - Time travel + rollback for free: read any version; "rollback" is a
  *     new commit removing the bad commit's files.
  *
  * Reservation protocol: `createFile(N.json)` atomically claims N with an
  * EMPTY file; content then swaps in via atomic rename. Readers stop the
  * replay at the first still-empty (pending) entry, so a partially
  * published commit is invisible. A crashed writer leaves a permanently
  * empty reservation — [[abandonPending]] is the janitor.
  */
object TxLake {

  final class ConcurrentCommitException(v: Long)
    extends RuntimeException(s"version $v was reserved by a concurrent writer")

  private def logDir(path: String): Path = Paths.get(path, "_log")
  private def logFile(path: String, v: Long): Path =
    logDir(path).resolve(f"$v%08d.json")

  /** Committed (non-pending) log entries in version order. */
  /** Committed (non-pending) log entries in version order, reading only
    * versions strictly after `after` (a checkpoint boundary — entries at
    * or below it were visible when the checkpoint was written, so no
    * pending reservation can hide below it).
    */
  private def entries(path: String, after: Long = 0L): Seq[(Long, String)] = {
    val dir = logDir(path)
    if (!Files.isDirectory(dir)) return Seq.empty
    val all = Files.list(dir)
    val named = try {
      all.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .map(f => f.getFileName.toString.stripSuffix(".json").toLong -> f)
        .filter(_._1 > after)
        .toSeq.sortBy(_._1)
    } finally all.close()
    // stop at the first pending (empty) reservation: later entries exist
    // only if their writer raced ahead of a crashed one — invisible too
    named.iterator
      .map { case (v, f) => (v, new String(Files.readAllBytes(f), "UTF-8")) }
      .takeWhile(_._2.nonEmpty)
      .toSeq
  }

  def latestVersion(path: String): Long = {
    val ck = latestCheckpoint(path, Long.MaxValue).map(_._1).getOrElse(0L)
    entries(path, after = ck).lastOption.map(_._1).getOrElse(ck)
  }

  /** Active data files as of `version` with their logged (min, max) stats
    * for the commit's stats column, when recorded.
    */
  /** Minimal list extractor for our own writer's format: quoted paths
    * carry no escapes (enforced at commit time).
    */
  private def jsonList(json: String, key: String): Seq[String] = {
    val m = s""""$key":\\[([^\\]]*)\\]""".r.findFirstMatchIn(json)
    m.map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
  }

  private def ckptFile(path: String, v: Long): Path =
    logDir(path).resolve(f"checkpoint-$v%08d.ckpt")

  /** Files+stats parsed from one adds/mins/maxs JSON blob. The legacy
    * single-column stats live under the "" key; named columns (the
    * multi-column skipping surface) under `"mins:<col>"`/`"maxs:<col>"`
    * arrays listed in `"statsCols"` — flat keys keep the escape-free
    * extractor sufficient.
    */
  private def parseFileSet(json: String): Seq[(String, Map[String, (Long, Long)])] = {
    val adds = jsonList(json, "adds")
    def colStats(suffix: String): Option[Seq[(Long, Long)]] = {
      val mins = jsonList(json, s"mins$suffix")
      val maxs = jsonList(json, s"maxs$suffix")
      if (adds.nonEmpty && mins.length == adds.length && maxs.length == adds.length)
        Some(mins.zip(maxs).map { case (a, b) => (a.toLong, b.toLong) })
      else None
    }
    // per-file row counts ride in the same aligned-array shape under the
    // reserved "#rows" pseudo-column (stored as (n, n)) — "#" can never
    // collide with a statsCols identifier
    val rowsArr = jsonList(json, "rows")
    val rowsCol: Option[Seq[(Long, Long)]] =
      if (adds.nonEmpty && rowsArr.length == adds.length)
        Some(rowsArr.map(r => (r.toLong, r.toLong)))
      else None
    val cols: Seq[(String, Seq[(Long, Long)])] =
      (("" -> colStats("")) +: ("#rows" -> rowsCol) +:
        jsonList(json, "statsCols").map(c => c -> colStats(s":$c")))
        .collect { case (c, Some(s)) => c -> s }
    adds.zipWithIndex.map { case (f, i) =>
      f -> cols.map { case (c, s) => c -> s(i) }.toMap
    }
  }

  /** Stats-suffix JSON (legacy "" column + every named column present on
    * ALL files — the checkpoint rule: partial stats can't prune safely) for
    * a summarized active set. Used by [[checkpoint]] and [[branch]] so a
    * summarizing entry never silently drops the skipping metadata.
    */
  private def statsJson(active: Seq[(String, Map[String, (Long, Long)])]): String = {
    if (active.isEmpty) return ""
    val all = active.map(_._2.keySet).reduce(_ intersect _)
    // "#rows" serializes as its own aligned array (the checkpoint rule
    // still applies: carried only when EVERY summarized file has a count)
    val rows =
      if (all.contains("#rows"))
        s""","rows":[${active.map(_._2("#rows")._1).mkString(",")}]"""
      else ""
    val cols = all - "#rows"
    cols.toSeq.sorted.map { c =>
      val suffix = if (c.isEmpty) "" else s":$c"
      s""","mins$suffix":[${active.map(_._2(c)._1).mkString(",")}],""" +
        s""""maxs$suffix":[${active.map(_._2(c)._2).mkString(",")}]"""
    }.mkString("") + {
      val named = cols.filter(_.nonEmpty)
      if (named.isEmpty) ""
      else s""","statsCols":[${named.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}]"""
    } + rows
  }

  /** The newest checkpoint at or before `version`, if any:
    * (version, parsed file set, raw json — for the op/stat extractors).
    */
  private def latestCheckpoint(
      path: String,
      version: Long): Option[(Long, Seq[(String, Map[String, (Long, Long)])], String)] = {
    val dir = logDir(path)
    if (!Files.isDirectory(dir)) return None
    val all = Files.list(dir)
    val best = try all.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("checkpoint-") && n.endsWith(".ckpt"))
      .map(_.stripPrefix("checkpoint-").stripSuffix(".ckpt").toLong)
      .filter(_ <= version).toSeq.sorted.lastOption
    finally all.close()
    best.map { v =>
      val json = new String(Files.readAllBytes(ckptFile(path, v)), "UTF-8")
      (v, parseFileSet(json), json)
    }
  }

  private def activeEntries(
      path: String, version: Long): Seq[(String, Map[String, (Long, Long)])] = {
    val base = latestCheckpoint(path, version)
    val active =
      scala.collection.mutable.LinkedHashMap[String, Map[String, (Long, Long)]]()
    base.foreach(_._2.foreach { case (f, st) => active(f) = st })
    entries(path, after = base.map(_._1).getOrElse(0L))
      .takeWhile(_._1 <= version).foreach { case (_, json) =>
      jsonList(json, "removes").foreach(active.remove)
      parseFileSet(json).foreach { case (f, st) => active(f) = st }
    }
    active.toSeq
  }

  /** Per-file sketch strings for `vCol` from one adds-aligned log blob. */
  private def parseSketchSet(json: String, vCol: String): Seq[(String, String)] = {
    val adds = jsonList(json, "adds")
    val sk = jsonList(json, s"sketch:$vCol")
    if (adds.nonEmpty && sk.length == adds.length) adds.zip(sk) else Seq.empty
  }

  /** Replay the log's per-file sketches for `vCol` up to `version`:
    * (active file → serialized sample, sketch k). Same checkpoint-then-
    * delta walk as [[activeEntries]]; files added without a sketch are
    * simply absent (the reader decides whether that is fatal).
    */
  private def activeSketches(
      path: String, version: Long, vCol: String): (Map[String, String], Option[Int]) = {
    val base = latestCheckpoint(path, version)
    val active = scala.collection.mutable.LinkedHashMap[String, String]()
    var k: Option[Int] = None
    def absorb(json: String): Unit = {
      jsonList(json, "removes").foreach(active.remove)
      parseSketchSet(json, vCol).foreach { case (f, s) => active(f) = s }
      jsonList(json, s"sketchK:$vCol").headOption.foreach(v => k = Some(v.toInt))
    }
    base.foreach(b => absorb(b._3))
    entries(path, after = base.map(_._1).getOrElse(0L))
      .takeWhile(_._1 <= version).foreach { case (_, json) => absorb(json) }
    (active.toMap, k)
  }

  /** Sketch columns declared anywhere in the visible log span. */
  private def sketchColsOf(path: String, version: Long): Seq[String] = {
    val base = latestCheckpoint(path, version)
    (base.toSeq.flatMap(b => jsonList(b._3, "sketchCols")) ++
      entries(path, after = base.map(_._1).getOrElse(0L))
        .takeWhile(_._1 <= version).flatMap(e => jsonList(e._2, "sketchCols")))
      .distinct
  }

  /** Sketch-suffix JSON for a summarizing entry (checkpoint / branch
    * base): each sketch column rides along when EVERY summarized file
    * carries a sample — the same all-files rule as [[statsJson]], so a
    * summary never silently half-drops the percentile surface.
    */
  private def sketchCarry(
      path: String, version: Long, files: Seq[String]): String = {
    val carried = sketchColsOf(path, version).flatMap { c =>
      val (m, k) = activeSketches(path, version, c)
      if (k.isDefined && files.forall(m.contains))
        Some(c -> (s""","sketch:$c":[${files.map(f => "\"" + m(f) + "\"").mkString(",")}]""" +
          s""","sketchK:$c":[${k.get}]"""))
      else None
    }
    if (carried.isEmpty) ""
    else carried.map(_._2).mkString("") +
      s""","sketchCols":[${carried.map("\"" + _._1 + "\"").mkString(",")}]"""
  }

  /** Write a log CHECKPOINT summarizing the active file set (and, when
    * every active file carries them, the data-skipping stats) as of the
    * current latest version. Readers thereafter replay only entries AFTER
    * the newest checkpoint at or below their requested version — O(delta)
    * log parsing instead of O(table lifetime), which is what keeps a
    * years-old 100 TB table's open cost flat (the Delta/Iceberg
    * checkpoint/snapshot mechanism). Older entries stay in place, so time
    * travel to pre-checkpoint versions still replays the full history.
    * Returns the checkpointed version.
    */
  def checkpoint(path: String): Long = checkpointAt(path, latestVersion(path))

  /** [[checkpoint]] pinned at an arbitrary VISIBLE version — the summary
    * a history expiry writes at its cutoff so every surviving version
    * keeps reading after the older per-commit entries are dropped.
    */
  def checkpointAt(path: String, v: Long): Long = {
    require(v > 0 && v <= latestVersion(path),
      s"version $v is not a visible version to checkpoint")
    val active = activeEntries(path, v)
    val json =
      s"""{"version":$v,"adds":[${active.map("\"" + _._1 + "\"").mkString(",")}]${statsJson(active)}${sketchCarry(path, v, active.map(_._1))}${opsJson(path, v)}${dvsJson(path, v)}}"""
    val tmp = logDir(path).resolve(f".ckpt-tmp-$v%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, ckptFile(path, v), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** EXPIRE SNAPSHOTS — trim table HISTORY to the last `keepLast`
    * versions (the Iceberg `expire_snapshots` / Delta log-retention
    * operation): a checkpoint lands AT the cutoff so every surviving
    * version reads from the summary, data files removed strictly below
    * the cutoff are vacuumed (they are unreachable from any surviving
    * version — and the vacuum must run BEFORE the log trim, which erases
    * the removes records it scans), then per-commit entries and
    * checkpoints below the cutoff are dropped. Time travel below the
    * cutoff is gone BY DESIGN; every version ≥ cutoff replays
    * bit-identically. Metadata-only except the reclaimed bytes.
    * Returns (cutoff, log entries dropped, data files reclaimed).
    */
  def expireSnapshots(path: String, keepLast: Int): (Long, Long, Long) = {
    require(keepLast >= 1, "must keep at least the latest version")
    val latest = latestVersion(path)
    val cutoff = math.max(1L, latest - keepLast + 1)
    if (cutoff <= 1L) return (1L, 0L, 0L)
    checkpointAt(path, cutoff)
    val reclaimed = vacuum(path, cutoff - 1)
    val dir = logDir(path)
    val droppable = {
      val all = Files.list(dir)
      try all.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        (n.endsWith(".json") &&
          n.stripSuffix(".json").forall(_.isDigit) &&
          n.stripSuffix(".json").toLong < cutoff) ||
        (n.startsWith("checkpoint-") && n.endsWith(".ckpt") &&
          n.stripPrefix("checkpoint-").stripSuffix(".ckpt").toLong < cutoff)
      }.toSeq
      finally all.close()
    }
    // count ACTUAL deletions, not candidates: a failed or already-missing
    // delete must not inflate the dropped tally. Expiry assumes the
    // single-writer contract of the whole mutation family (a concurrent
    // commit racing the list-then-delete window could reference an entry
    // this scan decided to drop).
    val dropped = droppable.count(Files.deleteIfExists(_))
    (cutoff, dropped.toLong, reclaimed.toLong)
  }

  /** How many per-commit log entries a read at `version` replays after the
    * best available checkpoint — observability for checkpoint tests and
    * log-health monitoring.
    */
  def replayCount(path: String, version: Long = Long.MaxValue): Int =
    entries(path, after = latestCheckpoint(path, version).map(_._1).getOrElse(0L))
      .count(_._1 <= version)

  private def activeFiles(path: String, version: Long): Seq[String] =
    activeEntries(path, version).map(_._1)

  /** Commit `df` as the next version. `overwrite = true` logically removes
    * every currently-active file (full-snapshot replace); `false` appends.
    * `tag` is an optional application-level idempotency token (e.g. a
    * streaming batchId): if an already-committed entry carries it, the
    * commit is skipped and that entry's version returns — re-delivered
    * batches land exactly once. Returns the committed version.
    */
  /** Per-file bottom-k quantile-sketch spec persisted at commit time:
    * rows hashed by md5(idCol) (the Sketches.h52 formula, so the stored
    * sample IS the one `Sketches.quantileSketch` would draw), the k
    * lowest (h, id) pairs per data file serialized into the log entry.
    * Bottom-k merges exactly (bottom-k of unioned per-file samples ==
    * bottom-k of all rows), so [[sketchQuantiles]] answers percentiles
    * from the LOG ALONE — zero data files opened — and a checkpoint or
    * branch carries the sketches like any other per-file stat. Contract:
    * sketches describe FILE contents; a DV-masked table must rewrite
    * (OPTIMIZE) before trusting them, same as min/max stats.
    */
  final case class SketchSpec(idCol: String, vCol: String, k: Int) {
    require(k >= 2 && k <= 65536, s"unreasonable sketch size $k")
    require(Seq(idCol, vCol).forall(_.matches("[A-Za-z0-9_]+")),
      "sketch columns feed flat JSON keys: identifiers only")
  }

  def commit(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      overwrite: Boolean = false,
      tag: String = "",
      statsCol: String = "",
      statsCols: Seq[String] = Seq.empty,
      sketch: Option[SketchSpec] = None,
      dvMarks: Option[DataFrame] = None): Long = {
    require(!tag.contains("\"") && !tag.contains("\\"), "tag must be JSON-safe")
    require(statsCols.forall(_.matches("[A-Za-z0-9_]+")),
      "statsCols feed flat JSON keys and the regex extractor: identifiers only")
    if (tag.nonEmpty) {
      val already = taggedVersion(path, tag)
      if (already.isDefined) return already.get
    }
    val next = latestVersion(path) + 1
    Files.createDirectories(logDir(path))
    // 1. reserve the version — atomic create fails if a concurrent writer won
    val log = logFile(path, next)
    try Files.createFile(log)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(next)
    }
    // 2. land the data files (invisible until the log entry has content)
    val dataDir = s"$path/data/v$next"
    df.write.mode("overwrite").parquet(dataDir)
    val adds = {
      val d = Paths.get(dataDir)
      val s = Files.list(d)
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally s.close()
    }
    require(adds.forall(p => !p.contains("\"") && !p.contains("\\")),
      "data paths must be JSON-safe")
    val removes = if (overwrite) activeFiles(path, next - 1) else Seq.empty
    // per-file data-skipping stats for the declared long columns: ONE
    // metadata-sized aggregation over the just-written files (all columns
    // in the same pass), logged alongside the adds so pruned reads never
    // open the footers at all. `statsCol` keeps the legacy unnamed slot;
    // `statsCols` adds named per-column arrays for multi-predicate skips.
    val allCols = (Option(statsCol).filter(_.nonEmpty).toSeq ++ statsCols).distinct
    // ONE metadata-sized aggregation over the just-written files covers
    // all per-file accounting: row counts ALWAYS (the Delta numRecords
    // posture — they power metadata-only COUNTs without touching data),
    // min/max for the declared long columns when requested. The scan
    // covers only the commit's own delta, never the table.
    val stats: String =
      if (adds.isEmpty) ""
      else {
        import org.apache.spark.sql.functions.{col, count => scount, lit => slit, max => smax, min => smin}
        val aggs = scount(slit(1)).as("__n") +: allCols.flatMap(c => Seq(
          smin(col(c)).cast("long").as(s"mn_$c"),
          smax(col(c)).cast("long").as(s"mx_$c")))
        val byFile = spark.read.parquet(dataDir)
          .groupBy(col("_metadata.file_path").as("f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map(r => new java.net.URI(r.getString(0)).getPath ->
            ((r.getLong(1), allCols.zipWithIndex.map { case (c, i) =>
              c -> ((r.getLong(2 + 2 * i), r.getLong(3 + 2 * i)))
            }.toMap))).toMap
        // a zero-row part file groups to nothing: it counts 0 rows and
        // carries never-matching (max, min) stats — pruning it is always
        // sound because it has no rows to miss
        val aligned = adds.map(f => byFile.getOrElse(f,
          (0L, allCols.map(c => c -> ((Long.MaxValue, Long.MinValue))).toMap)))
        def arr(c: String, pick: ((Long, Long)) => Long): String =
          aligned.map(m => pick(m._2(c))).mkString(",")
        val legacy =
          if (statsCol.isEmpty) ""
          else s""","statsCol":"$statsCol","mins":[${arr(statsCol, _._1)}],""" +
            s""""maxs":[${arr(statsCol, _._2)}]"""
        val named =
          if (statsCols.isEmpty) ""
          else statsCols.map(c =>
            s""","mins:$c":[${arr(c, _._1)}],"maxs:$c":[${arr(c, _._2)}]""").mkString("") +
            s""","statsCols":[${statsCols.map("\"" + _ + "\"").mkString(",")}]"""
        legacy + named + s""","rows":[${aligned.map(_._1).mkString(",")}]"""
      }
    // per-file bottom-k sketch: one windowed pass over the commit's own
    // delta (k rows per file survive the map side), k·|files| rows
    // collected — metadata-sized by the SketchSpec contract
    val sketchPart: String = sketch match {
      case None => ""
      case Some(spec) if adds.isEmpty => ""
      case Some(spec) =>
        import org.apache.spark.sql.functions.{col, conv, md5, row_number, substring}
        import org.apache.spark.sql.expressions.Window
        val h = conv(substring(md5(col(spec.idCol).cast("string")
          .cast("binary")), 1, 13), 16, 10).cast("long")
        val perFile = spark.read.parquet(dataDir)
          .select(col("_metadata.file_path").as("f"), h.as("h"),
            col(spec.idCol).cast("long").as("id"),
            col(spec.vCol).cast("double").as("v"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("f")).orderBy(col("h"), col("id"))))
          .filter(col("rn") <= spec.k)
          .collect()
          .map(r => new java.net.URI(r.getString(0)).getPath ->
            ((r.getLong(1), r.getLong(2), r.getDouble(3))))
          .groupBy(_._1)
          .map { case (f, rs) => f ->
            rs.map(_._2).sortBy(t => (t._1, t._2))
              .map { case (hh, id, v) => s"$hh:$id:$v" }.mkString(";") }
        // "-" marks an empty (zero-row) file: the quoted-string arrays
        // ride the same escape-free extractor, which drops empty strings
        val arr = adds.map(f => "\"" +
          perFile.getOrElse(f, "-").replace("\"", "") + "\"").mkString(",")
        s""","sketch:${spec.vCol}":[$arr]""" +
          s""","sketchK:${spec.vCol}":[${spec.k}]""" +
          s""","sketchCols":["${spec.vCol}"]"""
    }
    // deletion-vector sidecars landing in the SAME atomic entry as the
    // adds (the upsertKeysDv merge-on-read path): marks and new rows
    // become visible together or not at all — a two-commit upsert would
    // expose a deleted-but-not-reinserted intermediate state to a crash
    val dvAdds: Seq[String] = dvMarks match {
      case Some(m) if !m.isEmpty =>
        val dvDir = s"$path/dv/v$next"
        m.coalesce(1).write.mode("overwrite").parquet(dvDir)
        val d = Paths.get(dvDir)
        val s = Files.list(d)
        try s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toSeq.sorted
        finally s.close()
      case _ => Seq.empty
    }
    require(dvAdds.forall(p => !p.contains("\"") && !p.contains("\\")),
      "dv paths must be JSON-safe")
    val dvPart =
      if (dvAdds.isEmpty) ""
      else s""","dvs":[${dvAdds.map("\"" + _ + "\"").mkString(",")}]"""
    // 3. publish: write content to a tmp file, atomically swap onto the
    //    reservation
    val json =
      s"""{"version":$next,"tag":"$tag",""" +
        s""""adds":[${adds.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""removes":[${removes.map("\"" + _ + "\"").mkString(",")}]$stats$sketchPart$dvPart}"""
    val tmp = logDir(path).resolve(f".tmp-$next%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Commit with CHECK constraints (the Delta `ALTER TABLE ADD CONSTRAINT`
    * posture): every named predicate must hold — TRUE, not false or null —
    * on every incoming row, or the whole commit is rejected BEFORE any
    * version is reserved or byte written, with per-constraint violation
    * counts in the error. One aggregated validation pass over the
    * materialized input (no per-constraint jobs), and what was validated
    * is byte-for-byte what commits.
    */
  def commitChecked(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      checks: Seq[(String, org.apache.spark.sql.Column)],
      overwrite: Boolean = false,
      tag: String = "",
      statsCol: String = ""): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit, not, sum, when}
    require(checks.nonEmpty, "commitChecked needs at least one constraint")
    val u = df.localCheckpoint(true)
    val aggs = checks.map { case (name, c) =>
      sum(when(not(coalesce(c, lit(false))), 1L).otherwise(0L)).as(name)
    }
    val row = u.agg(aggs.head, aggs.tail: _*).head()
    val bad = checks.map(_._1).zipWithIndex
      .map { case (n, i) => n -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
      .filter(_._2 > 0)
    require(bad.isEmpty, "constraint violations: " +
      bad.map { case (n, c) => s"$n=$c" }.mkString(", "))
    commit(spark, path, u, overwrite, tag, statsCol)
  }

  /** The committed version carrying `tag`, if any. */
  def taggedVersion(path: String, tag: String): Option[Long] =
    entries(path).collectFirst {
      case (v, json) if json.contains(s""""tag":"$tag"""") => v
    }

  /** Row-level DELETE with affected-file-only rewrite — the erasure
    * (right-to-be-forgotten) path. Only the files that actually CONTAIN
    * matching rows are rewritten (located via `_metadata.file_path`, so
    * parquet footer stats prune the probe); untouched files stay active
    * in the log and are not read or copied. The swap commits atomically:
    * adds the rewritten survivors, removes the affected originals.
    * Returns the committed version, or the current latest when nothing
    * matched.
    */
  def deleteWhere(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val snap = snapshotWithPos(spark, path)
    val affected = snap
      .filter(predicate)
      .select(col("__dv_file").as("f"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    if (affected.isEmpty) return latestVersion(path)
    // __dv_file carries the scan's file: URI; the log stores plain paths
    val plain = affected.map(p => new java.net.URI(p).getPath)
    // DELETE semantics under three-valued logic: only rows where the
    // predicate is TRUE are deleted. A bare `!predicate` would drop rows
    // where the predicate evaluates to NULL (e.g. a null column in the
    // condition) — silent data loss in the erasure path — so survivors
    // keep everything not-definitely-matching. Survivors come from the
    // DV-APPLIED positional view, not a raw file re-read: rewriting an
    // affected file from raw bytes would resurrect rows an earlier
    // deletion vector already masked.
    val survivors = snap
      .filter(col("__dv_file").isin(affected: _*))
      .filter(!coalesce(predicate, lit(false)))
      .drop("__dv_file", "__dv_pos")
      .localCheckpoint(true) // materialize before the swap commit
    swapCommit(spark, path, survivors, plain)
  }

  /** Row-level UPDATE with affected-file-only rewrite: rows where
    * `predicate` is TRUE get `assignments` applied (cast back to each
    * column's existing type, so the table schema never drifts); rows
    * where it is false OR NULL ride through the rewrite untouched —
    * the same three-valued-logic discipline as [[deleteWhere]]. Files
    * with no matching rows are never read or copied.
    */
  def updateWhere(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    val snap = snapshotWithPos(spark, path)
    require(assignments.nonEmpty, "UPDATE needs at least one assignment")
    assignments.keys.foreach(c => require(snap.columns.contains(c),
      s"assignment to unknown column $c"))
    val affected = snap
      .filter(predicate)
      .select(col("__dv_file").as("f"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    if (affected.isEmpty) return latestVersion(path)
    val plain = affected.map(p => new java.net.URI(p).getPath)
    val hit = coalesce(predicate, lit(false))
    // rewrite from the DV-applied view (see deleteWhere) — raw re-reads
    // would resurrect vector-masked rows
    val rows = snap.filter(col("__dv_file").isin(affected: _*))
    val rewritten = rows.select(rows.schema.fields.collect {
      case f if f.name != "__dv_file" && f.name != "__dv_pos" =>
        assignments.get(f.name) match {
          case Some(a) =>
            when(hit, a.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
    }.toSeq: _*).localCheckpoint(true)
    swapCommit(spark, path, rewritten, plain)
  }

  /** MERGE by key: rows of `updates` whose key exists in the table
    * REPLACE the existing row; unmatched keys INSERT. Only the files that
    * contain a matched key are rewritten — key membership is decided
    * against those files alone (any table key matching `updates` must
    * live in an affected file by construction), so no full-table scan
    * happens beyond the pruned membership probe. Null update keys insert
    * (a null key matches nothing). Keys must be unique within `updates`.
    */
  def mergeByKey(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keyCol: String): Long = {
    import org.apache.spark.sql.functions.col
    val snap = snapshotWithPos(spark, path)
    val dataCols = snap.columns.toSeq.filterNot(Set("__dv_file", "__dv_pos"))
    require(updates.columns.toSeq.sorted == dataCols.sorted,
      "updates must carry exactly the table's columns")
    val u = updates.localCheckpoint(true)
    // null keys match nothing and insert (doc contract above): uniqueness
    // therefore applies to non-null keys only
    require(u.filter(col(keyCol).isNotNull).groupBy(col(keyCol)).count()
      .filter(col("count") > 1).isEmpty, "duplicate keys in updates")
    val affected = snap
      .select(col(keyCol), col("__dv_file").as("f"))
      .join(u.select(col(keyCol)), Seq(keyCol), "left_semi")
      .select(col("f"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    val plain = affected.map(p => new java.net.URI(p).getPath)
    val sel = dataCols.map(col)
    val replacement =
      if (plain.isEmpty) u.select(sel: _*)
      else {
        // DV-applied view of the affected files (see deleteWhere)
        val affectedRows = snap.filter(col("__dv_file").isin(affected: _*))
          .select(sel: _*)
        val tableKeys = affectedRows.select(col(keyCol)).distinct()
        affectedRows.join(u.select(col(keyCol)), Seq(keyCol), "left_anti")
          .select(sel: _*)
          .unionByName(u.join(tableKeys, Seq(keyCol), "left_semi")
            .select(sel: _*))
          .unionByName(u.join(tableKeys, Seq(keyCol), "left_anti")
            .select(sel: _*))
      }
    swapCommit(spark, path, replacement.localCheckpoint(true), plain)
  }

  /** MERGE with SCHEMA EVOLUTION (Delta's `mergeSchema` posture): source
    * columns the table lacks are added as schema ops first — existing rows
    * read them as NULL, time travel to pre-evolution versions still sees
    * the old shape — then the standard [[mergeByKey]] runs. The source
    * must carry every existing table column; EXTRA columns evolve the
    * table instead of failing the merge.
    */
  def mergeByKeyEvolve(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keyCol: String): Long = {
    val existing = readSnapshot(spark, path).columns.toSet
    updates.schema.fields
      .filterNot(f => existing.contains(f.name))
      .foreach(f => addColumn(path, f.name, f.dataType.sql))
    mergeByKey(spark, path, updates, keyCol)
  }

  /** MERGE by key with a RECENCY condition — `WHEN MATCHED AND update is
    * newer THEN UPDATE` (newer = greater `orderCols` tuple; equal tuples
    * let the update win, so re-delivering the same row is idempotent).
    * This makes the upsert COMMUTATIVE across batches: out-of-order or
    * re-delivered CDC batches converge to the same final state regardless
    * of arrival order, which plain last-write-wins [[mergeByKey]] cannot
    * guarantee. Same affected-file-only cost shape: files without
    * matching keys are never read or copied. The table must be
    * key-unique (the [[mergeByKey]] family's standing contract).
    */
  def mergeByKeyNewest(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keyCol: String,
      orderCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.{col, lit, row_number}
    require(orderCols.nonEmpty, "need at least one recency column")
    val snap = snapshotWithPos(spark, path)
    val dataCols = snap.columns.toSeq.filterNot(Set("__dv_file", "__dv_pos"))
    require(updates.columns.toSeq.sorted == dataCols.sorted,
      "updates must carry exactly the table's columns")
    val u = updates.localCheckpoint(true)
    // null keys match nothing and always insert (the family contract), so
    // uniqueness applies to NON-NULL keys only — grouping nulls would
    // reject two legitimate null-key inserts as "duplicates"
    require(u.filter(col(keyCol).isNotNull).groupBy(col(keyCol)).count()
      .filter(col("count") > 1).isEmpty, "duplicate keys in updates")
    val affected = snap
      .select(col(keyCol), col("__dv_file").as("f"))
      .join(u.select(col(keyCol)), Seq(keyCol), "left_semi")
      .select(col("f"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    val plain = affected.map(p => new java.net.URI(p).getPath)
    val sel = dataCols.map(col)
    val replacement =
      if (plain.isEmpty) u.select(sel: _*)
      else {
        // DV-applied view of the affected files (see deleteWhere)
        val candidates = snap.filter(col("__dv_file").isin(affected: _*))
          .select(sel: _*)
          .withColumn("__side", lit(0))
          .unionByName(u.select(sel: _*).withColumn("__side", lit(1)))
        // the recency argmax applies ONLY to non-null keys: a window
        // partitioned on the raw key would pool every null-key row (table
        // rows sharing an affected file + null-key inserts) into one
        // group and silently keep a single row — data loss
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
          .orderBy(orderCols.map(c => col(c).desc) :+ col("__side").desc: _*)
        val keyed = candidates.filter(col(keyCol).isNotNull)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(sel: _*)
        keyed.unionByName(
          candidates.filter(col(keyCol).isNull).select(sel: _*))
      }
    swapCommit(spark, path, replacement.localCheckpoint(true), plain)
  }

  /** Full CDC MERGE — the three-clause apply (Delta/Iceberg MERGE surface)
    * in one batch: `WHEN MATCHED AND <delete flag> THEN DELETE`,
    * `WHEN MATCHED THEN UPDATE SET *`, `WHEN NOT MATCHED AND NOT <delete
    * flag> THEN INSERT *`. `updates` carries the table's columns plus the
    * boolean `deleteCol`; only a TRUE flag deletes (three-valued logic — a
    * NULL flag upserts, the [[deleteWhere]] discipline), and a delete for
    * an absent key is a proper no-op. Same affected-file-only cost shape
    * as [[mergeByKey]]: files containing no key from the batch are never
    * read or copied, and survivors come from the DV-applied positional
    * view, so a vector-masked row can never be resurrected by the rewrite.
    */
  def mergeCdc(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keyCol: String,
      deleteCol: String): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val snap = snapshotWithPos(spark, path)
    val dataCols = snap.columns.toSeq.filterNot(Set("__dv_file", "__dv_pos"))
    require(updates.columns.contains(deleteCol),
      s"updates must carry the delete-flag column $deleteCol")
    require(updates.columns.toSeq.filterNot(_ == deleteCol).sorted ==
      dataCols.sorted,
      "updates must carry exactly the table's columns plus the delete flag")
    val u = updates
      .withColumn(deleteCol,
        coalesce(col(deleteCol).cast("boolean"), lit(false)))
      .localCheckpoint(true)
    // the mergeByKey family contract: null keys match nothing (insert if
    // not delete-flagged), so uniqueness applies to non-null keys only
    require(u.filter(col(keyCol).isNotNull).groupBy(col(keyCol)).count()
      .filter(col("count") > 1).isEmpty, "duplicate keys in updates")
    val affected = snap
      .select(col(keyCol), col("__dv_file").as("f"))
      .join(u.select(col(keyCol)), Seq(keyCol), "left_semi")
      .select(col("f"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    val plain = affected.map(p => new java.net.URI(p).getPath)
    val sel = dataCols.map(col)
    val inserts = u.filter(!col(deleteCol))
    val replacement =
      if (plain.isEmpty) inserts.select(sel: _*)
      else {
        // DV-applied view of the affected files (see deleteWhere)
        val affectedRows = snap.filter(col("__dv_file").isin(affected: _*))
          .select(sel: _*)
        val tableKeys = affectedRows.select(col(keyCol)).distinct()
        // untouched rows ride through; matched non-delete rows replace;
        // matched DELETE rows vanish (the anti-join drops the table row
        // and the `inserts` filter keeps the source row out); unmatched
        // non-delete rows (incl. null keys) insert
        affectedRows.join(u.select(col(keyCol)), Seq(keyCol), "left_anti")
          .select(sel: _*)
          .unionByName(inserts.join(tableKeys, Seq(keyCol), "left_semi")
            .select(sel: _*))
          .unionByName(inserts.join(tableKeys, Seq(keyCol), "left_anti")
            .select(sel: _*))
      }
    swapCommit(spark, path, replacement.localCheckpoint(true), plain)
  }

  /** Metadata-only RETENTION DELETE (the `ALTER TABLE DROP PARTITION` /
    * TTL-expiry posture): logically remove every active file whose LOGGED
    * max for `statsCol` is strictly below `cutoff` — one log entry, zero
    * data files opened, O(active files) log work. At 100 TB this is the
    * difference between expiring a year of history in milliseconds and
    * rewriting it: [[deleteWhere]] is for predicates that cut through
    * files; expiry cuts along them.
    *
    * Correct ONLY for partition-aligned writes (no file straddles the
    * cutoff), and that is ENFORCED, not assumed: a file with
    * min < cutoff ≤ max is an error (partial expiry would need a
    * rewrite — use [[deleteWhere]]), and a file missing `statsCol` stats
    * is rejected because its expiry can't be proven from the log. Time
    * travel below the drop still reads the expired files; [[vacuum]]
    * below the horizon reclaims the bytes — the standard logical/physical
    * split. Returns the new version (or the current one if nothing
    * expired).
    */
  def dropWhereExpired(path: String, statsCol: String, cutoff: Long): Long = {
    require(statsCol.nonEmpty, "retention needs a stats column")
    val cur = latestVersion(path)
    val active = activeEntries(path, cur)
    val withStats = active.map { case (f, st) => (f, st.get(statsCol)) }
    val missing = withStats.collect { case (f, None) => f }
    require(missing.isEmpty,
      s"files lack $statsCol stats — expiry unprovable from the log: " +
        missing.mkString(", "))
    val straddle = withStats.collect {
      case (f, Some((mn, mx))) if mn < cutoff && mx >= cutoff => f
    }
    require(straddle.isEmpty,
      "files straddle the cutoff (writes not partition-aligned; use " +
        s"deleteWhere for a rewriting delete): ${straddle.mkString(", ")}")
    val removes = withStats.collect {
      case (f, Some((_, mx))) if mx < cutoff => f
    }.sorted
    if (removes.isEmpty) return cur
    val next = cur + 1
    Files.createDirectories(logDir(path))
    val log = logFile(path, next)
    try Files.createFile(log)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(next)
    }
    val json =
      s"""{"version":$next,"tag":"","adds":[],""" +
        s""""removes":[${removes.map("\"" + _ + "\"").mkString(",")}]}"""
    val tmp = logDir(path).resolve(f".tmp-$next%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Zero-copy branch: the branch is a full TxLake table of its own,
    * rooted at `<path>/_branches/<name>`, whose base log entry ADDS the
    * parent's active files at `fromVersion` without copying a byte. Every
    * existing operation — [[commit]], [[readSnapshot]], [[deleteWhere]],
    * [[updateWhere]], [[mergeByKey]], time travel — works on the returned
    * branch path unchanged, because the log already stores absolute file
    * paths. Parent commits after the fork never affect the branch, and
    * branch commits never touch the parent log — the git-branch
    * experiment-isolation model for table data.
    *
    * Caveat (documented, not enforced): [[vacuum]] on the PARENT can
    * reclaim pre-fork files a branch still references — vacuum only below
    * the oldest branch point, or drop branches first.
    */
  def branch(path: String, name: String, fromVersion: Long = Long.MaxValue): String = {
    require(name.matches("[A-Za-z0-9_-]+"), s"unsafe branch name: $name")
    val bp = s"$path/_branches/$name"
    require(!Files.exists(logDir(bp)), s"branch $name already exists")
    val active = activeEntries(path, fromVersion)
    Files.createDirectories(logDir(bp))
    // carry the parent's per-file skipping stats (legacy and named
    // columns) into the base entry — a stats-blind base would silently
    // disable log-based pruning on the branch
    val json =
      s"""{"version":1,"tag":"",""" +
        s""""adds":[${active.map("\"" + _._1 + "\"").mkString(",")}],""" +
        s""""removes":[]${statsJson(active)}${sketchCarry(path, fromVersion, active.map(_._1))}${opsJson(path, fromVersion)}${dvsJson(path, fromVersion)}}"""
    val tmp = logDir(bp).resolve(".tmp-base")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, logFile(bp, 1L), StandardCopyOption.ATOMIC_MOVE)
    bp
  }

  /** SHALLOW CLONE: materialize an independent table at `clonePath` whose
    * base version references the source's active files by absolute path —
    * zero bytes of data copied, one log write (the Delta `CREATE TABLE ...
    * SHALLOW CLONE` semantics). Unlike [[branch]] (which lives under the
    * parent and exists to be published back), a clone is a peer table:
    * it evolves independently — appends, deletes, merges land in the
    * clone's own log and data dirs and are never visible to the source,
    * and source commits after the clone point are never visible to the
    * clone. Per-file skipping stats, row counts, schema ops and deletion
    * vectors carry over so the clone prunes and masks exactly like the
    * source did at the clone point. Cloning a 100 TB table costs one
    * metadata write.
    */
  def cloneTable(
      path: String, clonePath: String,
      fromVersion: Long = Long.MaxValue): String = {
    require(!Files.exists(logDir(clonePath)),
      s"clone target already has a log: $clonePath")
    val active = activeEntries(path, fromVersion)
    Files.createDirectories(logDir(clonePath))
    val json =
      s"""{"version":1,"tag":"",""" +
        s""""adds":[${active.map("\"" + _._1 + "\"").mkString(",")}],""" +
        s""""removes":[]${statsJson(active)}${sketchCarry(path, fromVersion, active.map(_._1))}${opsJson(path, fromVersion)}${dvsJson(path, fromVersion)}}"""
    val tmp = logDir(clonePath).resolve(".tmp-base")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, logFile(clonePath, 1L), StandardCopyOption.ATOMIC_MOVE)
    clonePath
  }

  /** Predicate-scoped atomic overwrite — Delta's `replaceWhere`: in ONE
    * commit, delete every row where `predicate` is TRUE and insert
    * `batch`, whose rows must ALL satisfy the predicate (checked before
    * anything lands; the guard is what makes "rebuild this partition"
    * safe — a stray out-of-scope row would silently corrupt a
    * neighboring partition). The idiom for day/partition backfills:
    * recompute one day, replace exactly that day, leave every other file
    * untouched.
    *
    * Only files containing matching rows are rewritten (survivor rows
    * ride along, read from the DV-applied view like [[deleteWhere]]);
    * removes + adds publish as one atomic log entry, so readers see
    * either the old day or the new day, never a mix.
    */
  def replaceWhere(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      batch: DataFrame): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val outOfScope = batch.filter(!coalesce(predicate, lit(false))).count()
    require(outOfScope == 0L,
      s"replaceWhere: $outOfScope batch rows do not satisfy the predicate")
    val snap = snapshotWithPos(spark, path)
    val affected = snap
      .filter(predicate)
      .select(col("__dv_file").as("f"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    val plain = affected.map(p => new java.net.URI(p).getPath)
    val dataCols = snap.columns.filterNot(_.startsWith("__dv_")).toSeq
    val survivors = snap
      .filter(col("__dv_file").isin(affected: _*))
      .filter(!coalesce(predicate, lit(false)))
      .select(dataCols.map(col): _*)
      .localCheckpoint(true)
    swapCommit(spark, path,
      survivors.unionByName(batch.select(dataCols.map(col): _*)), plain)
  }

  /** PUBLISH a branch's staged appends into the parent — the
    * Write–Audit–Publish cadence: stage commits on a zero-copy [[branch]],
    * audit the staged snapshot there (reads, quality rules,
    * [[commitChecked]]-style constraints), then make the audited files
    * visible in the parent as ONE atomic log commit that moves no data
    * (the log stores absolute paths). Strictly optimistic and strictly
    * append-only:
    *  - the parent must not have advanced since the fork (its active set
    *    must still equal the branch's base entry) — otherwise re-branch
    *    and re-stage;
    *  - the branch must not have rewritten/removed inherited files nor
    *    staged schema ops or deletion vectors — shared-state mutations
    *    route through the merge family, not a publish.
    * Per-file skipping stats and row counts staged on the branch ride
    * into the parent entry unchanged. Returns the parent's new version;
    * the branch stays a valid table (publishing only reads its log).
    */
  def publishBranch(
      path: String, name: String, tag: String = ""): Long = {
    require(!tag.contains("\"") && !tag.contains("\\"), "tag must be JSON-safe")
    val bp = s"$path/_branches/$name"
    require(Files.exists(logFile(bp, 1L)), s"no branch $name at $path")
    val baseFiles = jsonList(
      new String(Files.readAllBytes(logFile(bp, 1L)), "UTF-8"), "adds").toSet
    val parentActive = activeEntries(path, Long.MaxValue)
    require(parentActive.map(_._1).toSet == baseFiles,
      "parent advanced since fork: re-branch and re-stage (optimistic WAP)")
    val branchActive = activeEntries(bp, Long.MaxValue)
    require(baseFiles.subsetOf(branchActive.map(_._1).toSet),
      "branch rewrote or removed inherited files: publish is append-only")
    require(dvsJson(bp, Long.MaxValue) == dvsJson(path, Long.MaxValue),
      "branch staged deletion vectors: publish is append-only")
    require(opsJson(bp, Long.MaxValue) == opsJson(path, Long.MaxValue),
      "branch evolved schema: publish is append-only")
    val fresh = branchActive.filterNot(e => baseFiles.contains(e._1))
    val next = latestVersion(path) + 1
    Files.createDirectories(logDir(path))
    val log = logFile(path, next)
    try Files.createFile(log)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(next)
    }
    val json =
      s"""{"version":$next,"tag":"$tag",""" +
        s""""adds":[${fresh.map("\"" + _._1 + "\"").mkString(",")}],""" +
        s""""removes":[]${statsJson(fresh)}}"""
    val tmp = logDir(path).resolve(f".tmp-$next%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Reserve the next version, land `replacement` as its data files, and
    * publish a log entry that adds them and removes `removes` — the
    * shared tail of every rewriting operation (DELETE / UPDATE / MERGE).
    */
  private def swapCommit(
      spark: SparkSession,
      path: String,
      replacement: DataFrame,
      removes: Seq[String]): Long = {
    val next = latestVersion(path) + 1
    val log = logFile(path, next)
    try Files.createFile(log)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(next)
    }
    val dataDir = s"$path/data/v$next"
    replacement.write.mode("overwrite").parquet(dataDir)
    val adds = {
      val d = Paths.get(dataDir)
      val s = Files.list(d)
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally s.close()
    }
    require(adds.forall(p => !p.contains("\"") && !p.contains("\\")),
      "data paths must be JSON-safe")
    // row accounting for the rewritten files (see commit): one
    // metadata-sized count over the swap's own delta
    val rows: String =
      if (adds.isEmpty) ""
      else {
        import org.apache.spark.sql.functions.{col, count => scount, lit => slit}
        val byFile = spark.read.parquet(dataDir)
          .groupBy(col("_metadata.file_path").as("f"))
          .agg(scount(slit(1)).as("n")).collect()
          .map(r => new java.net.URI(r.getString(0)).getPath -> r.getLong(1))
          .toMap
        s""","rows":[${adds.map(f => byFile.getOrElse(f, 0L)).mkString(",")}]"""
      }
    val json =
      s"""{"version":$next,"tag":"",""" +
        s""""adds":[${adds.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""removes":[${removes.map("\"" + _ + "\"").mkString(",")}]$rows}"""
    val tmp = logDir(path).resolve(f".tmp-$next%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** RESTORE the table to its state at `toVersion` as a NEW atomic commit
    * (the Delta `RESTORE TABLE ... TO VERSION AS OF` rollback): the next
    * log entry re-ADDS the files that were active then but aren't now and
    * REMOVES the ones that are now active but weren't then — zero bytes of
    * data move, so restoring a 100 TB table costs one log write. History
    * stays intact: time travel to any version, including the rolled-back
    * span, still works, and the restore itself is just another version
    * (re-restorable, vacuum-protected like any active set). Re-added
    * files carry their original skipping stats and row counts forward.
    *
    * Guards (require, not silent wrong answers): deletion vectors and
    * schema ops are table-global accumulations in this log format, so a
    * restore across a DV or schema-op commit would replay the NEWER masks
    * and ops against the OLDER file set — run OPTIMIZE (materializing
    * vectors) or restore to a point at/after those commits instead.
    * Restoring to the current state is a no-op and commits nothing.
    */
  def restore(path: String, toVersion: Long): Long = {
    val cur = latestVersion(path)
    require(toVersion <= cur, s"cannot restore to unwritten version $toVersion")
    val target = activeEntries(path, toVersion)
    require(target.nonEmpty, s"no committed data at or before version $toVersion")
    require(dvFiles(path, cur) == dvFiles(path, toVersion),
      "deletion vectors changed since the restore point — OPTIMIZE to " +
        "materialize them, or restore to a later version")
    require(schemaOps(path, cur) == schemaOps(path, toVersion),
      "schema evolved since the restore point — restore to a later version")
    val curActive = activeFiles(path, cur).toSet
    val targetSet = target.map(_._1).toSet
    val readds = target.filterNot(t => curActive.contains(t._1))
    val removes = (curActive -- targetSet).toSeq.sorted
    if (readds.isEmpty && removes.isEmpty) return cur
    val next = cur + 1
    Files.createDirectories(logDir(path))
    val log = logFile(path, next)
    try Files.createFile(log)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(next)
    }
    val json =
      s"""{"version":$next,"tag":"",""" +
        s""""adds":[${readds.map("\"" + _._1 + "\"").mkString(",")}],""" +
        s""""removes":[${removes.map("\"" + _ + "\"").mkString(",")}]${statsJson(readds)}}"""
    val tmp = logDir(path).resolve(f".tmp-$next%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Per-active-file logged row counts at `version`: None for a file whose
    * committing entry predates row accounting. Pure log parsing — no data
    * file (or footer) is ever opened.
    */
  def fileRowCounts(
      path: String,
      version: Long = Long.MaxValue): Seq[(String, Option[Long])] =
    activeEntries(path, version).map { case (f, st) =>
      f -> st.get("#rows").map(_._1)
    }

  /** Metadata-only COUNT(*) at `version`: the sum of the log's per-file
    * row counts minus deletion-vector-masked rows. The log parse opens no
    * data file; when DVs are present their O(matches)-sized sidecars are
    * the only bytes read. None when any active file predates row
    * accounting (an OPTIMIZE rewrite backfills — its swap commit counts).
    *
    * This is the 100 TB answer to `SELECT COUNT(*)`: O(#files) log
    * arithmetic instead of a table scan, the same contract Delta's
    * metadata-only query path provides.
    */
  def countRows(
      spark: SparkSession,
      path: String,
      version: Long = Long.MaxValue): Option[Long] = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val perFile = fileRowCounts(path, version)
    if (perFile.isEmpty || perFile.exists(_._2.isEmpty)) return None
    val total = perFile.map(_._2.get).sum
    val dvs = dvFiles(path, version)
    val masked =
      if (dvs.isEmpty) 0L
      else {
        // DV sidecars store the scan's file: URI; normalize to the log's
        // plain-path form and count only positions in still-active files
        // (stale vectors for rewritten files are inert, as in the
        // snapshot's anti-join). Masks are distinct by construction —
        // deleteWhereDv marks from the already-DV-applied view — but
        // distinct() keeps the count safe regardless.
        val active = spark.createDataFrame(
          perFile.map(f => Tuple1(f._1))).toDF("p")
        spark.read.parquet(dvs: _*)
          .select(regexp_replace(col("file"), "^file:/+", "/").as("p"),
            col("pos")).distinct()
          .join(active, Seq("p"), "left_semi")
          .count()
      }
    Some(total - masked)
  }

  /** METADATA-ONLY percentile read from the log's per-file sketches
    * ([[SketchSpec]]): union the stored per-file bottom-k samples,
    * re-take the global bottom-k (exact — the mergeability property),
    * estimate at rank ⌈q·k'⌉ against the logged row counts. NO data file
    * is opened: the percentile dashboard over a 100 TB table costs one
    * log read + a k·|files|-row local job, the same posture as
    * [[countRows]]'s metadata COUNT. Refuses DV-masked tables loudly
    * (sketches describe file contents; OPTIMIZE first), and refuses any
    * active file lacking a sketch rather than under-reporting silently.
    * Output schema matches `Sketches.quantileEstimate`:
    * (quantile, est, sample_k, n_total).
    */
  def sketchQuantiles(
      spark: SparkSession,
      path: String,
      vCol: String,
      qs: Seq[Double],
      version: Long = Long.MaxValue): DataFrame = {
    require(dvFiles(path, version).isEmpty,
      "sketchQuantiles: table carries deletion vectors; sketches describe " +
        "file contents — OPTIMIZE (rewrite) before metadata-only reads")
    val files = activeEntries(path, version)
    require(files.nonEmpty, "sketchQuantiles: empty table")
    require(files.forall(_._2.contains("#rows")),
      "sketchQuantiles needs logged per-file row counts on every file")
    val nTotal = files.map(_._2("#rows")._1).sum
    val (skMap, kOpt) = activeSketches(path, version, vCol)
    require(kOpt.isDefined, s"no sketch column '$vCol' in the log")
    files.map(_._1).foreach(f => require(skMap.contains(f),
      s"active file without a '$vCol' sketch: $f — recommit it with the " +
        "SketchSpec (partial sketches would under-report percentiles)"))
    val triples = files.map(_._1).flatMap { f =>
      val s = skMap(f)
      if (s == "-") Seq.empty
      else s.split(";").toSeq.map { t =>
        val p = t.split(":")
        (p(0).toLong, p(1).toLong, p(2).toDouble)
      }
    }
    import spark.implicits._
    val merged = graft.operators.Sketches.bottomKSmall(
      triples.toDF("h", "id", "v"), kOpt.get)
    graft.operators.Sketches.quantileEstimate(
      merged, Seq(Tuple1(nTotal)).toDF("n_total"), qs)
  }

  /** Per-commit (version, tag, rows-added) from the log — the commit-level
    * row accounting view. Entries summarized away by a checkpoint are not
    * visible; metadata-only commits report 0.
    */
  def commitAddCounts(path: String): Seq[(Long, String, Long)] =
    entries(path).map { case (v, json) =>
      val tag = """"tag":"([^"]*)"""".r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse("")
      (v, tag, jsonList(json, "rows").map(_.toLong).sum)
    }

  /** Snapshot read at `version` (default latest). */
  def readSnapshot(
      spark: SparkSession,
      path: String,
      version: Long = Long.MaxValue): DataFrame =
    snapshotWithPos(spark, path, version).drop("__dv_file", "__dv_pos")

  /** The snapshot with per-row physical position columns (`__dv_file`,
    * `__dv_pos`) still attached — the deletion-vector machinery's working
    * form. `_metadata` is projected AT THE SCAN (it does not survive
    * joins), active deletion vectors are anti-joined out, then schema ops
    * replay.
    */
  private def snapshotWithPos(
      spark: SparkSession,
      path: String,
      version: Long = Long.MaxValue): DataFrame = {
    val files = activeFiles(path, version)
    require(files.nonEmpty, s"no committed data at or before version $version")
    maskedRead(spark, path, version, files)
  }

  /** DV-masked, schema-evolved read of a SUBSET of a snapshot's files —
    * the shared tail of [[snapshotWithPos]] and the key-index lookup.
    * Keeps `__dv_file` / `__dv_pos` attached.
    */
  private def maskedRead(
      spark: SparkSession,
      path: String,
      version: Long,
      files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val ops = schemaOps(path, version)
    val raw0 =
      if (ops.isEmpty) spark.read.parquet(files: _*)
      else spark.read.option("mergeSchema", "true").parquet(files: _*)
    val withPos = raw0.select(col("*"),
      expr("_metadata.file_path").as("__dv_file"),
      expr("_metadata.row_index").as("__dv_pos"))
    val dvs = dvFiles(path, version)
    val masked =
      if (dvs.isEmpty) withPos
      else withPos.join(
        spark.read.parquet(dvs: _*)
          .select(col("file").as("__dv_file"), col("pos").as("__dv_pos")),
        Seq("__dv_file", "__dv_pos"), "left_anti")
    applySchemaOps(masked, ops)
  }

  /** Build a SECONDARY KEY INDEX over the current snapshot: a standing
    * `(key, file)` table, hash-bucketed into `kb=` partitions. This is
    * the point-lookup complement to range-based data skipping
    * ([[readPruned]]): on a hash-scattered table every file's [min, max]
    * spans the whole key range and min/max stats prune NOTHING — but an
    * inverted key→file map still answers "which files can hold key k"
    * exactly. Build cost is one corpus scan + one shuffle (the index is
    * O(distinct keys), bucketed so a probe reads only its buckets);
    * lookups then open only the files that actually contain probed keys.
    *
    * The index is pinned to the table version it was built at: lookups
    * `require` the table hasn't moved (a production system would rebuild
    * incrementally per commit — the delta shape, not re-scan).
    */
  def buildKeyIndex(
      spark: SparkSession,
      path: String,
      keyCol: String,
      indexPath: String,
      buckets: Int = 64): Long = {
    import org.apache.spark.sql.functions.{col, expr, hash, lit, pmod}
    val v = latestVersion(path)
    val files = activeFiles(path, v)
    require(files.nonEmpty, "nothing to index")
    spark.read.parquet(files: _*)
      .select(col(keyCol).as("key"), expr("_metadata.file_path").as("f"))
      .distinct()
      .withColumn("kb", pmod(hash(col("key")), lit(buckets)))
      .write.mode("overwrite").partitionBy("kb")
      .parquet(s"$indexPath/keys")
    Files.writeString(Paths.get(s"$indexPath/VERSION"), s"$v $buckets")
    v
  }

  /** The data files that can contain any of the probed keys, per the
    * index (plain paths, sorted) — exposed for skip-ratio assertions.
    * Probe-side bucket ids are collected (point lookups are small by
    * contract) and pushed as a partition filter, so only the probed
    * `kb=` directories of the index itself are read.
    */
  def filesForKeys(
      spark: SparkSession,
      path: String,
      indexPath: String,
      keys: DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions.{broadcast, col, hash, lit, pmod}
    val meta = Files.readString(Paths.get(s"$indexPath/VERSION")).trim.split(" ")
    val v = meta(0).toLong
    val buckets = meta(1).toInt
    require(v == latestVersion(path),
      s"key index is stale (indexed v$v, table at v${latestVersion(path)}) — rebuild")
    val probe = keys.select(col(keys.columns.head).as("key")).distinct()
      .withColumn("kb", pmod(hash(col("key")), lit(buckets)))
      .localCheckpoint(true)
    val kbs = probe.select(col("kb")).distinct().collect().map(_.getInt(0))
    spark.read.parquet(s"$indexPath/keys")
      .filter(col("kb").isin(kbs.map(x => x: Any): _*))
      .join(broadcast(probe), Seq("kb", "key"), "left_semi")
      .select(col("f")).distinct().collect().map(_.getString(0))
      .toSeq.sorted.map(p => new java.net.URI(p).getPath)
  }

  /** Point-lookup read through the key index: only the files the index
    * maps the probed keys to are opened (DV-masked and schema-evolved
    * like any snapshot read). Callers apply their exact key filter on
    * top — the index bounds which files can match, like every skipping
    * layer here.
    */
  def readByKeys(
      spark: SparkSession,
      path: String,
      indexPath: String,
      keys: DataFrame): DataFrame = {
    val fs = filesForKeys(spark, path, indexPath, keys)
    require(fs.nonEmpty, "no file contains any probed key")
    maskedRead(spark, path, latestVersion(path), fs)
      .drop("__dv_file", "__dv_pos")
  }

  /** Build a per-file BLOOM FILTER index over the current snapshot: for
    * each active data file, a `bits`-wide bloom of its `keyCol` values
    * (each key sets `probes` positions), packed into 64-bit words with
    * only non-zero words stored. The third skipping layer beside range
    * stats ([[readPruned]]) and the exact key index ([[buildKeyIndex]]):
    * on a hash-scattered table where min/max prune nothing, the bloom
    * answers "which files can hold key k" in O(#files × bits/64) index
    * bytes — constant per file regardless of key cardinality, where the
    * exact index costs O(distinct keys). False positives only cost an
    * extra file open (the exact filter still runs on top); false
    * negatives are impossible. Version-pinned like the key index.
    *
    * SIZING: a bloom's false-positive rate is set by bits PER KEY, so a
    * fixed width silently saturates as files grow (measured: 64k bits
    * over 25k-row files = 85% fill = 44% FP — no pruning left). By
    * default the width auto-sizes from the log's own per-file row counts
    * (`bitsPerKey` × the largest file, the [[fileRowCounts]] accounting)
    * — 10 bits/key ≈ 0.9% FP at 5 probes, at ~1.25 bytes of index per
    * row. Pass `bits > 0` to pin an explicit width instead.
    */
  def buildBloomIndex(
      spark: SparkSession,
      path: String,
      keyCol: String,
      indexPath: String,
      bits: Int = 0,
      probes: Int = 5,
      bitsPerKey: Int = 10): Long = {
    import org.apache.spark.sql.functions.{bit_or, col, explode, expr, lit,
      pmod, sequence, shiftright, xxhash64}
    require(bits == 0 || (bits % 64 == 0 && bits > 0),
      "bits must be 0 (auto) or a positive multiple of 64")
    require(probes >= 1, "need at least one probe position")
    require(bitsPerKey >= 2, "fewer than 2 bits per key cannot prune")
    val v = latestVersion(path)
    val files = activeFiles(path, v)
    require(files.nonEmpty, "nothing to index")
    val width: Long =
      if (bits > 0) bits.toLong
      else {
        val counts = fileRowCounts(path, v).flatMap(_._2)
        val maxRows = if (counts.nonEmpty) counts.max else 0L
        math.max(4096L, (maxRows * bitsPerKey + 63) / 64 * 64)
      }
    bloomCells(spark, files, keyCol, width, probes)
      .write.mode("overwrite").parquet(s"$indexPath/bloom")
    Files.writeString(Paths.get(s"$indexPath/VERSION"), s"$v $width $probes")
    v
  }

  /** The per-(file, word) bloom rows for `files` — shared by the full
    * [[buildBloomIndex]] and the delta-only [[refreshBloomIndex]].
    */
  private def bloomCells(
      spark: SparkSession,
      files: Seq[String],
      keyCol: String,
      width: Long,
      probes: Int): DataFrame = {
    import org.apache.spark.sql.functions.{bit_or, col, explode, expr, lit,
      pmod, sequence, shiftright, xxhash64}
    spark.read.parquet(files: _*)
      .select(col(keyCol).as("key"), expr("_metadata.file_path").as("f"))
      .select(col("f"), col("key"),
        explode(sequence(lit(0), lit(probes - 1))).as("j"))
      .select(col("f"),
        pmod(xxhash64(col("key"), col("j")), lit(width)).as("pos"))
      .distinct()
      .select(col("f"), shiftright(col("pos"), 6).as("word"),
        expr("shiftleft(1L, cast(pmod(pos, 64) as int))").as("m"))
      .groupBy(col("f"), col("word"))
      .agg(bit_or(col("m")).as("bits"))
  }

  /** INCREMENTAL bloom-index maintenance: after commits/merges advance the
    * table, re-index ONLY the data files the index has not seen — the
    * property that makes a secondary index affordable on a 100 TB table,
    * where [[buildBloomIndex]]'s full rebuild would re-scan everything.
    * Data-scan cost is O(delta files); rows of files no longer active are
    * dropped (a candidate set must never surface a removed file — that
    * would resurrect rewritten rows through [[readByKeysBloom]]); rows of
    * surviving files carry over untouched from the index itself
    * (index-sized I/O, zero data reads). Width and probe count are pinned
    * by the original build so old and new blooms stay compatible.
    * Returns (files indexed, files dropped, files carried).
    */
  def refreshBloomIndex(
      spark: SparkSession,
      path: String,
      keyCol: String,
      indexPath: String): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.col
    val meta = Files.readString(Paths.get(s"$indexPath/VERSION")).trim.split(" ")
    val (width, probes) = (meta(1).toLong, meta(2).toInt)
    val v = latestVersion(path)
    val active = activeFiles(path, v).toSet
    val existing = spark.read.parquet(s"$indexPath/bloom").localCheckpoint(true)
    val exFiles = existing.select(col("f")).distinct()
      .collect().map(_.getString(0)).toSeq
    val plainOf = exFiles.map(f => f -> new java.net.URI(f).getPath).toMap
    val keepFiles = exFiles.filter(f => active.contains(plainOf(f)))
    val newFiles = (active -- plainOf.values).toSeq.sorted
    val kept = existing.filter(col("f").isin(keepFiles: _*))
    val out =
      if (newFiles.isEmpty) kept
      else kept.unionByName(
        bloomCells(spark, newFiles, keyCol, width, probes))
    // materialize before overwriting the directory the plan reads from
    out.localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$indexPath/bloom")
    Files.writeString(Paths.get(s"$indexPath/VERSION"), s"$v $width $probes")
    (newFiles.size.toLong, (exFiles.size - keepFiles.size).toLong,
      keepFiles.size.toLong)
  }

  /** The data files whose blooms contain ALL probe positions of at least
    * one probed key (plain paths, sorted) — the candidate set a bloom
    * lookup opens. Exposed for skip-ratio assertions.
    */
  def filesForKeysBloom(
      spark: SparkSession,
      path: String,
      indexPath: String,
      keys: DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions.{bit_or, broadcast, col, count,
      explode, expr, lit, pmod, sequence, shiftright, xxhash64}
    val meta = Files.readString(Paths.get(s"$indexPath/VERSION")).trim.split(" ")
    val (v, bits, probes) = (meta(0).toLong, meta(1).toLong, meta(2).toInt)
    require(v == latestVersion(path),
      s"bloom index is stale (indexed v$v, table at v${latestVersion(path)}) — rebuild")
    // per (key, word): the required mask (several probes can share a word)
    val req = keys.select(col(keys.columns.head).as("key")).distinct()
      .select(col("key"), explode(sequence(lit(0), lit(probes - 1))).as("j"))
      .select(col("key"),
        pmod(xxhash64(col("key"), col("j")), lit(bits.toLong)).as("pos"))
      .distinct()
      .select(col("key"), shiftright(col("pos"), 6).as("word"),
        expr("shiftleft(1L, cast(pmod(pos, 64) as int))").as("m"))
      .groupBy(col("key"), col("word"))
      .agg(bit_or(col("m")).as("need"))
      .localCheckpoint(true)
    val nWords = req.groupBy(col("key")).agg(count(lit(1)).as("nw"))
    // a file qualifies for a key iff EVERY required word is present with
    // all its bits — a missing (sparse-zero) index word fails the count
    spark.read.parquet(s"$indexPath/bloom")
      .join(broadcast(req), Seq("word"))
      .filter((col("bits").bitwiseAND(col("need"))) === col("need"))
      .groupBy(col("f"), col("key"))
      .agg(count(lit(1)).as("hits"))
      .join(broadcast(nWords), Seq("key"))
      .filter(col("hits") === col("nw"))
      .select(col("f")).distinct().collect().map(_.getString(0))
      .toSeq.sorted.map(p => new java.net.URI(p).getPath)
  }

  /** Point-lookup read through the bloom index: only candidate files are
    * opened (DV-masked and schema-evolved like any snapshot read); the
    * caller's exact key filter on top removes bloom false positives.
    */
  def readByKeysBloom(
      spark: SparkSession,
      path: String,
      indexPath: String,
      keys: DataFrame): DataFrame = {
    val fs = filesForKeysBloom(spark, path, indexPath, keys)
    require(fs.nonEmpty, "no file can contain any probed key")
    maskedRead(spark, path, latestVersion(path), fs)
      .drop("__dv_file", "__dv_pos")
  }

  /** Row-level DELETE as a DELETION VECTOR — the merge-on-read
    * alternative to [[deleteWhere]]'s copy-on-write rewrite (the
    * Delta/Iceberg "deletion vectors" / "positional delete files"
    * feature). Matching rows are recorded as `(file, row position)`
    * pairs in a sidecar parquet; NO data file is rewritten, copied, or
    * even re-read at commit time beyond the predicate probe. Snapshot
    * reads anti-join the accumulated vectors (a broadcast-sized join for
    * any sane vector count), so:
    *
    *   - DELETE cost is O(matches), not O(affected-file bytes) — on a
    *     100 TB table where [[deleteWhere]] would rewrite a whole file to
    *     drop one row, this writes kilobytes;
    *   - time travel is untouched (vectors replay only at or after their
    *     commit version);
    *   - [[optimize]] MATERIALIZES the vectors: it rewrites the
    *     DV-applied snapshot, after which the old vectors reference only
    *     removed files and the anti-join is a no-op (read cost returns
    *     to zero — the standard compact-to-reclaim cycle).
    *
    * Three-valued logic like [[deleteWhere]]: only predicate-TRUE rows
    * are marked; false-or-null rows stay. Note the file-level
    * [[changeFeed]] cannot see DV deletes (no files change) — use
    * snapshot diffs across the commit for row-level CDC over DVs.
    */
  def deleteWhereDv(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val marks = snapshotWithPos(spark, path)
      .filter(coalesce(predicate, lit(false)))
      .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
      .localCheckpoint(true)
    commitDvMarks(path, marks)
  }

  /** [[deleteWhereDv]] keyed by a DataFrame of keys instead of a predicate
    * Column: rows are marked via a LEFT-SEMI equi-join on `keyCol`, so the
    * key set never leaves the executors — the scale path for a badly
    * diverged replica where collecting the keys into an `isin` literal
    * list would be a driver-sized predicate (Reconcile.repair's guard
    * switches here above its orphan threshold). Same sidecar commit as
    * [[deleteWhereDv]]; the keys side broadcasts when small, shuffles when
    * not — either way the delete cost stays O(matches).
    */
  def deleteKeysDv(
      spark: SparkSession,
      path: String,
      keyCol: String,
      keys: DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    val marks = snapshotWithPos(spark, path)
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
      .localCheckpoint(true)
    commitDvMarks(path, marks)
  }

  /** Shared sidecar-commit tail of [[deleteWhereDv]] / [[deleteKeysDv]]. */
  private def commitDvMarks(path: String, marks: DataFrame): Long = {
    if (marks.isEmpty) return latestVersion(path)
    val next = latestVersion(path) + 1
    Files.createDirectories(logDir(path))
    val log = logFile(path, next)
    try Files.createFile(log)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(next)
    }
    val dvDir = s"$path/dv/v$next"
    marks.coalesce(1).write.mode("overwrite").parquet(dvDir)
    val dvAdds = {
      val d = Paths.get(dvDir)
      val s = Files.list(d)
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally s.close()
    }
    require(dvAdds.forall(p => !p.contains("\"") && !p.contains("\\")),
      "dv paths must be JSON-safe")
    val json = s"""{"version":$next,"tag":"","adds":[],"removes":[],""" +
      s""""dvs":[${dvAdds.map("\"" + _ + "\"").mkString(",")}]}"""
    val tmp = logDir(path).resolve(f".tmp-$next%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** MERGE-ON-READ upsert — one ATOMIC commit that appends `updates` as
    * new data files and masks the superseded rows (same `keyCol` in the
    * standing snapshot) via deletion-vector sidecars in the SAME log
    * entry. No data file is ever rewritten: commit cost is
    * O(updates + matches) rows — the shape a per-micro-batch streaming
    * MERGE needs, where [[mergeByKey]]'s copy-on-write would rewrite
    * every affected file each batch. The two halves land together or not
    * at all (single atomic entry), so a crash can never expose a
    * deleted-but-not-reinserted state. Read cost until an OPTIMIZE
    * compacts is the standing DV anti-join. `tag` keeps the exactly-once
    * idempotency contract of [[commit]]; the table must be key-unique on
    * `keyCol` (the mergeByKey family's contract), null update keys match
    * nothing and insert.
    */
  def upsertKeysDv(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keyCol: String,
      tag: String = ""): Long = {
    import org.apache.spark.sql.functions.col
    if (tag.nonEmpty) {
      val already = taggedVersion(path, tag)
      if (already.isDefined) return already.get
    }
    val u = updates.localCheckpoint(true)
    require(u.filter(col(keyCol).isNotNull).groupBy(col(keyCol)).count()
      .filter(col("count") > 1).isEmpty, "duplicate keys in updates")
    if (latestVersion(path) == 0L) return commit(spark, path, u, tag = tag)
    val snap = snapshotWithPos(spark, path)
    val dataCols = snap.columns.toSeq.filterNot(Set("__dv_file", "__dv_pos"))
    require(u.columns.toSeq.sorted == dataCols.sorted,
      "updates must carry exactly the table's columns")
    val marks = snap
      .join(u.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
      .localCheckpoint(true)
    commit(spark, path, u, tag = tag, dvMarks = Some(marks))
  }

  // ------------------------------------------------------------- OCC ----

  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** Optimistic transaction commit — the Delta WriteSerializable core.
    *
    * A writer prepares against `readVersion`: it derives `df` (the files
    * it will ADD) from that snapshot and names the files it logically
    * REMOVES (the ones it rewrote). Publication validates that the
    * intervening commits did not invalidate the preparation:
    *
    *   - every file in `removes` must still be ACTIVE at the current
    *     latest (another writer removing it means this rewrite was derived
    *     from stale bytes — landing it would resurrect deleted rows), and
    *   - no deletion vector may have been attached to any of them since
    *     `readVersion` (same staleness through the merge-on-read path;
    *     the new sidecars are O(matches)-sized, so reading their distinct
    *     file lists is metadata work).
    *
    * Validation runs AFTER the version reservation, so it is race-free:
    * the log below the reserved slot is frozen. Disjoint-file writers from
    * the same snapshot all land (append transactions never conflict);
    * a conflicted reservation is burned with an explicit no-op entry (a
    * pending empty file would stall readers until the janitor runs) and
    * [[CommitConflictException]] tells the caller to re-derive against the
    * new snapshot and retry — the rebase loop. Reservation races
    * (two writers grabbing the same slot) retry internally up to
    * `maxAttempts`. `tag` keeps the exactly-once idempotency contract of
    * [[commit]].
    */
  def commitTransaction(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      removes: Seq[String],
      readVersion: Long,
      tag: String = "",
      maxAttempts: Int = 5): Long = {
    import org.apache.spark.sql.functions.{col, count => scount, lit => slit}
    require(!tag.contains("\"") && !tag.contains("\\"), "tag must be JSON-safe")
    require(removes.forall(p => !p.contains("\"") && !p.contains("\\")),
      "remove paths must be JSON-safe")
    if (tag.nonEmpty) {
      val already = taggedVersion(path, tag)
      if (already.isDefined) return already.get
    }
    val wanted = removes.toSet
    var attempt = 0
    while (true) {
      attempt += 1
      val base = latestVersion(path)
      Files.createDirectories(logDir(path))
      val log = logFile(path, base + 1)
      val reserved =
        try { Files.createFile(log); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      if (!reserved) {
        // another writer owns the slot: wait for it to publish, revalidate
        if (attempt >= maxAttempts) throw new ConcurrentCommitException(base + 1)
      } else {
        val next = base + 1
        val active = activeFiles(path, base).toSet
        val staleRemoves = wanted -- active
        val dvConflicts: Set[String] = {
          val newDvs = dvFiles(path, base).toSet -- dvFiles(path, readVersion)
          if (newDvs.isEmpty) Set.empty
          else spark.read.parquet(newDvs.toSeq: _*)
            .select(col("file")).distinct().collect()
            .map(r => new java.net.URI(r.getString(0)).getPath)
            .toSet.intersect(wanted)
        }
        if (staleRemoves.nonEmpty || dvConflicts.nonEmpty) {
          val noop = s"""{"version":$next,"tag":"","adds":[],"removes":[]}"""
          val tmp = logDir(path).resolve(f".tmp-$next%08d")
          Files.write(tmp, noop.getBytes("UTF-8"))
          Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          throw new CommitConflictException(
            s"files touched since v$readVersion: " +
              (staleRemoves ++ dvConflicts).toSeq.sorted.mkString(", "))
        }
        // validated — land the data, publish adds/removes + row accounting
        val dataDir = s"$path/data/v$next"
        df.write.mode("overwrite").parquet(dataDir)
        val adds = {
          val d = Paths.get(dataDir)
          val s = Files.list(d)
          try s.iterator().asScala.map(_.toString)
            .filter(_.endsWith(".parquet")).toSeq.sorted
          finally s.close()
        }
        require(adds.forall(p => !p.contains("\"") && !p.contains("\\")),
          "data paths must be JSON-safe")
        val rows: String =
          if (adds.isEmpty) ""
          else {
            val byFile = spark.read.parquet(dataDir)
              .groupBy(col("_metadata.file_path").as("f"))
              .agg(scount(slit(1)).as("n")).collect()
              .map(r => new java.net.URI(r.getString(0)).getPath -> r.getLong(1))
              .toMap
            s""","rows":[${adds.map(f => byFile.getOrElse(f, 0L)).mkString(",")}]"""
          }
        val json =
          s"""{"version":$next,"tag":"$tag",""" +
            s""""adds":[${adds.map("\"" + _ + "\"").mkString(",")}],""" +
            s""""removes":[${removes.map("\"" + _ + "\"").mkString(",")}]$rows}"""
        val tmp = logDir(path).resolve(f".tmp-$next%08d")
        Files.write(tmp, json.getBytes("UTF-8"))
        Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        return next
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** DELETE prepared as an optimistic transaction against `readVersion`:
    * affected files and survivors both derive from that snapshot (same
    * three-valued-logic and DV-applied discipline as [[deleteWhere]]),
    * then [[commitTransaction]] validates nothing touched them since.
    */
  def deleteWhereTx(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      readVersion: Long): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val snap = snapshotWithPos(spark, path, readVersion)
    val affected = snap.filter(predicate)
      .select(col("__dv_file").as("f"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    if (affected.isEmpty) return latestVersion(path)
    val survivors = snap
      .filter(col("__dv_file").isin(affected: _*))
      .filter(!coalesce(predicate, lit(false)))
      .drop("__dv_file", "__dv_pos")
      .localCheckpoint(true)
    commitTransaction(spark, path, survivors,
      affected.map(p => new java.net.URI(p).getPath), readVersion)
  }

  /** Full compaction prepared as an optimistic transaction: rewrite the
    * whole `readVersion` snapshot into `targetFiles` files, removing every
    * file active there. Conflicts with ANY intervening rewrite — the
    * caller rebases by re-running against the new latest.
    */
  def compactTx(
      spark: SparkSession,
      path: String,
      readVersion: Long,
      targetFiles: Int = 1): Long = {
    val removes = activeFiles(path, readVersion)
    val content = readSnapshot(spark, path, readVersion)
      .repartition(targetFiles).localCheckpoint(true)
    commitTransaction(spark, path, content, removes, readVersion)
  }

  /** Active deletion-vector sidecar files at `version` (checkpoint
    * summary + later entries, like [[schemaOps]]). Public for spec
    * introspection.
    */
  def dvFiles(path: String, version: Long = Long.MaxValue): Seq[String] = {
    val base = latestCheckpoint(path, version)
    base.map(b => jsonList(b._3, "dvs")).getOrElse(Seq.empty) ++
      entries(path, after = base.map(_._1).getOrElse(0L))
        .takeWhile(_._1 <= version)
        .flatMap { case (_, json) => jsonList(json, "dvs") }
  }

  /** Schema evolution through the log — Delta-style metadata-only commits.
    *
    * `addColumn` makes a column exist from this version on: files written
    * before it simply lack it, and the snapshot read surfaces NULL for
    * their rows (Delta ADD COLUMN semantics — no data rewrite, ever).
    * `renameColumn` is a logical mapping: old files keep the old physical
    * name, new files write the new one, and the read coalesces the two —
    * again zero rewrite. Ops replay in version order, so time travel to a
    * pre-evolution version sees the old schema; [[checkpoint]] and
    * [[branch]] carry the accumulated ops so summarized logs keep the
    * mapping. The row-mutation operators (deleteWhere/merge*) operate on
    * physical files and are supported on PRE-evolution tables; run them
    * before evolving or after an OPTIMIZE has rewritten the snapshot
    * under the current schema.
    */
  def addColumn(path: String, name: String, sqlType: String): Long = {
    require(name.matches("[A-Za-z0-9_]+"), s"unsafe column name: $name")
    // fail here, not deep inside a later read
    org.apache.spark.sql.types.DataType.fromDDL(sqlType)
    require(!sqlType.exists(c => c == '"' || c == '\\' || c == ':'),
      s"unsupported type text for the log encoding: $sqlType")
    schemaCommit(path, s"add:$name:$sqlType")
  }

  def renameColumn(path: String, from: String, to: String): Long = {
    require(from.matches("[A-Za-z0-9_]+") && to.matches("[A-Za-z0-9_]+"),
      s"unsafe column names: $from -> $to")
    schemaCommit(path, s"rename:$from:$to")
  }

  /** Reserve-and-publish a metadata-only (no data files) commit. */
  private def schemaCommit(path: String, op: String): Long = {
    val next = latestVersion(path) + 1
    Files.createDirectories(logDir(path))
    val log = logFile(path, next)
    try Files.createFile(log)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(next)
    }
    val json = s"""{"version":$next,"tag":"","adds":[],"removes":[],""" +
      s""""schemaops":["$op"]}"""
    val tmp = logDir(path).resolve(f".tmp-$next%08d")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, log, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Accumulated deletion-vector references for a summarizing entry
    * (checkpoint/branch base) — a dvs-blind summary would silently
    * resurrect deleted rows after a checkpoint.
    */
  private def dvsJson(path: String, version: Long): String = {
    val dvs = dvFiles(path, version)
    if (dvs.isEmpty) ""
    else s""","dvs":[${dvs.map("\"" + _ + "\"").mkString(",")}]"""
  }

  /** Accumulated ops rendered for a summarizing entry (checkpoint/branch
    * base) — empty string when the table never evolved.
    */
  private def opsJson(path: String, version: Long): String = {
    val ops = schemaOps(path, version)
    if (ops.isEmpty) ""
    else s""","schemaops":[${ops.map("\"" + _ + "\"").mkString(",")}]"""
  }

  /** Accumulated schema ops at `version`: the checkpoint's summary plus
    * every later entry's ops, in commit order.
    */
  private def schemaOps(path: String, version: Long): Seq[String] = {
    val base = latestCheckpoint(path, version)
    base.map(b => jsonList(b._3, "schemaops")).getOrElse(Seq.empty) ++
      entries(path, after = base.map(_._1).getOrElse(0L))
        .takeWhile(_._1 <= version)
        .flatMap { case (_, json) => jsonList(json, "schemaops") }
  }

  private def applySchemaOps(df0: DataFrame, ops: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    var df = df0
    ops.foreach { op =>
      op.split(":", 3) match {
        case Array("add", n, t) =>
          // mergeSchema already surfaces the column once any file has it;
          // fill with typed NULLs only while no file does
          if (!df.columns.contains(n)) df = df.withColumn(n, lit(null).cast(t))
        case Array("rename", from, to) =>
          (df.columns.contains(from), df.columns.contains(to)) match {
            case (true, true) =>
              df = df.withColumn(to, coalesce(col(to), col(from))).drop(from)
            case (true, false) => df = df.withColumnRenamed(from, to)
            case _ => ()
          }
        case other => sys.error(s"unknown schema op in log: ${other.mkString(":")}")
      }
    }
    df
  }

  /** Data-skipping read: only the active files whose logged [min, max]
    * range overlaps `[lo, hi]` are opened (files committed without stats
    * are conservatively kept). The pruning decision comes from the LOG —
    * no footer is touched for a skipped file, which on an object store
    * saves a round-trip per file. Callers still apply their exact row
    * filter on top; the stats only bound which files can hold matches.
    */
  def readPruned(
      spark: SparkSession,
      path: String,
      lo: Long,
      hi: Long,
      version: Long = Long.MaxValue): DataFrame = {
    val kept = prunedFiles(path, lo, hi, version)
    require(kept.nonEmpty, s"no file can contain values in [$lo, $hi]")
    spark.read.parquet(kept: _*)
  }

  /** The file list [[readPruned]] would open — exposed for skip-ratio
    * assertions.
    */
  def prunedFiles(
      path: String,
      lo: Long,
      hi: Long,
      version: Long = Long.MaxValue): Seq[String] =
    activeEntries(path, version).collect {
      // a file with no logged stats must be kept: absence can't be proven
      case (f, st) if st.get("").forall { case (mn, mx) => mx >= lo && mn <= hi } => f
    }

  /** Multi-column log-based skipping: files that can hold `col` values in
    * `[lo, hi]`, judged from the NAMED per-file stats committed with
    * `statsCols`. Conjunctive predicates intersect the per-column results
    * (each call is pure log metadata — zero data I/O).
    */
  def prunedFilesBy(
      path: String,
      statsCol: String,
      lo: Long,
      hi: Long,
      version: Long = Long.MaxValue): Seq[String] =
    activeEntries(path, version).collect {
      case (f, st) if st.get(statsCol).forall { case (mn, mx) => mx >= lo && mn <= hi } => f
    }

  /** Snapshot read pruned on several column ranges at once: one log
    * replay, per-column interval tests intersected per file.
    */
  def readPrunedBy(
      spark: SparkSession,
      path: String,
      ranges: Seq[(String, Long, Long)],
      version: Long = Long.MaxValue): DataFrame = {
    require(ranges.nonEmpty)
    val kept = activeEntries(path, version).collect {
      case (f, st) if ranges.forall { case (c, lo, hi) =>
        st.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
      } => f
    }
    require(kept.nonEmpty,
      s"no file can contain values in ${ranges.mkString(", ")}")
    spark.read.parquet(kept: _*)
  }

  /** OPTIMIZE through the log: rewrite the current snapshot as
    * `targetFiles` files in ONE atomic commit (adds the compacted files,
    * logically removes every small one). Readers never see a half-
    * compacted table, and time travel to pre-optimize versions keeps
    * working because the removed files stay on disk until [[vacuum]].
    */
  /** Row-level change feed for commits in `(fromVersion, toVersion]`,
    * derived purely from the file-level log: for each commit, the rows of
    * its added files minus the rows of its removed files (multiset
    * EXCEPT ALL) are that commit's inserts, and the reverse difference its
    * deletes. Rows a rewrite carried over unchanged (survivors sharing a
    * file with deleted rows, compaction, Z-ordering) cancel in the EXCEPT
    * and never appear, so the feed is the NET row-level change per commit —
    * the consumer-facing CDC surface a downstream incremental pipeline
    * tails.
    *
    * Scale shape: only files TOUCHED by the selected commits are read, so
    * a small daily delta on a huge table feeds consumers at delta cost
    * (never a full-table scan), and the per-commit EXCEPT shuffles only
    * that commit's changed bytes. Requires the schema to be stable across
    * the requested range (use per-commit calls across an evolution
    * boundary).
    *
    * Result: data columns + `_change_type` ('insert' | 'delete') +
    * `_commit_version`.
    */
  def changeFeed(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      toVersion: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val commits = entries(path)
      .filter { case (v, _) => v > fromVersion && v <= toVersion }
      .map { case (v, json) =>
        (v, jsonList(json, "adds"), jsonList(json, "removes"))
      }
    require(commits.nonEmpty, s"no commits in ($fromVersion, $toVersion]")
    def read(fs: Seq[String]): Option[DataFrame] =
      if (fs.isEmpty) None else Some(spark.read.parquet(fs: _*))
    val frames = commits.flatMap { case (v, adds, removes) =>
      val added = read(adds)
      val removed = read(removes)
      def tag(df: DataFrame, kind: String): DataFrame = df
        .withColumn("_change_type", lit(kind))
        .withColumn("_commit_version", lit(v))
      val inserts = (added, removed) match {
        case (Some(a), Some(r)) => Some(tag(a.exceptAll(r), "insert"))
        case (Some(a), None)    => Some(tag(a, "insert"))
        case _                  => None
      }
      val deletes = (added, removed) match {
        case (Some(a), Some(r)) => Some(tag(r.exceptAll(a), "delete"))
        case (None, Some(r))    => Some(tag(r, "delete"))
        case _                  => None
      }
      inserts.toSeq ++ deletes.toSeq
    }
    frames.reduce(_ unionByName _)
  }

  def optimize(
      spark: SparkSession,
      path: String,
      targetFiles: Int = 1,
      statsCol: String = ""): Long = {
    require(targetFiles >= 1)
    // safe to read lazily: the rewrite lands in a NEW data dir; the files
    // being logically removed stay physically intact
    commit(spark, path, readSnapshot(spark, path).coalesce(targetFiles),
      overwrite = true, statsCol = statsCol)
  }

  /** OPTIMIZE with Z-ORDER clustering (the `OPTIMIZE ... ZORDER BY`
    * posture): rewrite the snapshot range-partitioned + sorted on the
    * interleaved z-value of `zCols`, and log NAMED per-file min/max for
    * those columns in the same commit — after which [[readPrunedBy]]
    * range predicates on ANY of the clustered columns skip most files
    * from the log alone. One atomic commit; time travel to the
    * pre-optimize layout keeps working. Sorting is by z-value, so each
    * output file covers a tight hyper-rectangle in key space (tight
    * min/max on EVERY key — the multi-dimensional analogue of a single
    * sort column).
    */
  def optimizeZorder(
      spark: SparkSession,
      path: String,
      zCols: Seq[String],
      bits: Int = 24,
      targetFiles: Int = 8,
      statsCols: Seq[String] = Seq.empty): Long = {
    require(targetFiles >= 1 && zCols.size >= 2)
    import org.apache.spark.sql.functions.col
    val clustered = readSnapshot(spark, path)
      .withColumn("__z",
        graft.operators.Layout.zorderValueN(bits, zCols.map(col)))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    commit(spark, path, clustered, overwrite = true,
      statsCols = if (statsCols.isEmpty) zCols else statsCols)
  }

  /** OPTIMIZE + HILBERT: [[optimizeZorder]] with the locality-preserving
    * curve ([[graft.operators.Layout.hilbertValue]]) — one atomic
    * overwrite commit rewrites the snapshot clustered by the d=2 Hilbert
    * index of `(xCol, yCol)` with named min/max stats on both, so
    * log-based pruning skips on either key with tighter per-file ranges
    * than Morton at equal file count (each file is a contiguous curve
    * segment = a near-square tile; LayoutSpec measures the comparison).
    * Time travel to the pre-layout versions stays intact like every
    * OPTIMIZE here.
    */
  def optimizeHilbert(
      spark: SparkSession,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int = 12,
      targetFiles: Int = 8,
      statsCols: Seq[String] = Seq.empty): Long = {
    require(targetFiles >= 1)
    import org.apache.spark.sql.functions.col
    val clustered = readSnapshot(spark, path)
      .withColumn("__h",
        graft.operators.Layout.hilbertValue(col(xCol), col(yCol), bits))
      .repartitionByRange(targetFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
    commit(spark, path, clustered, overwrite = true,
      statsCols = if (statsCols.isEmpty) Seq(xCol, yCol) else statsCols)
  }

  /** VACUUM: physically delete data files that were logically removed at
    * or before `retainVersion` — they are invisible to every snapshot
    * from `retainVersion` onward. Time travel BELOW the horizon breaks
    * (that is the point: storage is reclaimed); the log itself is kept as
    * the audit trail. Returns the deleted file count.
    */
  def vacuum(path: String, retainVersion: Long): Long = {
    val removedAt = scala.collection.mutable.LinkedHashMap[String, Long]()
    entries(path).foreach { case (v, json) =>
      val m = """"removes":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      m.foreach(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty)
        .foreach(f => if (!removedAt.contains(f)) removedAt(f) = v))
    }
    val deletable = removedAt.collect {
      case (f, v) if v <= retainVersion => f
    }.toSeq
    deletable.count { f =>
      val p = Paths.get(f)
      Files.deleteIfExists(p)
    }
  }

  /** ORPHAN-FILE LISTING — the complement of [[vacuum]]: vacuum reclaims
    * files the log REMOVED (rewritten/deleted but retained for time
    * travel); orphans are files the log NEVER SAW — a writer that crashed
    * between landing its parquet files under `data/vN` and filling its
    * reservation (the
    * [[abandonPending]] path) leaves parquet bytes no snapshot at any
    * version can reach, silently billing storage forever. Orphans = the
    * on-disk data-file walk minus the union of EVERY entry's adds;
    * metadata-only (one directory walk + one log scan — file contents are
    * never read), so the audit costs the same at 100 TB as at 100 MB.
    * DV sidecars live under `dv/`, outside the walk.
    */
  def orphanFiles(path: String): Seq[String] = {
    val dataRoot = Paths.get(s"$path/data")
    if (!Files.isDirectory(dataRoot)) return Seq.empty
    val walk = Files.walk(dataRoot)
    val onDisk =
      try walk.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq
      finally walk.close()
    // read EVERY log file raw — not entries(), whose pending-reservation
    // cut hides entries from writers that raced ahead of a crashed one;
    // those entries' files are invisible TODAY but become reachable the
    // moment abandonPending clears the stall, so they are NOT orphans
    val dir = logDir(path)
    val referenced: Set[String] =
      if (!Files.isDirectory(dir)) Set.empty
      else {
        val s = Files.list(dir)
        try s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".json"))
          .flatMap(f => jsonList(
            new String(Files.readAllBytes(f), "UTF-8"), "adds"))
          .toSet
        finally s.close()
      }
    onDisk.filterNot(referenced).sorted
  }

  /** Delete [[orphanFiles]]; returns the reclaimed paths. Safe by
    * construction: a file in no version's adds can never be read through
    * the log, so removal cannot change any snapshot at any version.
    */
  def gcOrphans(path: String): Seq[String] = {
    val orphans = orphanFiles(path)
    orphans.foreach(f => Files.deleteIfExists(Paths.get(f)))
    orphans
  }

  /** Remove a trailing pending (empty) reservation left by a crashed
    * writer so the log can move forward. Returns true if one was removed.
    */
  def abandonPending(path: String): Boolean = {
    val dir = logDir(path)
    if (!Files.isDirectory(dir)) return false
    val s = Files.list(dir)
    val pending = try {
      s.iterator().asScala
        .filter(f => f.getFileName.toString.endsWith(".json") && Files.size(f) == 0)
        .toSeq
    } finally s.close()
    pending.foreach(Files.delete)
    pending.nonEmpty
  }
}
