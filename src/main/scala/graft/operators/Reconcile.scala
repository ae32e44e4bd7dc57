package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TextHashExpressions.xsHash

/** Cross-table reconciliation: find every key whose row differs between
  * two tables (a migration cut-over check, replica audit, or backfill
  * validation) WITHOUT shipping either table across the network whole.
  *
  * Two phases, the anti-entropy shape:
  *   1. each side reduces to `buckets` (count, xor-of-row-signatures)
  *      pairs — a full scan but a tiny shuffle (the xor aggregate is
  *      commutative, so it map-side combines);
  *   2. only the buckets whose digests disagree are re-read and compared
  *      row-by-row (full outer join on the key).
  * At 100 TB with few expected differences, phase 2 touches a vanishing
  * fraction of the data. Collision hardening: an xor digest can cancel if
  * two differences coincide inside one bucket, and the xorshift family is
  * affine over GF(2) (cancellation in the row hashes would CARRY to any
  * xorshift remix of them) — so the second digest is `xxhash64`, whose
  * multiply steps are nonlinear over GF(2) and therefore genuinely
  * independent of the first. A bucket hides a difference only if count,
  * xor-of-xsHash AND xor-of-xxhash64 all cancel simultaneously.
  */
object Reconcile {

  /** Out-of-band marker for null column values. `concat_ws` SKIPS nulls —
    * without a sentinel `(1, null, "x")` and `(1, "x", null)` would
    * serialize identically and a real difference would vanish. NUL is not
    * valid in any of the engine's text columns; callers with binary
    * columns must pre-encode.
    */
  private val NullSentinel = "\u0000"

  private def safeCols(cols: Seq[String]): Seq[Column] =
    cols.map(c => coalesce(col(c).cast("string"), lit(NullSentinel)))

  /** Per-row signature: portable xsHash over the '|'-joined column values,
    * nulls replaced by [[NullSentinel]] (the caller guarantees '|' never
    * occurs in the data — or remaps the separator).
    */
  private def rowSig(cols: Seq[String]): Column =
    xsHash(concat_ws("|", safeCols(cols): _*))

  /** Second, independent per-row signature (nonlinear over GF(2)). */
  private def rowSig2(cols: Seq[String]): Column =
    xxhash64(safeCols(cols): _*)

  /** Keys whose rows differ, labelled `A_only` / `B_only` / `differs`.
    * `keyCol` must be an integral key (bucketed by modulo). Null keys are
    * supported: they land in a reserved bucket and compare null-safely as
    * one key class (a table with MANY null keys degenerates to a
    * many-to-many compare of that class — a null key is not a key).
    */
  def diffKeys(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1)
    val cols = a.columns.toSeq
    require(b.columns.toSeq == cols, "schemas must align for reconciliation")
    def prep(df: DataFrame) = df.select(
      col(keyCol),
      coalesce(pmod(col(keyCol), lit(buckets.toLong)).cast("long"), lit(-1L))
        .as("bucket"),
      rowSig(cols).as("sig"),
      rowSig2(cols).as("sig2"))
    def digest(df: DataFrame, suffix: String) =
      prep(df).groupBy(col("bucket"))
        .agg(count(lit(1)).as(s"n_$suffix"),
          expr("bit_xor(sig)").as(s"x_$suffix"),
          expr("bit_xor(sig2)").as(s"y_$suffix"))
    // the digest table is at most `buckets`+1 rows — collecting the
    // disagreeing ids is metadata-sized and makes the phase-2 restriction
    // a plain per-row predicate (no join, no shuffle); on a
    // bucket-partitioned layout the same predicate prunes whole files
    val bad = digest(a, "a")
      .join(digest(b, "b"), Seq("bucket"), "full_outer")
      .filter(!(col("n_a") <=> col("n_b")) || !(col("x_a") <=> col("x_b")) ||
        !(col("y_a") <=> col("y_b")))
      .select(col("bucket")).collect().map(_.getLong(0)).toSeq
    val inBad: Column =
      if (bad.isEmpty) lit(false) else col("bucket").isin(bad: _*)
    // phase 2: row-level compare restricted to the disagreeing buckets;
    // the key join is null-safe so null-key rows surface too
    val aBad = prep(a).filter(inBad)
      .select(col(keyCol).as("k_a"), col("sig").as("s_a"), col("sig2").as("t_a"))
    val bBad = prep(b).filter(inBad)
      .select(col(keyCol).as("k_b"), col("sig").as("s_b"), col("sig2").as("t_b"))
    aBad.join(bBad, col("k_a") <=> col("k_b"), "full_outer")
      .withColumn("status",
        when(col("s_a").isNull, "B_only")
          .when(col("s_b").isNull, "A_only")
          .when(col("s_a") =!= col("s_b") || col("t_a") =!= col("t_b"),
            "differs"))
      .filter(col("status").isNotNull)
      .select(coalesce(col("k_a"), col("k_b")).as(keyCol), col("status"))
  }

  /** ANTI-ENTROPY REPAIR: run [[diffKeys]] against a TxLake replica and
    * bring it back equal to `source` — the apply half of the
    * reconciliation loop (Merkle-repair in Dynamo/Cassandra terms,
    * backfill-fix in warehouse terms). Orphaned replica keys (`B_only`)
    * are removed with a DELETION VECTOR (O(matches), no file rewrite);
    * missing and differing keys are upserted with the affected-file-only
    * MERGE. Cost scales with the DIFF, never the table: phase-2 row
    * compares touch only disagreeing checksum buckets, the delete writes
    * a sidecar, and the merge rewrites only files containing repaired
    * keys.
    *
    * Null-key rows are a compare CLASS, not an addressable key — they
    * are reported by [[diffKeys]] but skipped here (documented contract).
    * Returns (orphans deleted, keys upserted).
    */
  def repair(
      spark: org.apache.spark.sql.SparkSession,
      source: DataFrame,
      lakePath: String,
      keyCol: String,
      buckets: Int = 1024,
      maxIsinOrphans: Int = 10000): (Long, Long) = {
    val replica = graft.sources.TxLake.readSnapshot(spark, lakePath)
    val diffs = diffKeys(source, replica, keyCol, buckets)
      .filter(col(keyCol).isNotNull)
      .localCheckpoint(true)
    val orphanDf = diffs.filter(col("status") === "B_only").select(col(keyCol))
    // COUNT before collecting: a healthy replica's diff is tiny, but a
    // badly diverged one can orphan a data-sized key set — above the
    // threshold the keys stay on the executors and the DV marks come from
    // a left-semi join instead of a driver-sized isin literal list
    val nOrphans = orphanDf.count()
    if (nOrphans > 0 && nOrphans <= maxIsinOrphans) {
      val orphans = orphanDf.collect().map(_.getLong(0))
      graft.sources.TxLake.deleteWhereDv(spark, lakePath,
        col(keyCol).isin(orphans.map(x => x: Any): _*))
    } else if (nOrphans > maxIsinOrphans) {
      graft.sources.TxLake.deleteKeysDv(spark, lakePath, keyCol, orphanDf)
    }
    val upserts = source.join(
      diffs.filter(col("status") =!= "B_only").select(col(keyCol)),
      Seq(keyCol), "left_semi").localCheckpoint(true)
    val nUp = upserts.count()
    if (nUp > 0)
      graft.sources.TxLake.mergeByKey(spark, lakePath, upserts, keyCol)
    (nOrphans, nUp)
  }

  /** Golden-source election across THREE replicas by field-level majority
    * vote — the N-way generalization of [[diffKeys]]'s 2-way compare,
    * where a bare diff can only flag but a quorum can DECIDE. Per key and
    * per value column: the value at least two replicas agree on wins
    * (string-rendered comparison, null-safe); a three-way split elects
    * the first replica's value and flags the field. Output: one golden
    * row per key present in ≥ 2 replicas, with `n_present`,
    * `n_conflict_fields` (fields where any disagreement existed among
    * present replicas) and `n_unresolved` (three-way splits). One 3-way
    * full-outer join on the key — a key-equi shuffle, no pairwise
    * blow-up.
    */
  def majorityVote(
      a: DataFrame, b: DataFrame, c: DataFrame,
      keyCol: String, valueCols: Seq[String]): DataFrame = {
    def tag(df: DataFrame, t: String) = df.select(
      (col(keyCol).as(s"k_$t") +:
        valueCols.map(v => col(v).as(s"${v}_$t"))): _*)
    val j = tag(a, "a")
      .join(tag(b, "b"), col("k_a") === col("k_b"), "full_outer")
      .join(tag(c, "c"),
        coalesce(col("k_a"), col("k_b")) === col("k_c"), "full_outer")
    val key = coalesce(col("k_a"), col("k_b"), col("k_c"))
    val present = Seq("a", "b", "c")
      .map(t => when(col(s"k_$t").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    def vote(v: String): (Column, Column, Column) = {
      val va = col(s"${v}_a"); val vb = col(s"${v}_b"); val vc = col(s"${v}_c")
      val ab = col("k_a").isNotNull && col("k_b").isNotNull && (va <=> vb)
      val ac = col("k_a").isNotNull && col("k_c").isNotNull && (va <=> vc)
      val bc = col("k_b").isNotNull && col("k_c").isNotNull && (vb <=> vc)
      val golden = when(ab || ac, va).when(bc, vb)
        .otherwise(coalesce(va, vb, vc))
      val conflict = when(
        (col("k_a").isNotNull && col("k_b").isNotNull && !(va <=> vb)) ||
          (col("k_a").isNotNull && col("k_c").isNotNull && !(va <=> vc)) ||
          (col("k_b").isNotNull && col("k_c").isNotNull && !(vb <=> vc)),
        1L).otherwise(0L)
      val unresolved = when(present === 3 && !(va <=> vb) && !(va <=> vc) &&
        !(vb <=> vc), 1L).otherwise(0L)
      (golden, conflict, unresolved)
    }
    val votes = valueCols.map(v => v -> vote(v))
    j.select((key.as(keyCol) +: present.as("n_present") +:
        votes.map { case (v, (g, _, _)) => g.as(v) }) ++
      Seq(votes.map(_._2._2).reduce(_ + _).as("n_conflict_fields"),
        votes.map(_._2._3).reduce(_ + _).as("n_unresolved")): _*)
      .filter(col("n_present") >= 2)
  }

  /** ORDER-INDEPENDENT table fingerprint: (row count, XOR of 52-bit row
    * hashes over the canonical field string) — the cross-system
    * reconciliation primitive that answers "are these two copies
    * byte-identical in content" WITHOUT moving rows (ship two longs, not
    * a table): XOR commutes, so partitioning, ordering and engine are all
    * invisible; any single-row difference flips the fingerprint.
    * One map-side-combined aggregate; md5-derived so the oracle replays
    * it exactly. (XOR cancels PAIRS of identical rows — fingerprints
    * compare row SETS; pair with the count for multiplicity.) Columns get
    * the [[NullSentinel]] treatment like every other digest here:
    * `concat_ws` SKIPS nulls, so without it (1, null, 'x') and
    * (1, 'x', null) would serialize identically and a real cross-system
    * difference would cancel out of the XOR.
    */
  /** MERKLE-TREE table diff — [[fingerprint]]'s range-tree
    * generalization: rows hash into `buckets` content-addressed leaves
    * (bucket = row hash mod buckets), each leaf carries an XOR
    * fingerprint + count, and leaves roll up by `fanout` into interior
    * XOR nodes. Two tables then reconcile at LOG cost: equal roots end
    * the conversation with two longs; on mismatch only the differing
    * branches descend, and resync ships only the differing leaves'
    * rows — the anti-entropy protocol shape (Dynamo/Cassandra repair)
    * for cross-system tables. This batch verifier computes both trees
    * and returns the differing LEAVES (with both sides' counts and
    * fingerprints) plus each one's interior path, so the caller sees
    * exactly what a remote descent would have fetched. XOR commutes —
    * partitioning and order are invisible, any one-row difference flips
    * its leaf, its interior node, and the root.
    */
  def merkleDiff(
      a: DataFrame,
      b: DataFrame,
      cols: Seq[String],
      buckets: Int,
      fanout: Int): DataFrame = {
    require(buckets >= 2 && fanout >= 2)
    val la = merkleLeaves(a, cols, buckets).select(col("leaf"),
      col("n").as("n_a"), col("fp").as("fp_a"))
    val lb = merkleLeaves(b, cols, buckets).select(col("leaf"),
      col("n").as("n_b"), col("fp").as("fp_b"))
    la.join(lb, Seq("leaf"), "full_outer")
      .select(col("leaf"), expr(s"leaf div $fanout").as("node"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("fp_a"), lit(0L)).as("fp_a"),
        coalesce(col("fp_b"), lit(0L)).as("fp_b"))
      .filter(col("fp_a") =!= col("fp_b") || col("n_a") =!= col("n_b"))
  }

  /** The content-addressed leaf census [[merkleDiff]] compares: bucket =
    * row hash mod `buckets`, per-leaf XOR fingerprint + count. XOR and
    * count both merge across arbitrary row slices (bit_xor of partial
    * fps, sum of partial counts), so a streaming ingest can maintain the
    * store incrementally and land exactly this table — see q402.
    */
  def merkleLeaves(df: DataFrame, cols: Seq[String], buckets: Int): DataFrame =
    df.select(conv(substring(md5(concat_ws("|", safeCols(cols): _*)),
        1, 13), 16, 10).cast("long").as("__h"))
      .withColumn("leaf", pmod(col("__h"), lit(buckets.toLong)))
      .groupBy(col("leaf"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("fp"))

  def fingerprint(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(conv(substring(md5(concat_ws("|",
          cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*)),
          1, 13), 16, 10)
        .cast("long").as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_fp"))

  /** SCHEMA-COMPATIBILITY audit between a producer's current schema and
    * its proposed next one — the data-contract gate run BEFORE a
    * deploy, not after consumers break: per field, a verdict under the
    * standard evolution rules (identical → ok; int→long / float→double /
    * decimal precision growth at equal scale → ok_widened; new nullable →
    * ok_added; new required → break_added_required; dropped →
    * break_dropped; anything else → break_type). Nullability on matched
    * fields is part of the contract too: nullable → NOT NULL is a
    * consumer-visible tightening (break_now_required — a writer that
    * used to emit nulls now rejects them downstream); NOT NULL →
    * nullable is a relaxation consumers must be told about (ok_relaxed —
    * readers that never null-checked now must). A type break dominates a
    * nullability change. Pure metadata — two StructTypes compared on the
    * driver, no data touched.
    */
  def schemaCompat(
      spark: org.apache.spark.sql.SparkSession,
      oldS: org.apache.spark.sql.types.StructType,
      newS: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.types._
    def widened(a: DataType, b: DataType): Boolean = (a, b) match {
      case (IntegerType, LongType) | (ShortType, IntegerType) |
           (ShortType, LongType) | (FloatType, DoubleType) => true
      case (x: DecimalType, y: DecimalType) =>
        y.scale == x.scale && y.precision > x.precision
      case _ => false
    }
    val oldF = oldS.fields.map(f => f.name -> f).toMap
    val newF = newS.fields.map(f => f.name -> f).toMap
    def nullShift(f: StructField, g: StructField,
        verdict: String, detail: String): (String, String, String) =
      if (f.nullable && !g.nullable)
        (f.name, "break_now_required", s"$detail, now NOT NULL")
      else if (!f.nullable && g.nullable)
        (f.name, "ok_relaxed", s"$detail, now nullable")
      else (f.name, verdict, detail)
    val rows = (oldS.fields.map { f =>
      newF.get(f.name) match {
        case None => (f.name, "break_dropped",
          s"${f.dataType.simpleString} -> absent")
        case Some(g) if g.dataType == f.dataType =>
          nullShift(f, g, "ok", f.dataType.simpleString)
        case Some(g) if widened(f.dataType, g.dataType) =>
          nullShift(f, g, "ok_widened",
            s"${f.dataType.simpleString} -> ${g.dataType.simpleString}")
        case Some(g) => (f.name, "break_type",
          s"${f.dataType.simpleString} -> ${g.dataType.simpleString}")
      }
    } ++ newS.fields.filterNot(g => oldF.contains(g.name)).map { g =>
      if (g.nullable)
        (g.name, "ok_added", s"absent -> ${g.dataType.simpleString}")
      else
        (g.name, "break_added_required",
          s"absent -> ${g.dataType.simpleString} NOT NULL")
    }).toIndexedSeq
    spark.createDataFrame(rows).toDF("field", "verdict", "detail")
  }

  /** BLAND–ALTMAN AGREEMENT — do two measurement SYSTEMS agree on the
    * same units: bias (mean difference) and 95% limits of agreement
    * bias ± 1.959964·SD(diff), plus the share of units outside — the
    * calibrated follow-up to the row-level diff surfaces here
    * ([[fingerprint]] says WHETHER they differ; this says BY HOW MUCH
    * and whether the disagreement is systematic or noise). Callers
    * supply one row per unit with both measurements in integer cents.
    *
    * Exact integer Σd / Σd² in DECIMAL(38,0), sample SD and the limits
    * one pinned double expression each; the outside-count compares each
    * exact diff against those identical doubles. NULL limits below 2
    * units.
    */
  def blandAltman(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val diffs = df.select(
      (col(aCol).cast("long") - col(bCol).cast("long")).as("d"))
    val m = diffs.agg(count(lit(1)).as("n"),
      sum(col("d").cast(d38)).as("s"),
      sum(col("d").cast(d38) * col("d").cast(d38)).as("ss"))
    val n = dbl(col("n"))
    val bias = dbl(col("s")) / n
    val sd = when(col("n") > 1L,
      sqrt((n * dbl(col("ss")) - dbl(col("s")) * dbl(col("s"))) /
        (n * (n - 1.0))))
    val lims = m.select(col("n"), bias.as("__bias"), sd.as("__sd"),
      (bias - lit(1.959964) * sd).as("__lo"),
      (bias + lit(1.959964) * sd).as("__hi"))
    diffs.crossJoin(broadcast(lims))
      .agg(max(col("n")).as("n"),
        round(max(col("__bias")), 6).as("bias"),
        round(max(col("__sd")), 6).as("sd_diff"),
        round(max(col("__lo")), 6).as("loa_lo"),
        round(max(col("__hi")), 6).as("loa_hi"),
        sum(when(dbl(col("d")) < col("__lo") ||
          dbl(col("d")) > col("__hi"), 1L).otherwise(0L)).as("n_outside"))
  }
}
