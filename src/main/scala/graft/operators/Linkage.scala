package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.StringSimilarityExpressions.jaroWinkler

/** Record linkage: fuzzy-match two tables on a name-like column without
  * the all-pairs cartesian.
  *
  * The classic two-step shape: a cheap BLOCKING key (a substring, phonetic
  * code, or sorted-token prefix — anything a true match pair must agree
  * on) equi-joins candidates, then the expensive similarity scores only
  * within blocks. At 100 TB the equi-join shuffles on the block key and
  * the quadratic term is bounded per block — the blocking key's
  * selectivity, not the corpus size, is what the operator's cost follows.
  * Similarity is the codegen [[graft.plans.JaroWinkler]] expression, so
  * scoring stays inside whole-stage codegen.
  */
object Linkage {

  /** Pairs `(a_key, b_key, sim)` with `sim >= threshold`, compared only
    * within equal `blockCol` values. The threshold is applied to the RAW
    * double (bit-identical cross-engine, see JaroWinklerImpl); the
    * reported score is rounded for output stability.
    */
  def fuzzyJoin(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      nameCol: String,
      blockCol: Column,
      threshold: Double = 0.9): DataFrame = {
    val left = a.select(col(keyCol).as("a_key"), col(nameCol).as("a_name"),
      blockCol.as("blk"))
    val right = b.select(col(keyCol).as("b_key"), col(nameCol).as("b_name"),
      blockCol.as("blk"))
    left.join(right, Seq("blk"))
      .withColumn("sim", jaroWinkler(col("a_name"), col("b_name")))
      .filter(col("sim") >= threshold)
      .select(col("a_key"), col("b_key"), round(col("sim"), 6).as("sim"))
  }

  /** Survivorship: ONE golden record per cluster, each field resolved
    * INDEPENDENTLY by `(has a value, trust, id)` — the master-data-
    * management step after linkage + clustering. A lower-trust system's
    * non-null beats a higher-trust null (that is what makes the
    * resolution per-field: the winning record can differ per column),
    * and the unique id breaks trust ties deterministically.
    *
    * One aggregation pass, field picks as max(struct(...)) — per-cluster
    * work is a constant number of struct comparisons per row, no window
    * over the full record table. (Struct buffers aren't hash-aggregable,
    * so Spark plans a SortAggregate — still with map-side partial max,
    * which is the property that matters at scale.)
    */
  def goldenRecord(
      records: DataFrame,
      clusterCol: String,
      idCol: String,
      trustCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty)
    val picks = fields.map(f =>
      max(struct(col(f).isNotNull.as("has"), col(trustCol).as("t"),
        col(idCol).as("i"), col(f).as("v")))
        .getField("v").as(f))
    records
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_records"), picks: _*)
  }

  /** FELLEGI–SUNTER EM (1969; Winkler's EM fitting): learn per-field
    * match (m) and non-match (u) agreement probabilities UNSUPERVISED
    * from blocked candidate pairs — the parameters that turn [[fuzzyJoin]]
    * from a hand-tuned threshold into principled log-likelihood-ratio
    * weights (w_agree = ln m/u, w_disagree = ln (1−m)/(1−u)). The E/M
    * steps run over the agreement-PATTERN census (≤ 2^k rows — the
    * distributed pair scan collapses to it in one map-side-combined
    * pass), so the iteration itself is metadata-sized: the census
    * collects to the driver exactly like the O(channels²) attribution
    * matrix, and every intermediate lands on the engine's 1e-9 grid
    * (probabilities exact-decimal, divisions pinned doubles) so the
    * oracle's unrolled-CTE EM replays it bit for bit.
    *
    * Input: one row per candidate pair with BOOLEAN agreement columns
    * `fields`. Output: one row per field with m/u/weights plus the
    * fitted match prevalence λ.
    */
  def fellegiSunter(
      pairs: DataFrame,
      fields: Seq[String],
      iters: Int): DataFrame = {
    require(fields.nonEmpty && fields.size <= 8 && iters >= 1)
    val k = fields.size
    val census = pairs
      .groupBy(fields.map(f => col(f).cast("int").as(f)): _*)
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (fields.indices.map(i => r.getInt(i) == 1).toVector,
        r.getLong(k)))
      .sortBy(_._1.map(b => if (b) "1" else "0").mkString)
    val nTotal = census.map(_._2).sum
    require(nTotal > 0, "fellegiSunter: no candidate pairs")
    // Winkler clamp: every fitted quantity stays in [1e-9, 1-1e-9] ON
    // THE GRID. Without it, at scale the sorted-neighborhood census is
    // overwhelmingly non-matches, every responsibility rounds to 0,
    // srm == 0 and the next M-step divides 0/0 -> NaN ->
    // BigDecimal.valueOf blows up (the r8 sf0.1 bench failure). The
    // clamp keeps srm >= nTotal*1e-9 > 0 so the EM degrades gracefully
    // to lam ~ 1e-9 instead of crashing; the oracle mirrors it with
    // least/greatest on the same DECIMAL(11,9) grid.
    val gLo = BigDecimal("0.000000001")
    val gHi = BigDecimal("0.999999999")
    def grid9(x: Double): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(x))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .max(gLo).min(gHi)
    val one = BigDecimal(1)
    var lam = BigDecimal("0.1")
    var m = Vector.fill(k)(BigDecimal("0.9"))
    var u = Vector.fill(k)(BigDecimal("0.1"))
    for (_ <- 1 to iters) {
      // E: responsibility per pattern, exact-decimal products, one
      // pinned double division onto the grid
      val r = census.map { case (bits, _) =>
        val mp = bits.indices.map(i => if (bits(i)) m(i) else one - m(i))
          .foldLeft(one)(_ * _)
        val up = bits.indices.map(i => if (bits(i)) u(i) else one - u(i))
          .foldLeft(one)(_ * _)
        val num = lam * mp
        val den = num + (one - lam) * up
        grid9(num.toDouble / den.toDouble)
      }
      // M: exact-decimal count·r sums, pinned double divisions
      val cr = census.zip(r).map { case ((_, c), ri) => BigDecimal(c) * ri }
      val srm = cr.sum
      val sru = BigDecimal(nTotal) - srm
      lam = grid9(srm.toDouble / nTotal.toDouble)
      m = fields.indices.map { i =>
        val num = census.zip(cr).collect {
          case ((bits, _), cri) if bits(i) => cri }.sum
        grid9(num.toDouble / srm.toDouble)
      }.toVector
      u = fields.indices.map { i =>
        val num = census.zip(r).collect {
          case ((bits, c), ri) if bits(i) => BigDecimal(c) * (one - ri) }.sum
        grid9(num.toDouble / sru.toDouble)
      }.toVector
    }
    // HALF_UP at 6 dp — the engine/oracle round(), NOT math.rint's
    // half-even
    def r6(x: Double): Double =
      BigDecimal(java.math.BigDecimal.valueOf(x))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = fields.indices.map { i =>
      (fields(i), m(i).toDouble, u(i).toDouble,
        r6(math.log(m(i).toDouble / u(i).toDouble)),
        r6(math.log((one - m(i)).toDouble / (one - u(i)).toDouble)),
        lam.toDouble)
    }
    val spark = pairs.sparkSession
    import spark.implicits._
    rows.toDF("field", "m_prob", "u_prob", "w_agree", "w_disagree",
      "lambda")
  }
}
