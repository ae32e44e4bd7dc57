package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key trend and seasonality analytics over bucketed counts.
  *
  * Both operators follow the engine's exact-arithmetic discipline: every
  * accumulation is an integer (exact in long), the closed-form statistics
  * are evaluated in double over those exact operands with a pinned
  * operation order, so results are bit-reproducible across engines — the
  * property the oracle gate hashes.
  */
object Trend {

  /** Closed-form per-key OLS (least squares) of `yCol` against `xCol` —
    * "is this key's volume trending up or down": one aggregation per key,
    * no iteration. `xCol` is re-based to the key's minimum inside the
    * aggregate, keeping every sum small and integer-exact. Keys need at
    * least two distinct x to have a defined slope; others are dropped.
    */
  def olsPerKey(df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val based = df
      .withColumn("__xb", col(xCol) -
        min(col(xCol)).over(Window.partitionBy(col(keyCol))))
      .select(col(keyCol), col("__xb").cast("long").as("x"),
        col(yCol).cast("long").as("y"))
    based
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        countDistinct(col("x")).as("nx"))
      .filter(col("nx") >= 2)
      .select(col(keyCol), col("n"),
        round((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("slope"))
  }

  /** Seasonal anomaly detection: each (key, bucket) count is compared to
    * the key's seasonal profile — the mean count for that bucket's
    * position in the season (e.g. hour-of-day) — and flagged when the
    * residual exceeds `k` times the key's residual standard deviation.
    * Everything derives from exact integer sums; the only roundings are
    * the final double divisions and sqrt, which are correctly rounded
    * and therefore engine-identical.
    */
  def seasonalAnomalies(
      counts: DataFrame,
      keyCol: String,
      bucketCol: String,
      seasonLen: Int,
      nCol: String,
      k: Double = 2.0): DataFrame = {
    val pos = pmod(col(bucketCol), lit(seasonLen.toLong))
    val withPos = counts.select(col(keyCol), col(bucketCol),
      pos.as("season_pos"), col(nCol).cast("double").as("n"))
    val seasonal = avg(col("n"))
      .over(Window.partitionBy(col(keyCol), col("season_pos")))
    val resid = col("n") - col("seasonal")
    val r = withPos
      .withColumn("seasonal", seasonal)
      .withColumn("resid", resid)
    // resid² is quantized onto an exact decimal grid BEFORE summation
    // (the engine-wide sumx pattern): each term's cast is a correctly
    // rounded op on identical doubles, and the decimal sum is exact and
    // order-independent — a raw double sum would drift with partition
    // order and flip boundary flags between engines
    val sd = sqrt(
      (sum((col("resid") * col("resid"))
        .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(28, 12)))
        .over(Window.partitionBy(col(keyCol))).cast("double")) /
        count(lit(1)).over(Window.partitionBy(col(keyCol))).cast("double"))
    r.withColumn("sd", sd)
      .select(col(keyCol), col(bucketCol),
        col("n").cast("long").as("n"),
        round(col("seasonal"), 6).as("seasonal"),
        (abs(col("resid")) > lit(k) * col("sd")).cast("int").as("anomaly"))
  }

  /** First-order Markov transition matrix over per-key ordered sequences:
    * every consecutive (state → next state) step within a key, counted
    * corpus-wide, with the conditional probability p = n / Σn(from).
    *
    * Shape at scale: ONE shuffle on the key for the lead() window, then an
    * aggregation whose cardinality is |states|² — metadata-sized however
    * large the input. The probability is a single correctly-rounded double
    * division of two exact integers, so it is engine-identical with no
    * rounding grid needed.
    */
  def markovTransitions(
      df: DataFrame,
      keyCol: String,
      orderCol: Column,
      tieCol: Column,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__o"), col("__t"))
    val steps = df
      .select(col(keyCol), orderCol.as("__o"), tieCol.as("__t"),
        col(stateCol).as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
    val counts = steps.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    // the window below runs over the |states|²-row aggregate, not the input
    val fromTot = sum(col("n")).over(Window.partitionBy(col("from_state")))
    counts
      .withColumn("n_from", fromTot)
      .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
  }
}
