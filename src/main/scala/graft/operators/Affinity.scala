package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket affinity mining: association rules and item-item
  * neighbor lists from (basket, item) co-occurrence — the level-2
  * Apriori pass (support → confidence → lift) and the item-based
  * collaborative-filtering neighborhood every recommender bootstrap
  * starts from.
  *
  * Scale shape: the pair generator is a self-equi-join on the basket key
  * (one shuffle, never all-pairs across baskets); per-basket pair count
  * is quadratic only in the ITEMS-PER-BASKET bound, which a real catalog
  * caps (here: the 25-brand domain). Everything after the pair aggregate
  * is item-domain-sized. All scores are fixed-order double arithmetic
  * over exact integer counts, rounded to the 1e-6 grid — engine-exact.
  */
object Affinity {

  /** Pairwise co-occurrence counts from a (basket, item) relation:
    * one row per unordered pair (item_a < item_b) with its basket count.
    * Input rows are de-duplicated first so a basket counts once per pair.
    */
  def pairCounts(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val b = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it")).distinct()
    b.as("l").join(b.as("r"),
        col("l.__bk") === col("r.__bk") && col("l.__it") < col("r.__it"))
      .groupBy(col("l.__it").as("item_a"), col("r.__it").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
  }

  /** Association rules in BOTH orientations for every pair with
    * `n_ab >= minSupport`: support (share of baskets), confidence
    * P(cons|ante) and lift conf/P(cons). One basket-keyed shuffle for
    * pairs, one for item supports; the rule table is item-domain-sized.
    */
  def assocRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1L)
    val b = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it")).distinct()
    val supp = b.groupBy(col("__it")).agg(count(lit(1)).as("n_i"))
    val totals = b.agg(count_distinct(col("__bk")).as("n_baskets"))
    val pairs = pairCounts(df, basketCol, itemCol)
      .filter(col("n_ab") >= minSupport)
    val rules = pairs.select(col("item_a").as("ante"), col("item_b").as("cons"),
        col("n_ab"))
      .unionByName(pairs.select(col("item_b").as("ante"),
        col("item_a").as("cons"), col("n_ab")))
    rules
      .join(supp.withColumnRenamed("n_i", "n_ante"), col("ante") === col("__it"))
      .drop("__it")
      .join(supp.withColumnRenamed("n_i", "n_cons"), col("cons") === col("__it"))
      .drop("__it")
      .crossJoin(broadcast(totals))
      .select(col("ante"), col("cons"), col("n_ab"), col("n_ante"), col("n_cons"),
        round(col("n_ab").cast("double") / col("n_baskets").cast("double"), 6)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_ante").cast("double"), 6)
          .as("confidence"),
        round(col("n_ab").cast("double") * col("n_baskets").cast("double") /
          (col("n_ante").cast("double") * col("n_cons").cast("double")), 6)
          .as("lift"))
  }

  /** Item-item top-k neighbors by co-occurrence cosine
    * `n_ab / sqrt(n_a · n_b)` — the precomputed neighborhood an
    * item-based recommender serves lookups from. The ranking window is
    * keyed per item (no global sort); ties break on the neighbor id.
    */
  def itemNeighbors(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val b = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it")).distinct()
    val supp = b.groupBy(col("__it")).agg(count(lit(1)).as("n_i"))
    val pairs = pairCounts(df, basketCol, itemCol)
    val both = pairs.select(col("item_a").as("item"), col("item_b").as("neighbor"),
        col("n_ab"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("n_ab")))
    val scored = both
      .join(supp.withColumnRenamed("n_i", "n_item"), col("item") === col("__it"))
      .drop("__it")
      .join(supp.withColumnRenamed("n_i", "n_neighbor"),
        col("neighbor") === col("__it"))
      .drop("__it")
      .withColumn("cosine",
        round(col("n_ab").cast("double") /
          sqrt(col("n_item").cast("double") * col("n_neighbor").cast("double")),
          6))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("neighbor"), col("n_ab"), col("cosine"))
  }

  /** EVENTUALLY-FOLLOWS graph — the process-mining primitive under every
    * conformance/bottleneck analysis: for each ordered activity pair
    * (a, b), how many cases saw a STRICTLY before b (first occurrences
    * compared). [[pairCounts]] is unordered co-presence and q222's
    * Markov transitions are ADJACENT steps; eventually-follows is the
    * transitive "a precedes b somewhere" relation that exposes long-range
    * process order. Cost: one map-side-combined (case, activity) →
    * min-time census — after it everything is (cases × activities)-sized,
    * and the per-case self-join fans out at most |activities|² per case.
    * Equal first-occurrence times count in NEITHER direction (strict <),
    * keeping the relation antisymmetric and engine-independent.
    */
  def eventuallyFollows(
      df: DataFrame,
      caseCol: String,
      activityCol: String,
      tCol: String): DataFrame = {
    val firsts = df
      .groupBy(col(caseCol).as("c"), col(activityCol).as("act"))
      .agg(min(col(tCol).cast("long")).as("t"))
    val nCases = firsts.select(col("c")).distinct().count()
    firsts.as("x").join(firsts.as("y"),
        col("x.c") === col("y.c") && col("x.act") =!= col("y.act") &&
          col("x.t") < col("y.t"))
      .groupBy(col("x.act").as("a"), col("y.act").as("b"))
      .agg(count(lit(1)).as("n_cases"))
      .select(col("a"), col("b"), col("n_cases"),
        round(col("n_cases").cast("double") / lit(nCases.toDouble), 6)
          .as("case_share"))
  }
}
