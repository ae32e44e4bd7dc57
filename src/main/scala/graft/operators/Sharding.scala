package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consistent-hash routing — the shard-assignment arithmetic every
  * horizontally-partitioned serving layer runs in front of the data this
  * engine produces (cache rings, feature stores, index shards).
  *
  * The property that matters: adding or removing ONE shard moves only the
  * keys that hashed into that shard's ring arcs (~1/S of the keyspace),
  * where a plain `hash mod S` reshuffles nearly everything. Virtual nodes
  * smooth the arc-length variance so shard loads concentrate near 1/S.
  */
object Sharding {

  /** 52-bit md5 hash — the engine's portable hash (both engines agree on
    * md5 and the 13-hex-char slice; 52 bits fit a double exactly).
    */
  private def h52(v: Column): Column =
    conv(substring(md5(v.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  /** Assign every key to a shard on the consistent-hash ring: each shard
    * plants `vnodes` ring points at h52("shard:i"); a key routes to the
    * first ring point at or after h52(key), wrapping to the ring minimum.
    *
    * The ring is (shards × vnodes) points — METADATA-sized — collected
    * into two parallel sorted arrays and broadcast, so routing is a
    * map-side O(V) array scan per row with zero shuffles: exactly what a
    * 1000-executor writer needs to route 100 TB without coordinating.
    * (Binary search would beat the linear filter at V in the thousands;
    * at the tens-to-hundreds typical for vnode rings the scan is already
    * cache-resident.) Everything is a pure md5 function, so executors,
    * re-runs, and the oracle route identically.
    */
  def ringAssign(
      df: DataFrame,
      keyCol: String,
      shards: Seq[String],
      vnodes: Int): DataFrame = {
    require(shards.nonEmpty && shards.distinct.size == shards.size)
    require(vnodes >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val ring = shards.flatMap(s => (0 until vnodes).map(i => (s, i)))
      .toDF("s", "i")
      .select(struct(
        h52(concat(col("s"), lit(":"), col("i").cast("string"))).as("r"),
        col("s").as("s")).as("p"))
      .agg(sort_array(collect_list(col("p"))).as("arr"))
      .select(transform(col("arr"), x => x.getField("r")).as("rings"),
        transform(col("arr"), x => x.getField("s")).as("ss"))
    df.select(col(keyCol))
      .crossJoin(broadcast(ring))
      .withColumn("__hk", h52(col(keyCol)))
      // index of the first ring point >= hk = count of points below it
      .withColumn("__c",
        size(filter(col("rings"), r => r < col("__hk"))))
      .withColumn("shard",
        when(col("__c") === size(col("rings")), element_at(col("ss"), 1))
          .otherwise(element_at(col("ss"), col("__c") + 1)))
      .select(col(keyCol), col("shard"))
  }

  /** RENDEZVOUS (highest-random-weight) routing — the other standard
    * consistent scheme: every key goes to argmax over shards of
    * h52(key "|" shard). No ring, no vnodes, PERFECT expected balance
    * (each shard wins exactly 1/S of the hash space), and the same
    * minimal-movement property as [[ringAssign]] — removing a shard
    * re-routes only the keys it was winning, because every other key's
    * argmax is untouched. Cost: S hashes per key instead of one, all
    * inside one row-local array expression (argmax = lexicographic max
    * of (hash, shard) structs) — still zero shuffles, still a pure md5
    * function the oracle replays.
    */
  def rendezvousAssign(
      df: DataFrame,
      keyCol: String,
      shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty && shards.distinct.size == shards.size)
    val cands = array(shards.map(s => struct(
      h52(concat(col(keyCol).cast("string"), lit("|"), lit(s))).as("h"),
      lit(s).as("s"))): _*)
    df.select(col(keyCol),
      array_max(cands).getField("s").as("shard"))
  }
}
