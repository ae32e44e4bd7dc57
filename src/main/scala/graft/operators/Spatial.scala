package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial join: nearest-station lookup without a theta join.
  *
  * The reference's domain is weather observations keyed by city coordinates
  * (/root/reference/src/bronze/api_data/analytics__world_weather.py lat/lon
  * request params); the canonical large-scale operation over such data is
  * "join every point to its nearest station within a radius". The naive
  * formulation is a cross join with a distance predicate — a broadcast
  * nested loop that dies at scale. This operator uses the standard grid
  * trick instead:
  *
  *   - coordinates are integer micro-degrees (1e-6°), so all cell math and
  *     the distance metric are exact integer arithmetic — bit-identical on
  *     any engine, which is what lets the DuckDB oracle replay it;
  *   - the grid cell edge equals the search radius, so a point's nearest
  *     in-radius station is guaranteed to sit in the point's own cell or
  *     one of its 8 neighbors;
  *   - the SMALL side (stations) is replicated into its 3×3 neighborhood
  *     (constant 9× on the small side, never on the points), then a plain
  *     equi-join on the cell key brings candidates together: shuffle is by
  *     cell, candidate count is bounded by station density per cell, and
  *     there is no O(points × stations) blowup anywhere;
  *   - per-point argmin with a deterministic (distance, station id) tie
  *     break.
  *
  * The metric is squared planar distance in micro-degrees. At 100 TB the
  * formula would be haversine and the cell width would widen by 1/cos(lat)
  * per latitude band — both swap in without touching the join shape, which
  * is the part that matters for scale. Longitude wrap at ±180° is not
  * stitched (points near the antimeridian miss stations across it);
  * production would add the wrapped duplicate cells the same way the 3×3
  * neighborhood is built.
  */
object Spatial {

  /** `points(idCol, latCol, lonCol)` × `stations(stationCol, latCol,
    * lonCol)` → (id, station, dist2) for the nearest station within
    * `radiusMicroDeg`, planar squared distance. Points outside every
    * station's radius are absent (inner semantics — callers left-join back
    * if they need misses).
    *
    * Coordinates must be LONG micro-degrees; with |lat| ≤ 90e6 and
    * |lon| ≤ 180e6 the squared sum stays far inside Long range. Rows with
    * a NULL coordinate on either side get a null cell key and drop out of
    * the equi-join — same absent-result semantics as an out-of-radius
    * point (geocode before joining if those rows must surface).
    */
  def nearestWithin(
      points: DataFrame,
      stations: DataFrame,
      idCol: String,
      stationCol: String,
      latCol: String,
      lonCol: String,
      radiusMicroDeg: Long): DataFrame = {
    require(radiusMicroDeg > 0, "radius must be positive")
    val r = radiusMicroDeg
    // floor division (not `div`, which truncates toward zero): cells must
    // tile uniformly across negative coordinates too
    def cell(c: String) = floor(col(c).cast("double") / r.toDouble).cast("long")
    val p = points.select(
      col(idCol), col(latCol).as("p_lat"), col(lonCol).as("p_lon"),
      cell(latCol).as("cr"), cell(lonCol).as("cc"))
    // replicate the small side into its 3×3 neighborhood so the probe side
    // maps each point to exactly ONE cell (no point-side explosion)
    val offsets = Seq(-1L, 0L, 1L)
    val s = stations.select(
      col(stationCol), col(latCol).as("s_lat"), col(lonCol).as("s_lon"),
      cell(latCol).as("scr"), cell(lonCol).as("scc"))
      .withColumn("d", explode(lit(offsets.flatMap(a => offsets.map(b => (a, b)))
        .map { case (a, b) => s"$a,$b" }.toArray)))
      .select(col(stationCol), col("s_lat"), col("s_lon"),
        (col("scr") + split(col("d"), ",").getItem(0).cast("long")).as("cr"),
        (col("scc") + split(col("d"), ",").getItem(1).cast("long")).as("cc"))
    val dlat = col("p_lat") - col("s_lat")
    val dlon = col("p_lon") - col("s_lon")
    p.join(s, Seq("cr", "cc"))
      .withColumn("dist2", dlat * dlat + dlon * dlon)
      .filter(col("dist2") <= lit(r * r))
      .groupBy(col(idCol))
      .agg(min(struct(col("dist2"), col(stationCol))).as("best"))
      .select(col(idCol), col(s"best.$stationCol").as(stationCol),
        col("best.dist2").as("dist2"))
  }
}
