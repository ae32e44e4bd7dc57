package graft

import org.apache.spark.sql.functions._

import graft.operators.Spatial

class SpatialSpec extends SparkSuite {
  import spark.implicits._

  // micro-degrees: 1_000_000 = 1°; radius 2° so the cell edge is 2°
  private val R = 2000000L

  private def pts(rows: (Long, Long, Long)*) =
    rows.toDF("id", "lat_u", "lon_u")

  private def sts(rows: (Long, Long, Long)*) =
    rows.toDF("sid", "lat_u", "lon_u")

  private def nearest(p: Seq[(Long, Long, Long)], s: Seq[(Long, Long, Long)]) =
    Spatial.nearestWithin(pts(p: _*), sts(s: _*), "id", "sid", "lat_u", "lon_u", R)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)

  test("picks the closest in-radius station, across a cell border") {
    // point sits at the very edge of its cell; the nearest station lives
    // in the NEIGHBORING cell — only the 3x3 replication can find it
    val got = nearest(
      p = Seq((1L, 100000L, 1990000L)),
      s = Seq((10L, 100000L, 2010000L), // 0.02° away, next cell over
        (20L, 100000L, 500000L))) // same cell but 1.49° away
    assert(got == Seq((1L, 10L, 20000L * 20000L)))
  }

  test("stations beyond the radius never match even in adjacent cells") {
    val got = nearest(
      p = Seq((1L, 0L, 0L)),
      s = Seq((10L, 0L, R + 1L))) // 1 micro-degree past the radius
    assert(got.isEmpty, "inner semantics: out-of-radius points are absent")
  }

  test("exact radius is inclusive and ties break to the smaller station id") {
    val got = nearest(
      p = Seq((1L, 0L, 0L)),
      s = Seq((30L, 0L, R), (20L, 0L, -R))) // equidistant, exactly at R
    assert(got == Seq((1L, 20L, R * R)))
  }

  test("negative coordinates tile correctly (floor cells, not truncation)") {
    // both sit just either side of the lat=0 cell border: truncation
    // toward zero would collapse them into one cell and still work, but a
    // station 2 cells away must NOT be reachable
    val got = nearest(
      p = Seq((1L, -100000L, -100000L)),
      s = Seq((10L, -100000L, -100000L - 2 * R - 500000L), // 2+ cells away
        (40L, 100000L, 100000L))) // adjacent cell, in radius
    assert(got == Seq((1L, 40L, 200000L * 200000L * 2)))
  }
}
