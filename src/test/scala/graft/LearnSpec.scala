package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.operators.Learn
import graft.streaming.{EventsStream, StreamVerify}

class LearnSpec extends SparkSuite {
  import spark.implicits._

  test("kMeans1D: two well-separated value bands land their slice-median " +
    "init and exact centroids/WSS") {
    val df = Seq(1L, 2L, 3L, 100L, 101L, 102L).toDF("v")
    val got = Learn.kMeans1D(df, "v", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 2)
    assert(got(0L).getLong(1) == 3L && got(0L).getDouble(2) == 2.0)
    assert(got(1L).getLong(1) == 3L && got(1L).getDouble(2) == 101.0)
    assert(got(0L).getDouble(3) == 2.0, "WSS = 1 + 0 + 1 per band")
    assert(got(1L).getDouble(3) == 2.0)
  }

  test("pca2: an exact y = 2x cloud reads explained_share 1 and the " +
    "(1,2)/sqrt(5) axis") {
    val df = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val r = Learn.pca2(df, "x", "y").head()
    assert(r.getDouble(1) == 1.25 && r.getDouble(2) == 5.0 &&
      r.getDouble(3) == 2.5, s"population moments: $r")
    assert(r.getDouble(6) == 1.0, s"a 1-D cloud explains fully: $r")
    assert(math.abs(r.getDouble(7) - 0.447214) < 1e-6 &&
      math.abs(r.getDouble(8) - 0.894427) < 1e-6, s"axis: $r")
  }

  test("ols3: a planted y = 2 + 3x1 - x2 + 4x3 recovers every " +
    "coefficient with r2 = 1; a collinear design reads NULL") {
    val xs = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (1L, 1L, 0L), (1L, 0L, 1L), (2L, 1L, 1L), (3L, 1L, 0L))
    val df = xs.map { case (a, b, c) => (2L + 3 * a - b + 4 * c, a, b, c) }
      .toDF("y", "x1", "x2", "x3")
    val r = Learn.ols3(df, "y", "x1", "x2", "x3").head()
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == -1.0 &&
      r.getDouble(3) == 4.0, s"betas: $r")
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 1.0, s"fit: $r")
    val col3 = xs.map { case (a, b, c) => (2L + 3 * a - b + 4 * a, a, b, a) }
      .toDF("y", "x1", "x2", "x3")
    val d = Learn.ols3(col3, "y", "x1", "x2", "x3").head()
    assert(d.isNullAt(1) && d.isNullAt(5), s"singular design NULLs: $d")
  }

  test("mahalanobis2: the against-the-correlation outlier outranks an " +
    "equally-far along-the-cloud point; collinear features refuse") {
    // tight y = x cloud; A displaced ALONG it, B the same Euclidean
    // distance ACROSS it
    val cloud = (0L to 9L).map(i => (i, i, i + (i % 2)))
    val df = (cloud :+ (100L, 14L, 14L) :+ (101L, 14L, 5L))
      .toDF("id", "x", "y")
    val got = Learn.mahalanobis2(df, "id", "x", "y", topK = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(101L) > got(100L),
      s"covariance-aware distance must flag the cross-cloud point: $got")
    val collinear = (0L to 9L).map(i => (i, i, 2 * i)).toDF("id", "x", "y")
    assertThrows[IllegalArgumentException] {
      Learn.mahalanobis2(collinear, "id", "x", "y")
    }
  }

  test("decisionStump: a perfectly separable label splits at the band " +
    "edge with gain = root Gini") {
    val df = (Seq(1L, 2L, 3L, 4L).map((_, false)) ++
      Seq(10L, 11L, 12L, 13L).map((_, true))).toDF("v", "lab")
    val r = Learn.decisionStump(df, "v", col("lab")).head()
    assert(r.getLong(0) == 4L, s"split at the last left value: $r")
    assert(r.getLong(2) == 4L && r.getLong(3) == 4L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == 0.5 && r.getDouble(7) == 0.5,
      s"a 50/50 label has root Gini 0.5, fully recovered: $r")
  }

  test("lda2: classes displaced along x read an x-dominant unit " +
    "direction and the planted gap") {
    // within-class xy-covariance is exactly zero by construction, so
    // the pooled whitening leaves the x displacement untouched
    val c0 = Seq((0L, 0L), (1L, 1L), (2L, 1L), (3L, 0L)).map {
      case (x, y) => (0L, x, y)
    }
    val c1 = Seq((10L, 0L), (11L, 1L), (12L, 1L), (13L, 0L)).map {
      case (x, y) => (1L, x, y)
    }
    val r = Learn.lda2((c0 ++ c1).toDF("g", "x", "y"),
      col("g") === 1L, "x", "y").head()
    assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 0.0,
      s"planted mean gap: $r")
    assert(math.abs(r.getDouble(2)) > 0.9, s"x carries the split: $r")
    assert(r.getDouble(6) > 5.0, s"Fisher separation: $r")
  }

  test("silhouette1D: tight separated bands read near-1 silhouettes, " +
    "one merged band reads visibly worse") {
    val tight = (Seq(1L, 2L, 3L) ++ Seq(200L, 201L, 202L) ++
      Seq(400L, 401L, 402L) ++ Seq(600L, 601L, 602L)).toDF("v")
    val got = Learn.silhouette1D(tight, "v", k = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 4)
    assert(got.values.forall(_ > 0.95), s"tight bands: $got")
    // two true bands forced into k=4: split clusters sit next to their
    // twin, so their silhouettes collapse
    val merged = (Seq(1L, 2L, 3L, 4L, 5L, 6L) ++
      Seq(600L, 601L, 602L, 603L, 604L, 605L)).toDF("v")
    val m = Learn.silhouette1D(merged, "v", k = 4, iters = 3)
      .collect().map(_.getDouble(2))
    assert(m.exists(_ < 0.6), s"over-split bands must read poorly: ${m.toSeq}")
  }

  test("daviesBouldin: separated bands score far lower (better) than " +
    "overlapping ones") {
    val sep = Learn.daviesBouldin(Learn.kMeans1D(
      (Seq(1L, 2L, 3L) ++ Seq(200L, 201L, 202L) ++ Seq(400L, 401L, 402L) ++
        Seq(600L, 601L, 602L)).toDF("v"), "v", k = 4, iters = 3)).head()
    assert(sep.getLong(0) == 4L)
    assert(sep.getDouble(1) < 0.05, s"tight bands: $sep")
    val blur = Learn.daviesBouldin(Learn.kMeans1D(
      (1L to 40L).toDF("v"), "v", k = 4, iters = 3)).head()
    assert(blur.getDouble(1) > 0.5, s"a uniform smear scores poorly: $blur")
  }

  test("kMeansElbow: three true bands put the curvature knee at k = 3 " +
    "with WSS collapsing there") {
    val df = (Seq(1L, 2L, 3L, 4L) ++ Seq(300L, 301L, 302L, 303L) ++
      Seq(600L, 601L, 602L, 603L)).toDF("v")
    val got = Learn.kMeansElbow(df, "v", ks = 2 to 5, iters = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(3)) None else Some(r.getBoolean(3))))
      .toMap
    assert(got.size == 4)
    assert(got(3L)._1 < got(2L)._1 / 10.0,
      s"WSS must collapse at the true k: $got")
    assert(got(3L)._2 == Some(true) &&
      got(4L)._2 == Some(false), s"knee at 3: $got")
  }

  test("huberLocation: one wild outlier barely moves the Huber center " +
    "but drags the mean; zero MAD reports the median") {
    val df = (Seq.fill(1)(100000L) ++ (1L to 20L).map(i => 100L + i))
      .toDF("v")
    val r = Learn.huberLocation(df, "v").head()
    assert(r.getLong(1) == 111L, s"median: $r")
    assert(r.getDouble(4) < 130.0, s"huber center resists the outlier: $r")
    assert(r.getDouble(5) > 4000.0, s"the mean does not: $r")
    val flat = Seq.fill(5)(7L).toDF("v")
    val f = Learn.huberLocation(flat, "v").head()
    assert(f.getLong(2) == 0L && f.isNullAt(3) && f.getDouble(4) == 7.0,
      s"zero MAD reports the median outright: $f")
  }

  test("gmm2: two planted clumps recover their means, weights and " +
    "spreads; a degenerate quartile split refuses") {
    import spark.implicits._
    // 20 rows around 10 and 40 rows around 50 — EM from the quartile
    // init must land the clump means, the 1/3-2/3 weights, and unit-ish
    // within-clump variances
    val low = Seq.fill(6)(9L) ++ Seq.fill(8)(10L) ++ Seq.fill(6)(11L)
    val high = Seq.fill(12)(49L) ++ Seq.fill(16)(50L) ++ Seq.fill(12)(51L)
    val got = graft.operators.Learn.gmm2(
      (low ++ high).toDF("v"), "v").collect()
    assert(got.length == 2)
    val c1 = got(0); val c2 = got(1)
    assert(math.abs(c1.getDouble(3) - 10.0) < 0.3 &&
      math.abs(c2.getDouble(3) - 50.0) < 0.3,
      s"clump means: ${got.toSeq}")
    assert(math.abs(c1.getDouble(2) - 1.0 / 3.0) < 0.05 &&
      math.abs(c1.getDouble(2) + c2.getDouble(2) - 1.0) < 1e-9,
      s"weights: ${got.toSeq}")
    assert(c1.getDouble(4) < 2.0 && c2.getDouble(4) < 2.0,
      s"within-clump variances stay tight: ${got.toSeq}")
    assert(c1.getDouble(5) > 10.0, s"separation: ${got.toSeq}")
    intercept[IllegalArgumentException] {
      graft.operators.Learn.gmm2(
        Seq.fill(20)(7L).toDF("v"), "v").collect()
    }
  }

  test("yule-walker stream store: hourly censuses add; drain equals " +
    "batch on the dense spine") {
    import org.apache.spark.sql.{Row => R}
    val dir = Files.createTempDirectory("graft_yw_src")
    def writeFile(name: String, rows: Seq[(Long, Long, String)]): Unit = {
      val side = Files.createTempDirectory("graft_yw_side").toString
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (id, sec, et) =>
            R(id, EventsStream.ntzOfEpochSec(sec), 1L, et, 0.0, null) }, 1),
        EventsStream.rawEventsSchema)
        .write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, dir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    // 8 hours of a period-2 volume cycle for one type, split so hour
    // censuses STRADDLE the two files (partial counts must add)
    val evs = (0 until 40).map { i =>
      (i.toLong, i.toLong / 5 * 3600L + (i % 5) * 60L, "click")
    }
    writeFile("a.parquet", evs.filter(_._1 % 2 == 0L))
    writeFile("b.parquet", evs.filter(_._1 % 2 == 1L))
    val scratch = Files.createTempDirectory("graft_yw_store").toString + "/s"
    val drained = StreamVerify.yuleWalkerMaintenance(
      spark, dir.toString, scratch).collect().toSeq
    val batch = {
      val h = evs.map { case (_, sec, et) => (et, sec / 3600L) }
        .toDF("event_type", "hour_id")
      val cen = h.groupBy(col("event_type"), col("hour_id"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Trend.yuleWalkerAr2(
        cen, "event_type", "hour_id", "n").collect().toSeq
    }
    assert(drained.map(_.toSeq) == batch.map(_.toSeq),
      s"drain $drained vs batch $batch")
    // the MA twin drains the SAME census shape; its fit must equal the
    // one-pass batch ma1Fit bit for bit too
    val scratch2 = Files.createTempDirectory("graft_ma_store").toString + "/s"
    val drainedMa = StreamVerify.ma1Maintenance(
      spark, dir.toString, scratch2).collect().toSeq
    val batchMa = {
      val h = evs.map { case (_, sec, et) => (et, sec / 3600L) }
        .toDF("event_type", "hour_id")
      val cen = h.groupBy(col("event_type"), col("hour_id"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Trend.ma1Fit(
        cen, "event_type", "hour_id", "n").collect().toSeq
    }
    assert(drainedMa.map(_.toSeq) == batchMa.map(_.toSeq),
      s"MA drain $drainedMa vs batch $batchMa")
    // the Erlang staffing twin drains the same census shape too
    val scratch3 = Files.createTempDirectory("graft_erl_store").toString + "/s"
    val drainedErl = StreamVerify.erlangMaintenance(
      spark, dir.toString, scratch3).collect().toSeq
    val batchErl = {
      val h = evs.map { case (_, sec, et) => (et, sec / 3600L) }
        .toDF("event_type", "hour_id")
      val cen = h.groupBy(col("event_type"), col("hour_id"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Relational.erlangStaffing(
        cen, "event_type", "n",
        serviceTimeSec = 300.0, targetWait = 0.2).collect().toSeq
    }
    assert(drainedErl.map(_.toSeq) == batchErl.map(_.toSeq),
      s"Erlang drain $drainedErl vs batch $batchErl")
  }
}
