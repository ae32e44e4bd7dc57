package graft

import org.apache.spark.sql.functions._

import graft.operators.{Features, Privacy}

class FeaturesSpec extends SparkSuite {
  import spark.implicits._

  test("hashedFeatures: indices bounded, values nonzero, deterministic") {
    val df = Seq((1L, "AUTO", 3), (2L, "HOUSE", 3), (3L, "AUTO", 7))
      .toDF("k", "seg", "nat")
    val feats = Seq(concat(lit("seg:"), col("seg")),
      concat(lit("nat:"), col("nat").cast("string")))
    val out = Features.hashedFeatures(df, "k", feats, dim = 8)
      .as[(Long, Long, Long)].collect().sorted
    assert(out.nonEmpty)
    assert(out.forall { case (_, idx, v) => idx >= 0 && idx < 8 && v != 0 })
    // per key, total mass ≤ number of features (collisions only cancel)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(r => math.abs(r._3)).sum <= 2)
    }
    val again = Features.hashedFeatures(df, "k", feats, dim = 8)
      .as[(Long, Long, Long)].collect().sorted
    assert(out.sameElements(again))
  }

  test("hashedFeatures: identical feature strings collide to identical cells") {
    val df = Seq((1L, "X"), (2L, "X")).toDF("k", "f")
    val out = Features.hashedFeatures(df, "k", Seq(col("f")), dim = 16)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 2)
    assert(out.map(_._2).distinct.length == 1) // same bucket
    assert(out.map(_._3).distinct.length == 1) // same sign
  }

  test("dpNoisyCounts: deterministic, bounded noise, salt-sensitive") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val a = Privacy.dpNoisyCounts(ev, "event_type", 1.0, "s1")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val b = Privacy.dpNoisyCounts(ev, "event_type", 1.0, "s1")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(a.sameElements(b)) // retry-stable: the DP-budget property
    // Laplace(1) tail at 52-bit resolution cannot exceed 52·ln2 ≈ 36.04
    assert(a.forall { case (_, n, noisy) => math.abs(noisy - n) <= 37.0 })
    val c = Privacy.dpNoisyCounts(ev, "event_type", 1.0, "s2")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(!a.map(_._3).sameElements(c.map(_._3))) // fresh release, fresh draw
  }

  test("binaryMetrics: perfect separation and the tie-averaged AUC") {
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("score", "lab")
    val m = Features.binaryMetrics(perfect, "score", col("lab"), 2.5)
      .collect()(0)
    assert((m.getLong(2), m.getLong(3), m.getLong(4), m.getLong(5)) ==
      ((2L, 0L, 0L, 2L)))
    assert(m.getDouble(6) == 1.0 && m.getDouble(7) == 1.0 &&
      m.getDouble(8) == 1.0 && m.getDouble(9) == 1.0)
    // fully tied within each score value: AUC must be exactly chance
    val tied = Seq((1.0, false), (1.0, true), (2.0, false), (2.0, true))
      .toDF("score", "lab")
    val t = Features.binaryMetrics(tied, "score", col("lab"), 1.5)
      .collect()(0)
    assert(t.getDouble(9) == 0.5, s"tie-averaged AUC should be 0.5, got $t")
  }

  test("policyReplay: hash policy scored exactly against a replayed log") {
    val actions = Seq("a", "b", "c")
    // the same h52-mod rule the operator evaluates, recomputed in plain JVM
    def pol(ctx: String): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(ctx.getBytes("UTF-8")).map("%02x".format(_)).mkString
      actions((java.lang.Long.parseLong(hex.substring(0, 13), 16) % 3).toInt)
    }
    // every context logs each action once, with action-dependent reward,
    // so exactly one row per context matches the deterministic policy
    val users = Seq("u1", "u2", "u3", "u4", "u5")
    val rows = for { u <- users; (a, i) <- actions.zipWithIndex }
      yield (u, a, 100L * (i + 1))
    val r = Features.policyReplay(rows.toDF("ctx", "act", "cents"),
      "ctx", "act", "cents", actions).head()
    val matchedSum = users.map(u => 100L * (actions.indexOf(pol(u)) + 1)).sum
    assert(r.getLong(0) == 15L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == math.rint(5.0 / 15.0 * 1e6) / 1e6)
    assert(r.getDouble(3) == math.rint(matchedSum / 5.0 * 1e6) / 1e6)
    assert(r.getDouble(4) == math.rint(600.0 * 5 / 15.0 * 1e6) / 1e6)
  }

  test("cuped: perfectly predictive covariate zeroes the variance") {
    // y = 2x pooled: theta = 2, adjusted variance 0, and both arms'
    // adjusted means equalize at the pooled mean of y
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("b", 3L, 6L),
      ("b", 4L, 8L)).toDF("arm", "x", "y")
    val got = Features.cuped(df, "arm", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("a") == ((2L, 3.0, 5.0, 2.0, 0.0)))
    assert(got("b") == ((2L, 7.0, 5.0, 2.0, 0.0)))
  }

  test("conformalInterval: JVM-replayed split, exact rank, coverage") {
    def trainSide(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cf:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16) % 2 == 0
    }
    val rows = (1L to 40L).map(id => ("g", id, id * 10L))
    val r = Features.conformalInterval(rows.toDF("g", "y_id", "cents")
      .select(col("g"), col("cents"), col("y_id")),
      "g", "cents", "y_id", alphaBp = 1000, salt = "cf").head()
    val (train, cal) = (1L to 40L).partition(trainSide)
    val pred = BigDecimal(train.map(_ * 10).sum.toDouble / train.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val resids = cal.map(id => (BigDecimal(id * 10) - pred).abs).sorted
    val rk = math.min(cal.size, (cal.size + 1) * 9 / 10 +
      (if ((cal.size + 1) * 9 % 10 == 0) 0 else 1))
    val qhat = resids(rk - 1)
    assert(r.getLong(1) == train.size.toLong &&
      r.getLong(2) == cal.size.toLong)
    assert(r.getDouble(3) == pred.toDouble)
    assert(r.getDouble(4) == qhat.toDouble)
    assert(r.getDouble(5) == (pred - qhat).toDouble &&
      r.getDouble(6) == (pred + qhat).toDouble)
    val within = cal.count(id => (BigDecimal(id * 10) - pred).abs <= qhat)
    assert(r.getDouble(7) ==
      math.rint(within.toDouble / cal.size * 1e6) / 1e6)
    assert(r.getDouble(7) >= 0.9, "conformal guarantee on calibration")
  }

  test("ipsEval: empirical-propensity reweighting on a skewed log") {
    val actions = Seq("a", "b", "c")
    def pol(ctx: String): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(ctx.getBytes("UTF-8")).map("%02x".format(_)).mkString
      actions((java.lang.Long.parseLong(hex.substring(0, 13), 16) % 3).toInt)
    }
    val users = Seq("u1", "u2", "u3", "u4", "u5")
    // skewed logging: action "a" logged twice per user (propensity 1/2,
    // others 1/4 each), with action-dependent reward
    val rows = users.flatMap { u =>
      actions.zipWithIndex.map { case (a, i) => (u, a, 100L * (i + 1)) } :+
        ((u, "a", 100L))
    }
    val r = Features.ipsEval(rows.toDF("ctx", "act", "cents"),
      "ctx", "act", "cents", actions).head()
    // expected from the same formula, decimal-exact via BigDecimal
    val byA = rows.groupBy(_._2)
    def grid(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ips = actions.map { a =>
      val rs = byA(a)
      val s = rs.filter { case (u, act, _) => pol(u) == act }.map(_._3).sum
      grid(BigDecimal(s.toDouble / rs.size))
    }.sum
    val w = actions.map { a =>
      val rs = byA(a)
      val m = rs.count { case (u, act, _) => pol(u) == act }
      grid(BigDecimal(m.toDouble / rs.size))
    }.sum
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == users.count(u => pol(u) == "a") * 2 +
      users.count(u => pol(u) != "a"))
    assert(r.getDouble(2) == grid(ips).toDouble)
    assert(r.getDouble(3) ==
      math.rint(ips.toDouble / w.toDouble * 1e6) / 1e6)
    val total = rows.map(_._3).sum
    assert(r.getDouble(4) == math.rint(total / 20.0 * 1e6) / 1e6)
  }

  test("conformalFromCensus equals the row-level conformalInterval exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1L to 400L).map(id =>
      (if (id % 2 == 0) "a" else "b", id, rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "id", "cents")
    val byRows = graft.operators.Features
      .conformalInterval(df, "g", "cents", "id", 1000, "conf")
      .collect().map(_.toSeq).toSet
    // the census a stream would maintain: (g, train, y) -> t
    val h = org.apache.spark.sql.functions.conv(
      substring(md5(concat(lit("conf:"), col("id").cast("string"))
        .cast("binary")), 1, 13), 16, 10).cast("long")
    val census = df.select(col("g"), col("cents").as("y"),
        (pmod(h, lit(2L)) === 0L).as("train"))
      .groupBy(col("g"), col("train"), col("y"))
      .agg(count(lit(1)).as("t"))
    val byCensus = graft.operators.Features
      .conformalFromCensus(census, 1000)
      .collect().map(_.toSeq).toSet
    assert(byRows == byCensus)
  }

  test("quantileNormalize: hand-checked pooled order-statistic mapping") {
    import spark.implicits._
    // A = [1,2,3,4], B = [10,20]; pooled sorted = 1,2,3,4,10,20 (N=6)
    // A ranks 1..4 -> p = ceil(rn*6/4) = 2,3,5,6 -> 2,3,10,20
    // B ranks 1..2 -> p = ceil(rn*6/2) = 3,6   -> 3,20
    val df = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 3L), ("A", 4L, 4L),
      ("B", 5L, 10L), ("B", 6L, 20L)).toDF("g", "id", "v")
    val out = graft.operators.Features
      .quantileNormalize(df, "g", "id", "v", bucketSize = 2L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 2L, 2L -> 3L, 3L -> 10L, 4L -> 20L,
      5L -> 3L, 6L -> 20L))
    // the max rank of every group lands exactly on the pooled max
    // (p = N), and ties resolve by id so the mapping is deterministic
  }

  test("rareCollapse: tail folds into __other__, kept levels pass through") {
    import spark.implicits._
    val df = (Seq.fill(5)("red") ++ Seq.fill(3)("blue") ++
      Seq("green", "teal", "teal")).toDF("c")
    val got = graft.operators.Features.rareCollapse(df, Seq("c"), 3L)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(got("red").getLong(2) == 5L && !got("red").getBoolean(4))
    assert(got("blue").getLong(2) == 3L) // exactly at support keeps
    val other = got("__other__")
    assert(other.getLong(2) == 3L && other.getLong(3) == 2L)
    assert(other.getBoolean(4))
    assert(!got.contains("green") && !got.contains("teal"))
  }

  test("stumpSplit: the clean boundary wins with the full parent gini") {
    import spark.implicits._
    def blk(b: Long, n: Int, pos: Int) =
      (1 to n).map(i => (b, if (i <= pos) 1L else 0L))
    val df = (blk(1L, 10, 0) ++ blk(2L, 10, 0) ++ blk(3L, 10, 10) ++
      blk(4L, 10, 10)).toDF("b", "y")
    val r = graft.operators.Features.stumpSplit(df, col("b"), col("y"))
      .head()
    assert(r.getLong(0) == 2L, "the clean cut is at bucket 2")
    assert(r.getLong(1) == 20L && r.getLong(2) == 20L)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 0.5)
  }

  test("classifierSuite: balanced 8/2/2/8 confusion lands MCC 0.6") {
    import spark.implicits._
    val rows = Seq.fill(8)((1.0, true)) ++ Seq.fill(2)((1.0, false)) ++
      Seq.fill(2)((0.0, true)) ++ Seq.fill(8)((0.0, false))
    val df = rows.toDF("score", "lab")
    val r = graft.operators.Features.classifierSuite(df, "score",
      col("lab"), 0.5).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((8L, 2L, 2L, 8L)))
    assert(r.getDouble(4) == 0.8 && r.getDouble(5) == 0.5)
    assert(r.getDouble(6) == 0.6) // (64−4)/√10⁴
    assert(r.getDouble(7) == 0.6 && r.getDouble(8) == 0.8)
    assert(r.getDouble(9) == 0.8 && r.getDouble(10) == 0.8)
    assert(r.getDouble(11) == 0.8)
    // no positives at all: the positive-side metrics refuse
    val neg = Seq.fill(4)((0.3, false)).toDF("score", "lab")
    val n = graft.operators.Features.classifierSuite(neg, "score",
      col("lab"), 0.5).head()
    assert(n.isNullAt(7) && n.isNullAt(8) && n.isNullAt(11))
  }

  test("plattScaling: a symmetric S-curve centers near its midpoint " +
    "and every step moves") {
    import spark.implicits._
    def cell(s: Long, n: Int, pos: Int) =
      (1 to n).map(i => (s, if (i <= pos) 1L else 0L))
    val df = (cell(0L, 10, 1) ++ cell(1L, 10, 5) ++ cell(2L, 10, 9))
      .toDF("s", "y")
    val r = graft.operators.Features.plattScaling(df, col("s"), col("y"))
      .head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 30L && r.getLong(2) == 15L)
    assert(r.getLong(3) == 8L, s"all Newton steps should move: $r")
    val (a, b) = (r.getDouble(4), r.getDouble(5))
    assert(b > 1.0, s"the curve must rise: b=$b")
    val pMid = 1.0 / (1.0 + math.exp(-(a + b * 1.0)))
    assert(math.abs(pMid - 0.5) < 0.05,
      s"midpoint must calibrate to ~0.5: $pMid")
    val pHi = 1.0 / (1.0 + math.exp(-(a + b * 2.0)))
    assert(math.abs(pHi - 0.9) < 0.05, s"s=2 must read ~0.9: $pHi")
  }
}
