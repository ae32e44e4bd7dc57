package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.sources.TxLake
import graft.streaming.StreamVerify

/** Per-batch COMMIT-SIZE locks for the self-maintaining streaming stores.
  * The exactly-once and batching-invariance claims are spec-proven
  * elsewhere; these assert the commit COST the scale posture depends on:
  * sufficient-statistic stores commit O(domain) rows per batch whatever
  * the batch size, and the components store commits only its batch DELTA
  * — never a rewrite of the standing state (the r9 O(state)-per-batch
  * surface, retired).
  */
class StreamStoreSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("prop-effects store: 1-row cell commits; drain equals batch") {
    // arms/conversions split across two files however they fall — the
    // four cells add, so the drained readout must equal the one-pass one
    val rows = Seq((0L, 0L, 1L), (1L, 0L, 0L), (2L, 1L, 1L), (3L, 1L, 0L),
      (4L, 0L, 1L), (5L, 1L, 1L), (6L, 0L, 0L), (7L, 1L, 0L),
      (8L, 0L, 1L), (9L, 1L, 1L)).toDF("id", "arm", "conv")
    val src = tmp("pe_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"pe_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("pe_store") + "/s"
    val drained = StreamVerify.propEffectsMaintenance(spark, src, scratch)
      .head()
    val batch = graft.operators.Drift.propEffects(rows.drop("id"),
      col("arm") === 0L, col("conv")).head()
    assert(drained.toSeq == batch.toSeq)
    val commits = TxLake.commitAddCounts(s"$scratch/pe")
    assert(commits.size == 2 && commits.forall(_._3 == 1L),
      s"a 2x2 cell store commits exactly one row per batch: $commits")
    assert(commits.forall(_._2.startsWith("pe-")))
  }

  test("gk-gamma store: domain-bounded commits; drain equals batch") {
    val rows = Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 2L, 1L), (3L, 2L, 2L),
      (4L, 2L, 2L), (5L, 3L, 3L), (6L, 3L, 1L), (7L, 1L, 3L))
      .toDF("id", "x", "y")
    val src = tmp("gk_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"gk_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("gk_store") + "/s"
    val drained = StreamVerify.gkGammaMaintenance(spark, src, scratch)
      .head()
    val batch = graft.operators.Relational.gkGamma(rows.drop("id"),
      "x", "y").head()
    assert(drained.toSeq == batch.toSeq)
    // each batch commits at most its own census rows (domain is 3x3)
    val commits = TxLake.commitAddCounts(s"$scratch/gk")
    assert(commits.size == 2 && commits.forall(_._3 <= 9L),
      s"census commits must stay domain-bounded: $commits")
    assert(commits.forall(_._2.startsWith("gk-")))
  }

  test("hill store: census-bounded commits; drain equals batch") {
    val rows = Seq((0L, "t1", "u1"), (1L, "t1", "u1"), (2L, "t1", "u2"),
      (3L, "t2", "u1"), (4L, "t2", "u2"), (5L, "t2", "u3"),
      (6L, "t1", "u1"), (7L, "t2", "u3")).toDF("id", "g", "u")
    val src = tmp("hn_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"hn_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("hn_store") + "/s"
    val drained = StreamVerify.hillMaintenance(spark, src, scratch, "g")
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    val batch = graft.operators.Profiling.hillNumbers(rows.drop("id"),
      "g", "u").collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(drained == batch)
    // each batch commits at most its own (group, unit) census rows
    val commits = TxLake.commitAddCounts(s"$scratch/hn")
    assert(commits.size == 2 && commits.forall(_._3 <= 5L),
      s"census commits must stay audience-bounded: $commits")
    assert(commits.forall(_._2.startsWith("hn-")))
  }

  test("bowker store: entity-partitioned batches; drain equals batch") {
    // users split by parity — each user's whole history in one batch,
    // so the per-batch paired censuses add to the one-pass answer
    val rows = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"),
      (2L, 10L, 102L, "b"), (2L, 20L, 103L, "a"),
      (3L, 10L, 104L, "a"), (3L, 20L, 105L, "a"),
      (4L, 10L, 106L, "a"), (4L, 20L, 107L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val src = tmp("bw_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"bw_half$par")
      rows.filter(col("user_id") % 2 === par)
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("bw_store") + "/s"
    val drained = StreamVerify.bowkerMaintenance(spark, src, scratch)
      .head()
    val fl = rows.groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
        .as("f"),
        max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("l"))
      .select(col("f.event_type").as("b"), col("l.event_type").as("a"))
    val batch = graft.operators.Drift.bowker(fl, col("b"), col("a")).head()
    assert(drained.toSeq == batch.toSeq)
    val commits = TxLake.commitAddCounts(s"$scratch/bw")
    assert(commits.size == 2 && commits.forall(_._3 <= 4L),
      s"paired census commits stay k²-bounded: $commits")
    assert(commits.forall(_._2.startsWith("bw-")))
  }

  test("gumbel store: hour-partitioned block maxima MAX-merge to batch") {
    // spike hours are all odd → batch 1 owns every true block max;
    // batch 0's partial maxima (the quiet 1s) must merge away
    val hours = (0L until 96L).flatMap { h =>
      val copies = h match {
        case 5L => 2; case 29L => 3; case 53L => 4; case 77L => 5
        case _ => 1
      }
      (1 to copies).map(_ => ("t", h))
    }
    val rows = hours.toDF("g", "hour_id")
      .withColumn("par", col("hour_id") % 2)
    val src = tmp("gm_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"gm_half$par")
      rows.filter(col("par") === par).drop("par")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("gm_store") + "/s"
    val drained = StreamVerify.gumbelMaintenance(spark, src, scratch)
      .head()
    val hourly = rows.groupBy(col("g"), col("hour_id"))
      .agg(count(lit(1)).as("n"))
    val batch = graft.operators.Trend.gumbelMaxima(hourly, "g",
      "hour_id", "n").head()
    assert(drained.toSeq.drop(1) == batch.toSeq.drop(1))
    assert(drained.getLong(2) == 5L, "the merged max is the spike")
    val commits = TxLake.commitAddCounts(s"$scratch/gm")
    assert(commits.size == 2 && commits.forall(_._3 <= 4L),
      s"block-partial commits stay calendar-bounded: $commits")
  }

  test("tost store: 1-row cell commits; drained verdict equals batch") {
    val rows = Seq((0L, 0L, 1L), (1L, 0L, 0L), (2L, 1L, 1L), (3L, 1L, 0L),
      (4L, 0L, 1L), (5L, 1L, 1L), (6L, 0L, 0L), (7L, 1L, 0L))
      .toDF("id", "arm", "conv")
    val src = tmp("te_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"te_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("te_store") + "/s"
    val drained = StreamVerify.tostMaintenance(spark, src, scratch, 0.2)
      .head()
    val batch = graft.operators.Drift.tostEquivalence(rows.drop("id"),
      col("arm") === 0L, col("conv"), 0.2).head()
    assert(drained.toSeq == batch.toSeq)
    val commits = TxLake.commitAddCounts(s"$scratch/te")
    assert(commits.size == 2 && commits.forall(_._3 == 1L))
    assert(commits.forall(_._2.startsWith("te-")))
  }

  test("pchart store: daily partials add across batches; drain equals " +
    "batch") {
    // days split ACROSS batches on purpose — subgroup counts add, so
    // no entity partitioning is needed for this store
    val rows = (0L until 40L).map(i =>
      (i, i % 4, if (i % 10 == 0) 1L else 0L)).toDF("id", "b", "x")
    val src = tmp("pc_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"pc_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("pc_store") + "/s"
    val drained = StreamVerify.pChartMaintenance(spark, src, scratch)
      .collect().map(_.toSeq)
    val batch = graft.operators.Drift.pChart(rows.drop("id"),
      col("b"), col("x")).collect().map(_.toSeq)
    assert(drained.toSeq == batch.toSeq)
    val commits = TxLake.commitAddCounts(s"$scratch/pc")
    assert(commits.size == 2 && commits.forall(_._3 <= 4L),
      s"day-census commits stay calendar-bounded: $commits")
    assert(commits.forall(_._2.startsWith("pc-")))
  }

  test("circular store: slot censuses add; drain equals batch") {
    val rows = (0L until 48L).map(i => (i, "t", i % 24))
      .toDF("id", "k", "s")
    val src = tmp("ci_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"ci_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("ci_store") + "/s"
    val drained = StreamVerify.circularMaintenance(spark, src, scratch)
      .head()
    val batch = graft.operators.Trend.circularStats(rows.drop("id"),
      col("k"), col("s")).head()
    assert(drained.toSeq == batch.toSeq)
    val commits = TxLake.commitAddCounts(s"$scratch/ci")
    assert(commits.size == 2 && commits.forall(_._3 <= 24L),
      s"slot censuses stay slot-domain-bounded: $commits")
    assert(commits.forall(_._2.startsWith("ci-")))
  }

  test("kendall-w store: score partials add; drain equals batch") {
    val rows = (0L until 40L).map(i => (i, i % 4, s"t${i % 3}"))
      .toDF("id", "r", "it")
    val src = tmp("kw_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"kw_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("kw_store") + "/s"
    val drained = StreamVerify.kendallWMaintenance(spark, src, scratch)
      .head()
    val batch = graft.operators.Drift.kendallW(
      rows.drop("id").withColumn("one", lit(1L)),
      col("r"), col("it"), col("one")).head()
    assert(drained.toSeq == batch.toSeq)
    val commits = TxLake.commitAddCounts(s"$scratch/kw")
    assert(commits.size == 2 && commits.forall(_._3 <= 12L),
      s"rater-item censuses stay domain-bounded: $commits")
    assert(commits.forall(_._2.startsWith("kw-")))
  }

  test("dispro store: cell partials add; drained screen equals batch") {
    val rows = (0L until 60L).map { i =>
      (i, s"s${i % 2}", if (i % 2 == 0 && i % 3 != 0) "hot" else s"o${i % 4}")
    }.toDF("id", "seg", "out")
    val src = tmp("dp_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"dp_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("dp_store") + "/s"
    val drained = StreamVerify.disproMaintenance(spark, src, scratch)
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.Drift.disproportionality(rows.drop("id"),
      col("seg"), col("out")).collect().map(_.toSeq).toSet
    assert(drained == batch)
    val commits = TxLake.commitAddCounts(s"$scratch/dp")
    assert(commits.size == 2 && commits.forall(_._3 <= 10L),
      s"cell censuses stay domain-bounded: $commits")
    assert(commits.forall(_._2.startsWith("dp-")))
  }

  test("components store commits per-batch DELTAS, never the standing state") {
    // 20 disjoint pairs + one bridge: whatever the deterministic hash
    // split assigns to each micro-batch, every node inserts exactly once
    // and the bridge relabels at most 2 rows — so TOTAL committed rows
    // must stay <= nodes + 2, where the old snapshot-overwrite store
    // wrote ~|state| rows PER BATCH
    val pairs = (0L until 20L).map(i => (i * 10 + 1, i * 10 + 2)) :+ (1L, 11L)
    val df = pairs.toDF("id_a", "id_b")
    val dir = tmp("cc_delta")
    val out = StreamVerify.componentsMaintenance(spark, df, dir)
      .as[(Long, Long)].collect().toMap
    // the one-shot recompute over all edges is the semantic oracle
    val nodes = df.select(col("id_a").as("node"))
      .unionAll(df.select(col("id_b").as("node"))).distinct()
    val oneShot = graft.operators.Dedup
      .dupClusters(nodes, "node", df).as[(Long, Long)].collect().toMap
    assert(out == oneShot)
    val commits = TxLake.commitAddCounts(s"$dir/comp")
    val nNodes = out.size.toLong
    assert(commits.forall(_._2.startsWith("cc-")), "every commit tagged")
    assert(commits.map(_._3).sum <= nNodes + 2,
      s"delta bound violated: ${commits.map(_._3).sum} rows committed " +
        s"for $nNodes nodes — a snapshot-shaped commit leaked in")
    // with >=2 data commits the later ones are batch-bounded, not
    // state-sized
    if (commits.size >= 2)
      assert(commits.last._3 < nNodes)
    // a cross-batch relabel (bridge in a later batch than its clusters)
    // must mask the superseded rows via DV sidecars, not rewrite files
    if (commits.map(_._3).sum > nNodes)
      assert(TxLake.dvFiles(s"$dir/comp").nonEmpty)
  }

  test("benford store commits <= 9 census rows per batch at any batch size") {
    val src = tmp("benford_src")
    (1 to 3).foreach { i =>
      Files.copy(Paths.get(s"$sf/events.parquet"),
        Paths.get(s"$src/events_$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("benford_store") + "/s"
    StreamVerify.benfordMaintenance(spark, src, scratch)
    val commits = TxLake.commitAddCounts(s"$scratch/benford")
    assert(commits.size == 3, s"expected 3 micro-batch commits: $commits")
    assert(commits.forall(_._3 <= 9L),
      s"a digit census can never exceed 9 rows: $commits")
    assert(commits.forall(_._2.startsWith("benford-")))
  }

  test("shingle-index store appends per-batch rows; drain equals batch q527") {
    import org.apache.spark.sql.DataFrame
    val para = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val docs = Seq(
      (1L, s"unique one two three $para tail1 tailx"),
      (2L, s"$para other words entirely here"),
      (3L, "nothing here repeats at all ever truly once only"))
      .toDF("doc_id", "text")
    val src = tmp("spans_src")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$src/a.parquet.dir")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$src/b.parquet.dir")
    val flat = tmp("spans_flat")
    Seq("a", "b").foreach { n =>
      val part = new java.io.File(s"$src/$n.parquet.dir").listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$flat/$n.parquet"))
    }
    val scratch = tmp("spans_store") + "/s"
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val drained = StreamVerify.repeatedSpansMaintenance(
      spark, flat, scratch, k = 4, minOcc = 2)
    val oneShot = graft.operators.Dedup.repeatedSpans(
      docs, "doc_id", "text", k = 4, minOcc = 2)
    assert(key(drained) == key(oneShot))
    // append-only: each batch committed exactly its own shingle rows
    val commits = TxLake.commitAddCounts(s"$scratch/shingles")
    assert(commits.size == 2 && commits.forall(_._2.startsWith("sh-")))
    val totalShingles = graft.operators.Dedup
      .shinglePositions(docs, "doc_id", "text", 4).count()
    assert(commits.map(_._3).sum == totalShingles)
    assert(TxLake.dvFiles(s"$scratch/shingles").isEmpty,
      "an append-only index never masks rows")
  }

  test("survival store merges lifetime bounds; drain equals one-copy logRank") {
    // two copies of the same events file: batch 2 re-delivers every user,
    // exercising the merge path; min/max merging makes the duplicate
    // invisible, so the drained test equals the single-copy batch answer
    val src = tmp("surv_src")
    (1 to 2).foreach { i =>
      Files.copy(Paths.get(s"$sf/events.parquet"),
        Paths.get(s"$src/events_$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("surv_store") + "/s"
    val drained = StreamVerify.survivalMaintenance(spark, src, scratch)
      .head()
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"),
        expr("ts div 1000000000").cast("long").as("sec"))
    val b = ev.agg(min(col("sec")).as("lo"), max(col("sec")).as("hi")).head()
    val cutoff = b.getLong(0) + 2L * (b.getLong(1) - b.getLong(0)) / 3L
    val batch = graft.operators.Trend.logRank(ev, "user_id", "sec", cutoff,
      pmod(conv(substring(md5(concat(lit("lr1:"),
        col("user_id").cast("string"))), 1, 13), 16, 10).cast("long"),
        lit(2)) === 0).head()
    assert(drained == batch)
    // commit bounds: every commit is user-domain-sized; the re-delivery
    // batch landed as a DV-masked delta, not a rewrite
    val users = ev.select(col("user_id")).distinct().count()
    val commits = TxLake.commitAddCounts(s"$scratch/lives")
    assert(commits.size == 2 && commits.forall(_._3 <= users))
    assert(TxLake.dvFiles(s"$scratch/lives").nonEmpty)
  }

  test("top-k store commits at most k rows per group per batch") {
    val events = graft.sources.Tables.load(spark, sf, "events")
    val k = 5
    val nGroups = events.select(col("event_type")).distinct().count()
    val scratch = tmp("topk_store") + "/s"
    StreamVerify.topkMaintenance(spark, events, scratch, k)
    val commits = TxLake.commitAddCounts(s"$scratch/topk")
    assert(commits.nonEmpty)
    assert(commits.forall(_._3 <= k * nGroups),
      s"top-k state must stay k x groups: $commits (groups=$nGroups)")
  }

  test("lorenz store: value-census commits add; drain equals batch") {
    val rows = Seq((0L, "g", 1L), (1L, "g", 1L), (2L, "g", 3L),
      (3L, "g", 7L), (4L, "g", 7L), (5L, "h", 2L), (6L, "h", 4L))
      .toDF("id", "g", "x")
    val src = tmp("lz_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"lz_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("lz_store") + "/s"
    val drained = StreamVerify.lorenzMaintenance(spark, src, scratch)
      .collect().toSeq
    val batch = graft.operators.Relational.lorenzCurve(
      rows.select(col("g"), col("x")), "g", "x").collect().toSeq
    assert(drained == batch)
    // commits are value-domain-sized per batch
    val commits = TxLake.commitAddCounts(s"$scratch/lz")
    assert(commits.size == 2 && commits.forall(_._3 <= 5L))
    assert(commits.forall(_._2.startsWith("lz-")))
  }

  test("concurrency store: boundary partials add; drain equals batch") {
    val rows = Seq((0L, 0L, 10L), (1L, 5L, 15L), (2L, 20L, 21L),
      (3L, 7L, 9L), (4L, 8L, 30L)).toDF("id", "s", "e")
    val src = tmp("cc_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"cc_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("cc_store") + "/s"
    val drained = StreamVerify.concurrencyMaintenance(spark, src, scratch)
      .head()
    val batch = graft.operators.Relational.concurrencySweep(
      rows.drop("id"), "s", "e").head()
    assert(drained == batch)
    // totals store commits exactly one row per batch; boundary store is
    // boundary-domain-sized
    val tc = TxLake.commitAddCounts(s"$scratch/cct")
    val bc = TxLake.commitAddCounts(s"$scratch/ccb")
    assert(tc.size == 2 && tc.forall(_._3 == 1L))
    assert(bc.size == 2 && bc.forall(_._3 <= 6L))
  }

  test("ltv store: entity-partitioned cohort censuses add; drain " +
    "equals batch") {
    import java.sql.Date
    val rows = Seq(
      (1L, Date.valueOf("2020-01-01"), 1000L),
      (1L, Date.valueOf("2020-01-10"), 2000L),
      (2L, Date.valueOf("2020-06-01"), 3000L),
      (3L, Date.valueOf("2021-03-05"), 5000L),
      (4L, Date.valueOf("2020-02-01"), 700L),
      (4L, Date.valueOf("2020-03-01"), 800L))
      .toDF("u", "d", "v")
    val src = tmp("ltv_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"ltv_half$par")
      rows.filter(col("u") % 2 === par)
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("ltv_store") + "/s"
    val drained = StreamVerify.ltvMaintenance(spark, src, scratch)
      .collect().toSeq
    val batch = graft.operators.Relational.ltvCurve(rows, "u", "d", "v")
      .collect().toSeq
    assert(drained == batch)
    val cc = TxLake.commitAddCounts(s"$scratch/ltc")
    assert(cc.size == 2 && cc.forall(_._3 <= 4L))
  }

  test("mcf store: entity-partitioned age censuses add; drain equals " +
    "batch") {
    val ev = Seq((1L, 100L), (1L, 110L), (1L, 120L), (2L, 500L),
      (3L, 40L), (3L, 60L)).toDF("u", "sec")
    val src = tmp("mcf_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"mcf_half$par")
      ev.filter(col("u") % 2 === par)
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("mcf_store") + "/s"
    val drained = StreamVerify.mcfMaintenance(spark, src, scratch,
      bucketSec = 10L).collect().toSeq
    val batch = graft.operators.Trend.meanCumulativeFunction(
      ev, "u", "sec", bucketSec = 10L).collect().toSeq
    assert(drained == batch)
    val dc = TxLake.commitAddCounts(s"$scratch/mcd")
    assert(dc.size == 2 && dc.forall(_._3 <= 3L))
  }

  test("iv store: four-cell censuses add; drain equals batch") {
    val rows = (1 to 16).map { i =>
      val z = i <= 8
      val x = if (z && i <= 4) 1L else 0L
      (i.toLong, z, x, x)
    }.toDF("id", "z", "x", "y")
    val src = tmp("iv_src")
    Seq(0, 1).foreach { par =>
      val side = tmp(s"iv_half$par")
      rows.filter(col("id") % 2 === par).drop("id")
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/half$par.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val scratch = tmp("iv_store") + "/s"
    val drained = StreamVerify.ivMaintenance(spark, src, scratch).head()
    val batch = graft.operators.Drift.ivWald(rows.drop("id"),
      col("z"), col("x"), col("y")).head()
    assert(drained == batch)
    val cc = TxLake.commitAddCounts(s"$scratch/iv")
    assert(cc.size == 2 && cc.forall(_._3 <= 4L))
  }
}
