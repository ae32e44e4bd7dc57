package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zorderValue interleaves bits exactly (reference check)") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(11)
    val pairs = (0 until 200).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 16), s"($x,$y)") }
  }

  test("zorderValueN interleaves three keys exactly (reference check)") {
    def ref(keys: Seq[Long], bits: Int): Long =
      (for { i <- 0 until bits; j <- keys.indices }
        yield ((keys(j) >> i) & 1L) << (keys.size * i + j)).reduce(_ | _)
    val rnd = new scala.util.Random(23)
    val triples = (0 until 200).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = triples.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        Layout.zorderValueN(16, Seq(col("x"), col("y"), col("w"))).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, w, z) =>
      assert(z == ref(Seq(x, y, w), 16), s"($x,$y,$w)")
    }
  }

  test("hilbertValue walks the full grid in unit steps (bijective + adjacent)") {
    // bits=5: the curve visits all 1024 cells of the 32x32 grid exactly
    // once, and consecutive indices are Manhattan-distance-1 neighbors —
    // THE Hilbert property (Morton teleports at power-of-two seams).
    // Checked through the CODEGEN path (whole-stage codegen, not eval).
    val cells = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits = 5).as("h"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(got.map(_._3).toSeq == (0L until 1024L), "indices must be 0..1023 once each")
    got.sliding(2).foreach { case Array((x1, y1, h), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step after h=$h jumps from ($x1,$y1) to ($x2,$y2)")
    }
    // codegen and interpreted twins agree
    got.foreach { case (x, y, h) =>
      assert(graft.plans.HilbertIndex2.index(x, y, 5) == h)
    }
  }

  /** Per-row-group (min, max) of a long column, read from the REAL parquet
    * footers — the exact statistics the scan's row-group filter consults.
    */
  private def rowGroupRanges(dir: String, colName: String): Seq[Seq[(Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .toSeq
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == colName)
            .getOrElse(fail(s"column $colName missing from ${f.getName} footer"))
          val st = cc.getStatistics
          assert(st.hasNonNullValue, s"no stats for $colName in ${f.getName}")
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        } finally r.close()
      }
  }

  test("z-layout skips most files on a range predicate on EITHER key; an append layout skips none") {
    val rnd = new scala.util.Random(13)
    val df = (0 until 40000)
      .map(i => (i.toLong, rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("id", "x", "y")
    val zdir = Files.createTempDirectory("graft_zskip").toString
    Layout.zorderWrite(df, zdir, "x", "y", bits = 12, files = 16)
    // baseline: insertion-ordered files — what an append-only load produces
    val adir = Files.createTempDirectory("graft_askip").toString
    df.repartitionByRange(16, col("id")).sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(adir)
    // a file is skipped for [lo, hi] when EVERY row group's footer range
    // misses the interval — the same min/max test the parquet reader runs
    def skipped(dir: String, colName: String, lo: Long, hi: Long): (Int, Int) = {
      val perFile = rowGroupRanges(dir, colName)
      (perFile.count(_.forall { case (mn, mx) => mx < lo || mn > hi }),
        perFile.size)
    }
    for (key <- Seq("x", "y")) {
      val (zSkip, zTotal) = skipped(zdir, key, 0, 255) // 1/16 of the domain
      assert(zSkip >= zTotal / 2,
        s"z-layout should skip most files on $key∈[0,255]: $zSkip of $zTotal")
      val (aSkip, aTotal) = skipped(adir, key, 0, 255)
      assert(aSkip == 0,
        s"append layout has full-domain files; expected 0 skips on $key, got $aSkip of $aTotal")
    }
    // files-opened comparison: the Hilbert layout of the SAME data at the
    // SAME file count must be at least as skippable on the same probes —
    // its files are contiguous curve segments, i.e. near-square tiles,
    // where Morton segments straddle quadrant seams
    val hdir = Files.createTempDirectory("graft_hskip").toString
    Layout.hilbertWrite(df, hdir, "x", "y", bits = 12, files = 16)
    def opened(dir: String, key: String): Int = {
      val (s, t) = skipped(dir, key, 0, 255)
      t - s
    }
    val zOpened = opened(zdir, "x") + opened(zdir, "y")
    val hOpened = opened(hdir, "x") + opened(hdir, "y")
    assert(hOpened <= zOpened,
      s"hilbert should open no more files than z-order on the same probes: " +
        s"hilbert $hOpened vs z $zOpened (of 16 per key)")
    for (key <- Seq("x", "y")) {
      val (hSkip, hTotal) = skipped(hdir, key, 0, 255)
      assert(hSkip >= hTotal / 2,
        s"hilbert layout should skip most files on $key∈[0,255]: $hSkip of $hTotal")
    }
  }

  test("zorderWrite clusters both dimensions: per-file key ranges are narrow") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val rnd = new scala.util.Random(7)
    val df = (0 until 20000)
      .map(i => (i.toLong, rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("id", "x", "y")
    Layout.zorderWrite(df, dir, "x", "y", bits = 12, files = 8)
    // each parquet file should cover a fraction of BOTH key domains — a
    // single-dimension sort would leave the other dimension's per-file
    // range at ~full domain
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col("x")) - min(col("x"))).as("xr"), (max(col("y")) - min(col("y"))).as("yr"))
      .agg(avg(col("xr")).as("ax"), avg(col("yr")).as("ay"))
      .head()
    assert(perFile.getAs[Double]("ax") < 4096 * 0.8, s"x range too wide: $perFile")
    assert(perFile.getAs[Double]("ay") < 4096 * 0.8, s"y range too wide: $perFile")
  }

  test("rangeSortedWrite: one file per bucket, non-overlapping sorted runs") {
    val dir = Files.createTempDirectory("graft_rangerun").toString + "/t"
    val src = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val bounds = Layout.rangeSortedWrite(
      src, dir, "o_totalprice", "o_orderkey", buckets = 4)
    assert(bounds.length == 3 && bounds == bounds.sorted)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(dirs.length == 4, "every bucket gets its own directory")
    assert(dirs.forall(d =>
      d.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "each bucket's rows must land in exactly ONE sorted file")
    // per-file value ranges must be strictly disjoint across the table —
    // the property that lets range scans skip whole files on footer stats
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(spans.sliding(2).forall {
      case Array(a, b) => a._2 < b._1
      case _ => true
    }, s"file ranges overlap: ${spans.mkString(", ")}")
    assert(spark.read.parquet(dir).count() == src.count())
  }

  test("hidden partitioning derives the bucket predicate and prunes to one bucket dir") {
    val dir = Files.createTempDirectory("hidpart").toFile.getAbsolutePath + "/t"
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id"), expr("ts div 1000000000").as("sec"),
        col("user_id"), col("event_type"), col("value"))
    graft.sources.HiddenPartitioning.write(ev, dir, "sec", "user_id", 8)
    val rd = graft.sources.HiddenPartitioning.read(
      spark, dir, "user_id", 8, keyEq = Some(7L))
    // the caller never mentioned __bucket, yet only bucket=7 files are
    // read: inputFiles ignores pruning, so inspect the executed scan's
    // selected partitions
    val scan = rd.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    assert(files.nonEmpty && files.forall(_.contains("__bucket=7")),
      files.take(3).mkString(", "))
    val allFiles = spark.read.parquet(dir).inputFiles
    assert(files.length < allFiles.length / 4,
      s"${files.length} of ${allFiles.length} — no pruning happened")
    // and the answer equals the raw filter over the source
    val expect = ev.filter(col("user_id") === 7L)
      .select(col("event_id"), col("sec"), col("user_id"), col("event_type"), col("value"))
    val got = rd.select(col("event_id"), col("sec"), col("user_id"), col("event_type"), col("value"))
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("clusterDepthAudit: disjoint runs read depth 1, nested stacks count") {
    import spark.implicits._
    val files = Seq(
      // sorted layout: adjacent but non-overlapping ranges
      ("sorted", 0L, 1L, 10L), ("sorted", 1L, 11L, 20L), ("sorted", 2L, 21L, 30L),
      // messy layout: [1,30] ⊃ [5,10] ⊃ [6,8], plus disjoint [40,50]
      ("messy", 0L, 1L, 30L), ("messy", 1L, 5L, 10L),
      ("messy", 2L, 6L, 8L), ("messy", 3L, 40L, 50L))
      .toDF("layout", "file_id", "mn", "mx")
    val got = graft.operators.Layout.clusterDepthAudit(files)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("sorted") == ((3L, 0L, 1L)),
      "back-to-back integer ranges must not fake an overlap")
    assert(got("messy") == ((4L, 3L, 3L))) // 3 nested pairs, depth 3 at 6..8
  }
}
