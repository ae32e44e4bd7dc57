package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.JobRunner.Job
import graft.sources.PartitionedLake

class JobRunnerSpec extends SparkSuite {

  private def lakeRoot(): String =
    Files.createTempDirectory("graft_jobs").toString + "/lake"

  // a toy "source": (date_id, k, v) rows spanning two days
  private val source: (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame = (s, _) => {
    import s.implicits._
    Seq(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L),
      ("2024-01-02", "a", 5L), ("2024-01-02", "c", 7L))
      .toDF("date_id", "k", "v")
  }

  private val jobs = Seq(
    Job("daily_sum", (s, d) =>
      source(s, d).groupBy(col("date_id"), col("k"))
        .agg(sum(col("v")).as("total"))),
    Job("daily_count", (s, d) =>
      source(s, d).groupBy(col("date_id")).agg(count(lit(1)).as("n"))))

  private def tableState(root: String, job: String): Seq[String] = {
    val p = Paths.get(JobRunner.tablePath(root, job))
    def walk(dir: Path): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq.flatMap { f =>
        if (Files.isDirectory(f)) walk(f) else Seq(f)
      } finally s.close()
    }
    walk(p).filter(_.toString.endsWith(".parquet"))
      .map(f => s"${p.relativize(f).getParent}:${Files.size(f)}:" +
        Files.getLastModifiedTime(f))
      .sorted
  }

  private def content(root: String, job: String): Seq[String] =
    PartitionedLake.read(spark, JobRunner.tablePath(root, job))
      .collect().map(_.toString).sorted.toSeq

  test("a day re-run is idempotent: identical lake content, no duplicates") {
    val root = lakeRoot()
    val n1 = JobRunner.runDay(spark, "", root, "2024-01-01", jobs)
    assert(n1 == Map("daily_sum" -> 2L, "daily_count" -> 1L))
    val c1 = content(root, "daily_sum")
    val n2 = JobRunner.runDay(spark, "", root, "2024-01-01", jobs)
    assert(n2 == n1, "re-run must count the same committed rows")
    assert(content(root, "daily_sum") == c1,
      "re-run must replace the partition with identical content")
    assert(content(root, "daily_count").size == 1)
  }

  test("running the next day leaves the previous day's files untouched") {
    val root = lakeRoot()
    JobRunner.runDay(spark, "", root, "2024-01-01", jobs)
    val day1Before = tableState(root, "daily_sum")
      .filter(_.startsWith("date_id=2024-01-01"))
    JobRunner.runDay(spark, "", root, "2024-01-02", jobs)
    val day1After = tableState(root, "daily_sum")
      .filter(_.startsWith("date_id=2024-01-01"))
    // same paths, sizes AND mtimes: day 2 never rewrote day 1
    assert(day1After == day1Before)
    assert(content(root, "daily_sum").size == 4)
  }

  test("a transform leaking other days cannot corrupt them") {
    val root = lakeRoot()
    JobRunner.runDay(spark, "", root, "2024-01-01", jobs)
    // this run targets day 2 but the transform emits day 1 rows too;
    // the runner's day filter must keep day 1 intact
    val before = content(root, "daily_sum")
      .filter(_.contains("2024-01-01"))
    JobRunner.runDay(spark, "", root, "2024-01-02", jobs)
    val after = content(root, "daily_sum").filter(_.contains("2024-01-01"))
    assert(after == before)
  }
}
