package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{ApiIngest, FetchRequest, FetchResult}

class ApiIngestSpec extends SparkSuite {
  import spark.implicits._

  private def reqs(n: Int) =
    (0L until n.toLong).map(k =>
      FetchRequest(k, s"https://api.example.test/weather?key=$k&q=N$k")).toDS()

  test("distributed fetch keeps failures as data rows, never exceptions") {
    val rows = ApiIngest.fetchAll(reqs(20), ApiIngest.DeterministicStub,
      maxPartitions = 2, perPartitionRequestsPerSec = 1e6).collect()
    assert(rows.length == 20)
    assert(rows.filter(_.status == 404).map(_.request_id).toSeq == Seq(7L))
    assert(rows.filter(_.status == 200).forall(_.payload.startsWith("{\"name\"")))
  }

  test("bounded retry recovers transient failures; hard failures still quarantine") {
    // keys ≡ 3 (mod 5) fail ONCE then succeed; key 7 is a permanent 404.
    // maxPartitions=1 keeps one JVM-local stub instance per run shape.
    val flaky = new ApiIngest.TransientStub
    val without = ApiIngest.fetchAll(reqs(20), new ApiIngest.TransientStub,
      maxPartitions = 1, perPartitionRequestsPerSec = 1e6).collect()
    assert(without.count(_.status == 503) == 4,
      "without retries the transient 503s surface as data rows (3,8,13,18)")
    val withRetry = ApiIngest.fetchAll(reqs(20), flaky,
      maxPartitions = 1, perPartitionRequestsPerSec = 1e6,
      maxAttempts = 3).collect()
    assert(withRetry.count(_.status == 503) == 0,
      "one retry absorbs every transient failure")
    assert(withRetry.filter(_.status == 404).map(_.request_id).toSeq == Seq(7L),
      "the deterministic 404 is NOT retried away — it quarantines as before")
    assert(withRetry.count(_.status == 200) == 19)
  }

  test("explicit-schema flatten yields typed rows for the 200s only") {
    val fetched = ApiIngest.fetchAll(reqs(10), ApiIngest.DeterministicStub,
      maxPartitions = 2, perPartitionRequestsPerSec = 1e6)
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("main", StructType(Seq(
        StructField("temp", DoubleType), StructField("humidity", LongType))))))
    val flat = ApiIngest.flattenPayloads(fetched.toDF(), schema)
      .select(col("request_id"), col("name"), col("main.temp"), col("main.humidity"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(flat.length == 9) // key 7 quarantined
    assert(flat(3) == ((3L, "N3", -5.5, 21L)))
  }

  test("per-partition token bucket actually paces the request rate") {
    val t0 = System.nanoTime()
    ApiIngest.fetchAll(reqs(6), ApiIngest.DeterministicStub,
      maxPartitions = 1, perPartitionRequestsPerSec = 50.0).collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 6 requests through one 50 req/s bucket: at least 5 × 20 ms of pacing
    assert(elapsedMs >= 100.0, s"expected >= 100 ms of pacing, got $elapsedMs ms")
  }

  test("fromFetchedBatches lifts driver-fetched payloads into a DataFrame") {
    val df = ApiIngest.fromFetchedBatches(spark, Seq(
      FetchResult(1L, "u1", 200, """{"name":"A"}"""),
      FetchResult(2L, "u2", 503, "")))
    assert(df.filter(col("status") === 200).count() == 1)
    assert(df.columns.toSeq == Seq("request_id", "url", "status", "payload"))
  }
}
