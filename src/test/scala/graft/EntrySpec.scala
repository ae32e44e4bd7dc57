package graft

class EntrySpec extends SparkSuite {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every §2 query has an implementation and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, sf).count() > 0) None else Some(s"$name: 0 rows")
        } catch {
          case e: Throwable => Some(s"$name: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("approx distinct tracks exact within HLL++ error bounds") {
    val rows = SparkEntry.queries("q37_approx_distinct")(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.15, s"approx $approx vs exact $exact")
    }
  }
}
