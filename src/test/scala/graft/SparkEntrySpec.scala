package graft

class SparkEntrySpec extends SparkSpec {

  test("entry (flagship) returns rows at smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has aligned column names with its oracle aliases") {
    // every oracle key must exist in queries (driver joins on the key)
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001 and returns a schema") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, sf0001).schema; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("approx_count_distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0001)
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    val exact = li.select(col("l_partkey")).distinct().count()
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
