package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Banded range join: equivalence with the naive theta join, edge
  * behavior at bucket boundaries, and the no-cartesian plan shape. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = timestamp_micros(lit(us))

  test("banded pairs equal the naive theta join on real events") {
    val ev = graft.Tables.events(spark, sf0001)
    val v = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"ts".as("l_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"ts".as("r_ts"))
    val w = 30L * 60 * 1000000
    val banded = RangeJoin.leadingWindowPairs(v, p, "l_ts", "r_ts", w)
      .select($"view_id", $"purchase_id")
    val naive = v.join(p,
        unix_micros($"l_ts") <= unix_micros($"r_ts") &&
        unix_micros($"l_ts") > unix_micros($"r_ts") - w)
      .select($"view_id", $"purchase_id")
    assert(banded.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(banded).count() == 0)
    assert(banded.count() > 0) // non-vacuous
  }

  test("boundary semantics: exactly-at-window excluded, equal-ts included") {
    val w = 1000000L // 1s window
    val l = Seq(0L, 1L, 1000000L, 2000000L).toDF("us")
      .select($"us".as("view_id"), timestamp_micros($"us").as("l_ts"))
    val r = Seq(2000000L).toDF("us")
      .select($"us".as("purchase_id"), timestamp_micros($"us").as("r_ts"))
    val got = RangeJoin.leadingWindowPairs(l, r, "l_ts", "r_ts", w)
      .select($"view_id").as[Long].collect().toSet
    // (r-w, r] = (1000000, 2000000]: 1000000 excluded, 2000000 included
    assert(got == Set(2000000L), got.toString)
  }

  test("plans an equi join on the bucket, not a nested-loop/cartesian") {
    val ev = graft.Tables.events(spark, sf0001)
    val v = ev.filter($"event_type" === "view").select($"ts".as("l_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"ts".as("r_ts"))
    val df = RangeJoin.leadingWindowPairs(v, p, "l_ts", "r_ts", 1800000000L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join planned as a product:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"no equi join in plan:\n$plan")
  }
}
