package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    df.withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
  }

  test("matches the window row_number formulation on random data") {
    val rnd = new scala.util.Random(42)
    val data = Seq.tabulate(500)(i =>
      ("k" + rnd.nextInt(7), i.toLong, rnd.nextInt(100).toDouble))
    val df = data.toDF("key", "id", "score")
    for (k <- Seq(1, 3, 10)) {
      val native = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), k)
        .as[(String, Long, Double)].collect().toSet
      val reference = windowTopK(df, k).as[(String, Long, Double)].collect().toSet
      assert(native == reference, s"k=$k")
    }
  }

  test("keeps all rows when k exceeds group size") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0)).toDF("key", "id", "score")
    val out = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), 10)
    assert(out.count() == 3)
  }

  test("deterministic under ties via the tie-break column") {
    val df = Seq(("a", 2L, 5.0), ("a", 1L, 5.0), ("a", 3L, 5.0)).toDF("key", "id", "score")
    val out = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), 2)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L)) // lowest ids win the tie
  }

  test("plans a map-side partial pass below the exchange") {
    val df = (1 to 200).map(i => ("k" + i % 5, i.toLong, i.toDouble)).toDF("key", "id", "score")
    val out = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), 3)
    out.collect()
    // structural assertion (not string indices — "TopKPerKey" is a
    // substring of "PartialTopKPerKey", and plan-rendering changes
    // could silently re-anchor index comparisons): walk the executed
    // plan through AQE wrappers and assert final ▸ exchange ▸ partial
    // as actual parent/child structure
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        nodes(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        r +: nodes(r.child)
      case other => other +: other.children.flatMap(nodes)
    }
    val all = nodes(out.queryExecution.executedPlan)
    val finals = all.collect { case t: TopKPerKeyExec => t }
    assert(finals.size == 1, s"expected exactly one final node, got $finals")
    val below = nodes(finals.head.child)
    assert(below.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
      s"no exchange below the final node:\n${out.queryExecution.executedPlan}")
    val partials = below.collect { case p: PartialTopKPerKeyExec => p }
    // the partial runs BELOW the final's exchange: at most keys·k rows
    // per input partition reach the shuffle, not the scored stream
    assert(partials.size == 1,
      s"expected one partial below the exchange:\n${out.queryExecution.executedPlan}")
  }

  test("partial flush on a byte budget stays correct (maxBytes cap)") {
    // wide-row guard: retained UnsafeRow copies are bounded by BYTES,
    // not just key count — a tiny budget forces a flush on nearly
    // every add and the final pass must still reduce to the exact
    // window-formulation answer
    spark.conf.set("spark.graft.topk.partialMaxBytes", "256")
    try {
      val rnd = new scala.util.Random(11)
      val data = Seq.tabulate(1000)(i =>
        ("k" + rnd.nextInt(40), i.toLong, rnd.nextInt(50).toDouble))
      val df = data.toDF("key", "id", "score").repartition(4)
      val native = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), 3)
        .as[(String, Long, Double)].collect().toSet
      val reference = windowTopK(df, 3).as[(String, Long, Double)].collect().toSet
      assert(native == reference)
    } finally spark.conf.unset("spark.graft.topk.partialMaxBytes")
  }

  test("partial flush on high-cardinality keys stays correct (maxKeys cap)") {
    spark.conf.set("spark.graft.topk.partialMaxKeys", "7")
    try {
      val rnd = new scala.util.Random(7)
      val data = Seq.tabulate(1000)(i =>
        ("k" + rnd.nextInt(100), i.toLong, rnd.nextInt(50).toDouble))
      val df = data.toDF("key", "id", "score").repartition(4)
      val native = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), 3)
        .as[(String, Long, Double)].collect().toSet
      val reference = windowTopK(df, 3).as[(String, Long, Double)].collect().toSet
      assert(native == reference)
    } finally spark.conf.unset("spark.graft.topk.partialMaxKeys")
  }

  test("plans a single exchange and no sort") {
    val df = (1 to 100).map(i => ("k" + i % 5, i.toLong, i.toDouble)).toDF("key", "id", "score")
    val out = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), 3)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Sort "), s"native top-k should not sort:\n$plan")
  }

  test("extension session: strategy present exactly once, query path mutates nothing") {
    // the test session carries GraftExtensions, so the planner already
    // has the strategy — the TopK call-site fallback must be a no-op
    // (no experimental-methods mutation in the query path) and the
    // strategy must appear exactly once in the planner's list
    val before = spark.experimental.extraStrategies
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 1.0)).toDF("key", "id", "score")
    val out = TopK.topKPerKey(df, Seq($"key"), Seq($"score".desc, $"id"), 1)
    assert(out.count() == 1)
    assert(spark.experimental.extraStrategies == before,
      "query path mutated experimental.extraStrategies on an extension session")
    assert(spark.sessionState.planner.strategies.count(_ == TopKPerKeyStrategy) == 1,
      "strategy not present exactly once on the extension session")
  }

  test("works through a session without GraftExtensions (self-registration)") {
    val plain = spark.newSession() // same context, fresh session state
    import plain.implicits._
    val df = Seq(("a", 1L, 9.0), ("a", 2L, 1.0)).toDF("key", "id", "score")
    val out = TopK.topKPerKey(df, Seq(col("key")), Seq(col("score").desc, col("id")), 1)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
