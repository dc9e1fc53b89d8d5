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
    val plan = out.queryExecution.executedPlan.toString
    // partial (pre-shuffle) then final (post-shuffle): the exchange
    // carries at most keys·k rows per input partition, not the stream
    val iPartial = plan.indexOf("PartialTopKPerKey")
    val iExchange = plan.indexOf("Exchange")
    val iFinal = plan.indexOf("TopKPerKey ") // exec node line, not the partial
    assert(iPartial >= 0, s"partial node missing:\n$plan")
    assert(iExchange >= 0 && iFinal >= 0 && iFinal < iExchange && iExchange < iPartial,
      s"expected final above exchange above partial:\n$plan")
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

  test("works through a session without GraftExtensions (self-registration)") {
    val plain = spark.newSession() // same context, fresh session state
    import plain.implicits._
    val df = Seq(("a", 1L, 9.0), ("a", 2L, 1.0)).toDF("key", "id", "score")
    val out = TopK.topKPerKey(df, Seq(col("key")), Seq(col("score").desc, col("id")), 1)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
