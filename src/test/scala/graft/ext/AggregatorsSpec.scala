package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedMean: hand-computed groups, zero-weight group yields 0.0") {
    val df = Seq(
      ("a", 10.0, 1.0), ("a", 20.0, 3.0),   // (10 + 60) / 4 = 17.5
      ("b", 5.0, 2.0),                      // 5.0
      ("z", 99.0, 0.0)                      // zero total weight -> 0.0
    ).toDF("k", "v", "w")
    val out = df.groupBy($"k")
      .agg(Aggregators.weightedMean($"v", $"w").as("wm"))
      .orderBy("k").as[(String, Double)].collect().toSeq
    assert(out == Seq(("a", 17.5), ("b", 5.0), ("z", 0.0)))
  }

  test("weightedMean merges across partitions (partial aggregation)") {
    val big = spark.range(0, 10000).repartition(13)
      .select(lit("g").as("k"), $"id".cast("double").as("v"), lit(1.0).as("w"))
    val wm = big.groupBy($"k")
      .agg(Aggregators.weightedMean($"v", $"w").as("wm"))
      .as[(String, Double)].head()._2
    assert(math.abs(wm - 4999.5) < 1e-9)
  }
}
