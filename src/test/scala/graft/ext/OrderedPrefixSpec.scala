package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class OrderedPrefixSpec extends SparkSpec {
  import spark.implicits._

  test("withPrefixSum matches the single-window reference on unique keys") {
    val df = spark.range(2000)
      .selectExpr("concat('id', lpad(cast(id as string), 6, '0')) AS k",
        "(id * 37) % 101 + 1 AS w")
    val got = OrderedPrefix.withPrefixSum(df, Seq($"k"), $"w", "c", 16)
      .select($"k", $"c").as[(String, Long)].collect().toMap
    val want = df.withColumn("c", sum($"w").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"k", $"c").as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("withRowIndex: permutation of 1..n, order-statistic selection tie-invariant") {
    // values with heavy ties — indices among ties may vary, but the
    // set of indices is exactly 1..n and the ⌈n·q⌉-th order statistic
    // is unique
    val df = spark.range(999).selectExpr("id % 13 AS v")
    val out = OrderedPrefix.withRowIndex(df, Seq($"v"), "i", "n", 8)
      .select($"v", $"i", $"n").as[(Long, Long, Long)].collect()
    assert(out.length == 999)
    assert(out.map(_._2).sorted.toSeq == (1L to 999L))
    assert(out.forall(_._3 == 999L))
    // i-th smallest value must equal the sorted array's i-th element
    val sorted = out.map(_._1).sorted
    assert(out.forall { case (v, i, _) => sorted(i.toInt - 1) == v })
  }

  test("exactQuantiles: selections match the sorted array, ties included") {
    val vals = (1L to 100L) ++ Seq.fill(50)(42L)   // heavy tie block at 42
    val df = vals.toDF("v")
    val got = Profiling.exactQuantiles(df, $"v", Seq(100, 500, 900, 1000))
      .select($"q_permille", $"n", $"value")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val sorted = vals.sorted.toIndexedSeq
    def sel(q: Int) = sorted(math.ceil(sorted.size * q / 1000.0).toInt - 1)
    assert(got.map(_._2).forall(_ == 150L))
    assert(got.map(t => t._1 -> t._3).toSeq ==
      Seq(100L -> sel(100), 500L -> sel(500), 900L -> sel(900),
        1000L -> sel(1000)), got.mkString(","))
  }

  test("exactQuantiles: empty input yields NULL values, not zero rows") {
    val out = Profiling.exactQuantiles(
      spark.range(0).select($"id".as("v")), $"v", Seq(500))
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.isNullAt(2))
  }

  test("empty and single-row inputs") {
    val empty = spark.range(0).selectExpr("cast(id as string) AS k", "id AS w")
    assert(OrderedPrefix.withPrefixSum(empty, Seq($"k"), $"w", "c").count() == 0L)
    assert(OrderedPrefix.withRowIndex(empty, Seq($"k"), "i", "n").count() == 0L)
    val one = Seq(("a", 5L)).toDF("k", "w")
    val r = OrderedPrefix.withPrefixSum(one, Seq($"k"), $"w", "c")
      .select($"c").as[Long].collect()
    assert(r.toSeq == Seq(5L))
  }
}
