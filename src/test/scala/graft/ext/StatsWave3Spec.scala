package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Known-answer properties for the sixth round-6 wave: Mann–Kendall
  * trend, bitmap exact distinct, and MRR retrieval scoring. */
class StatsWave3Spec extends SparkSpec {
  import spark.implicits._

  private def dayTs(day: Int, i: Int) =
    new Timestamp(day * 86400000L + i * 1000L)

  test("Mann–Kendall: strictly rising series has tau=1 and the textbook z") {
    // daily counts 1..5 → S = 10 (every pair rises), no ties:
    // v18 = 5·4·15 = 300, tau = 1, z = 9 / sqrt(300/18)
    val ev = (0 until 5).flatMap(d =>
      (0 to d).map(i => Tuple1(dayTs(d, i)))).toDF("ts")
    val Array(r) = TimeSeries.mannKendall(ev, "ts")
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect()
    val z = math.rint(9.0 / math.sqrt(300.0 / 18) * 1e6) / 1e6
    assert(r == ((5L, 10L, 10L, 300L, 1.0, Some(z))), r.toString)
  }

  test("Mann–Kendall: constant series ties variance away — S=0, z null") {
    // three days of 2 events each: every pair ties, and the tie
    // correction exactly cancels the variance term
    val ev = (0 until 3).flatMap(d =>
      (0 until 2).map(i => Tuple1(dayTs(d, i)))).toDF("ts")
    val Array(r) = TimeSeries.mannKendall(ev, "ts")
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect()
    assert(r == ((3L, 3L, 0L, 0L, 0.0, None)), r.toString)
  }

  test("bitmap distinct is exact across bucket boundaries and duplicates") {
    // keys straddle the 64-bit bucket edges (63|64, 127|128) and repeat
    val df = Seq(("a", 0L), ("a", 1L), ("a", 63L), ("a", 64L), ("a", 64L),
      ("a", 127L), ("a", 128L), ("b", 5L), ("b", 5L), ("b", 69L))
      .toDF("g", "k")
    val out = Sketches.bitmapDistinct(df, "g", "k")
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 6L, "b" -> 2L), out.toString)
  }

  test("bitmap distinct matches count(DISTINCT) on a dense id sweep") {
    val df = spark.range(0, 5000)
      .select((col("id") % 7).cast("string").as("g"), (col("id") % 901).as("k"))
    val got = Sketches.bitmapDistinct(df, "g", "k")
      .as[(String, Long)].collect().toMap
    val want = df.groupBy(col("g")).agg(countDistinct(col("k")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want, s"$got vs $want")
  }

  test("MRR: first hit at rank 3 scores 1/3, no-hit query is null") {
    val df = Seq(("q1", 1, 0L), ("q1", 2, 0L), ("q1", 3, 1L), ("q1", 4, 1L),
      ("q2", 1, 0L), ("q2", 2, 0L)).toDF("query_id", "rank", "rel")
    val out = Similarity.mrrAtK(df, "query_id", "rank", "rel")
      .as[(String, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("q1") == ((2L, Some(3L), Some(0.333333))), out.toString)
    assert(out("q2") == ((0L, None, None)), out.toString)
  }
}
