package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Known-answer properties for the fifth round-6 wave: per-group OLS,
  * Kruskal–Wallis, Theil–Sen, partition modularity, A-ES priority
  * sampling and lagged cross-correlation. Each test pins semantics on
  * a hand-computed case the corpus gates can't isolate. */
class StatsWave2Spec extends SparkSpec {
  import spark.implicits._

  test("OLS recovers an exact line and nulls out a zero-variance group") {
    // g1: y = 2x + 1 exactly; g2: constant x (undefined slope)
    val df = Seq(("g1", 1.0, 3.0), ("g1", 2.0, 5.0), ("g1", 3.0, 7.0),
      ("g2", 4.0, 1.0), ("g2", 4.0, 9.0)).toDF("g", "x", "y")
    val out = Profiling.olsTrend(df, "g", col("x"), col("y"),
        xScale = 0, yScale = 2)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("g1") == ((3L, Some(2.0), Some(1.0), Some(1.0))),
      s"exact line: ${out("g1")}")
    assert(out("g2") == ((2L, None, None, None)),
      s"zero x-variance must yield nulls: ${out("g2")}")
  }

  test("Kruskal–Wallis: hand case H=7.2, all-tied case is undefined") {
    // ranks 1..9, R = (6, 15, 24): H = 12/90 * 279 - 30 = 7.2, no ties
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6),
      ("c", 7), ("c", 8), ("c", 9)).toDF("g", "v")
    val Array(r) = Profiling.kruskalWallis(df, "g", "v")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(r == ((9L, 3L, 2L, Some(7.2))), r.toString)
    // every value tied: the correction divisor hits 0 → null H
    val tied = Seq(("a", 5), ("a", 5), ("b", 5), ("b", 5)).toDF("g", "v")
    val Array(t) = Profiling.kruskalWallis(tied, "g", "v")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(t == ((4L, 2L, 1L, None)), t.toString)
  }

  test("Theil–Sen shrugs off the outlier OLS would chase") {
    // 3 collinear points + 1 wild outlier: slope stays 1, intercept 0
    val df = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 10L)).toDF("x", "y")
    val Array(r) = Profiling.theilSen(df, "x", "y")
      .as[(Long, Long, Double, Double)].collect()
    assert(r == ((4L, 6L, 1.0, 0.0)), r.toString)
  }

  test("modularity: two triangles + one bridge, exact per-community terms") {
    // m=7; each triangle community: intra=3, degsum=7 →
    // q_term = 3/7 - (7/14)^2 = 0.25/1.4 = 0.178571429 (9 dp)
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("a", "d")).toDF("src", "dst")
    val mem = Seq(("a", 1L), ("b", 1L), ("c", 1L),
      ("d", 2L), ("e", 2L), ("f", 2L)).toDF("node", "community")
    val out = graft.query.GraphQueries.modularity(e, mem)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val expect = math.rint((3.0 / 7 - 0.25) * 1e9) / 1e9
    assert(out(1L) == ((3L, 3L, 7L, expect)), s"c1: ${out(1L)}")
    assert(out(2L) == ((3L, 3L, 7L, expect)), s"c2: ${out(2L)}")
    // headline Q for this split is positive (real community structure)
    assert(out.values.map(_._4).sum > 0.35, out.toString)
  }

  test("modularity: community with zero intra edges reports 0, not null") {
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val mem = Seq(("a", 1L), ("b", 2L), ("c", 2L)).toDF("node", "community")
    val out = graft.query.GraphQueries.modularity(e, mem)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L)._2 == 0L && out(1L)._1 == 1L, out.toString)
  }

  test("priority sample: deterministic, k-bounded, matches the kernel replay") {
    val df = spark.range(1, 101).select(col("id").as("doc_id"))
    val got = Sampling.prioritySample(df, "doc_id", lit(1L), k = 10, seed = 7L)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 10 && got.forall(_._2 == 1L))
    // replay: priority of a w=1 item is the double-squared mix of
    // fingerprint("id:1:7") — recompute directly against the kernel
    val p = 2147483647L
    def prio(id: Long): Long = {
      val fp = graft.functions.FingerprintKernel.fingerprint(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$id:1:7"))
      val w1 = math.floorMod(fp * fp, p)
      math.floorMod(w1 * w1, p)
    }
    val expect = (1L until 101L).map(i => (prio(i), i))
      .sortBy { case (pr, id) => (-pr, id) }.take(10)
      .map { case (pr, id) => (id, 1L, pr) }
    assert(got.toSeq == expect, s"${got.toSeq} vs $expect")
    // and a second run is bit-identical (pure function of the keys)
    val again = Sampling.prioritySample(df, "doc_id", lit(1L), k = 10,
      seed = 7L).as[(Long, Long, Long)].collect()
    assert(again.toSeq == got.toSeq)
  }

  test("priority sample: weight-16 items dominate weight-1 items") {
    // 1000 ids, even ids carry w=16, odd w=1: the max of 16 uniforms
    // beats the max of 1 ~16/17 of the time, so a top-200 cut should
    // be overwhelmingly even ids (exact count is deterministic)
    val df = spark.range(1, 1001).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, 16L).otherwise(1L).as("w0"))
    val got = Sampling.prioritySample(df, "doc_id", col("w0"), k = 200,
      seed = 7L).as[(Long, Long, Long)].collect()
    val heavy = got.count(_._2 == 16L)
    assert(heavy > 160, s"expected w=16 dominance, got $heavy/200")
    // weights clamp into [1, 16]
    assert(got.forall(r => r._2 >= 1L && r._2 <= 16L))
  }

  test("k-means round: hand case assigns by cosine, ties to the smaller seed") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),   // the two seeds
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.9f)),   // clear members
      (5L, Array(0.5f, 0.5f))                             // exact tie → seed 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssignRound(e, e.filter(col("vec_id") <= 2),
        "vec_id", "embedding", outDims = 2)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // cluster 1 = {1, 3, 5}: centroid (0.8, 0.2); cluster 2 = {2, 4}
    assert(out((1L, 0L)) == ((0.8, 3L)), out.toString)
    assert(out((1L, 1L)) == ((0.2, 3L)), out.toString)
    assert(out((2L, 0L)) == ((0.05, 2L)), out.toString)
    assert(out((2L, 1L)) == ((0.95, 2L)), out.toString)
  }

  test("calibration bins: exact per-bin confidence, rate and gap") {
    val df = Seq((0.05, 0), (0.95, 1), (0.95, 0), (1.0, 1))
      .toDF("s", "label")
    val out = Profiling.calibrationBins(df, col("s"), col("label") === 1,
        nBins = 10)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0L) == ((1L, 0.05, 0.0, 0.05)), out.toString)
    // top bin absorbs s = 1.0 (clamped): conf 2.9/3, obs 2/3
    assert(out(9L) == ((3L, 0.966667, 0.666667, 0.3)), out.toString)
    assert(out.size == 2, out.toString)
  }

  test("rolling spike flags only the planted burst day") {
    def ts(day: Int, i: Int) = new Timestamp(day * 86400000L + i * 1000L)
    val counts = Seq(1, 1, 1, 10, 1, 1, 1)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => Tuple1(ts(d, i))) }.toDF("ts")
    val out = TimeSeries.rollingSpike(ev, "ts", radius = 3, factor = 2)
      .as[(java.sql.Date, Long, Long, Long, Option[Double])].collect()
    assert(out.length == 1, out.mkString(","))
    val r = out.head
    // day 4's full window: n=7, neighbors sum 6, ratio 10*6/6 = 10
    assert(r._2 == 10L && r._3 == 6L && r._4 == 7L && r._5 == Some(10.0),
      r.toString)
  }

  test("nDCG: hand case matches the closed form, perfect ranking scores 1") {
    def d9(x: Double) = math.rint(x * 1e9) / 1e9
    def d6(x: Double) = math.rint(x * 1e6) / 1e6
    // rel by rank: (0, 1, 1) — ideal pulls the two hits to the front
    val df = Seq(("q", 1, 0L), ("q", 2, 1L), ("q", 3, 1L))
      .toDF("query_id", "rank", "rel")
    val Array(r) = Similarity.ndcgAtK(df, "query_id", "rank", "rel")
      .as[(String, Long, Double, Double, Option[Double])].collect()
    val dcg = d6(d9(1 / (math.log(3) / math.log(2))) +
      d9(1 / (math.log(4) / math.log(2))))
    val idcg = d6(d9(1.0) + d9(1 / (math.log(3) / math.log(2))))
    assert(r._1 == "q" && r._2 == 2L, r.toString)
    assert(math.abs(r._3 - dcg) < 1e-9 && math.abs(r._4 - idcg) < 1e-9,
      s"$r vs dcg=$dcg idcg=$idcg")
    // already-ideal ranking → ndcg exactly 1
    val perfect = Seq(("q", 1, 1L), ("q", 2, 1L), ("q", 3, 0L))
      .toDF("query_id", "rank", "rel")
    val Array(p) = Similarity.ndcgAtK(perfect, "query_id", "rank", "rel")
      .as[(String, Long, Double, Double, Option[Double])].collect()
    assert(p._5 == Some(1.0), p.toString)
    // no relevant hits → idcg 0 → null ndcg
    val none = Seq(("q", 1, 0L)).toDF("query_id", "rank", "rel")
    val Array(z) = Similarity.ndcgAtK(none, "query_id", "rank", "rel")
      .as[(String, Long, Double, Double, Option[Double])].collect()
    assert(z._5.isEmpty && z._2 == 0L, z.toString)
  }

  test("burst dedup keeps one head per gap-chained burst") {
    val ev = Seq(0L, 10L, 20L, 2000L, 4000L)
      .map(s => ("u", new Timestamp(s * 1000L))).toDF("user_id", "ts")
    val Array(r) = TimeSeries.burstDedup(ev, "user_id", "ts", gapSec = 1000L)
      .as[(String, Long, Long)].collect()
    // bursts: {0,10,20} (gaps 10 s), {2000}, {4000} (gaps ≥ 1000 s)
    assert(r == (("u", 5L, 3L)), r.toString)
  }

  test("cross-correlation spikes at the true lead-lag offset") {
    // purchases replay clicks exactly 2 days later with varying daily
    // counts: r(lag=+2) = 1; the series otherwise decorrelates
    def ts(day: Int, i: Int) = new Timestamp(
      day * 86400000L + i * 1000L)
    val counts = Seq(5, 1, 9, 2, 7, 3, 8, 1, 6, 4)
    val clicks = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (ts(d, i), "click")) }
    val buys = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (ts(d + 2, i), "purchase")) }
    val ev = (clicks ++ buys).toDF("ts", "event_type")
    val out = TimeSeries.crossCorrelation(ev, "ts", "event_type",
        "click", "purchase", maxLag = 3)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((10L, Some(1.0))), s"lag +2: ${out(2L)}")
    assert(out(-2L)._2.forall(_ < 1.0), s"lag -2 must not be perfect: $out")
    // pair counts shrink with |lag| exactly as the windows slide off
    assert(out(3L)._1 == 9L && out(-3L)._1 == 5L, out.toString)
  }
}
