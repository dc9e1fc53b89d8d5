package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Known-answer properties for the round-8 second wave: HDR log-linear
  * quantile sketch, per-group exact quantiles, KMV set operations,
  * raking (IPF), Markov removal-effect attribution, DP noisy counts,
  * and the partition-cut layout audit. */
class Round8WaveSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuantilesPerGroup matches in-memory per-group selection") {
    val df = spark.range(0, 3000).select(
      (col("id") % 3).cast("string").as("g"),
      ((col("id") * 37) % 1013 + 1).as("v"))
    val got = Profiling.exactQuantilesPerGroup(df, col("g"), col("v"),
        Seq(100, 500, 900))
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, q, n, v) => (g, q) -> (n, v) }.toMap
    val byG = df.as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._2).sorted }
    for (g <- byG.keys; q <- Seq(100L, 500L, 900L)) {
      val vs = byG(g)
      val want = vs((math.ceil(vs.length * q / 1000.0).toInt - 1).max(0))
      assert(got((g, q)) == ((vs.length.toLong, want)),
        s"g=$g q=$q got=${got((g, q))} want=($want)")
    }
  }

  test("HDR sketch: singleton buckets below subBits, containment above") {
    // subBits=2: values 1..4 have m<=3; v=13 (1101b, m=4) buckets to
    // sub=13>>2=6? no — sh=m-2=2, sub=13>>2=3, [12,16)
    val df = Seq(1L, 2L, 3L, 4L, 13L).map(v => ("a", v)).toDF("g", "v")
    val sk = Sketches.hdrSketch(df, "g", col("v"), 2)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(sk.contains(("a", 4, 3L, 1L)), sk.toString) // 13 → (m=4, sub=3)
    val q = Sketches.hdrQuantiles(Sketches.hdrSketch(df, "g", col("v"), 2),
        Seq(1000), 2)
      .select(col("est"), col("low"), col("high"))
      .as[(Long, Long, Long)].collect().head
    assert(q._2 == 12L && q._3 == 16L && q._1 == 14L, q.toString)
  }

  test("HDR quantiles: true quantile always inside the bucket, bounded error") {
    val df = spark.range(1, 20000).select(
      (col("id") % 2).cast("string").as("g"),
      ((col("id") * col("id")) % 999983 + 1).as("v"))
    val est = Sketches.hdrQuantiles(Sketches.hdrSketch(df, "g", col("v"), 6),
        Seq(500, 950, 990), 6)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map { case (g, q, _, e, lo, hi) => (g, q) -> (e, lo, hi) }.toMap
    val ex = Profiling.exactQuantilesPerGroup(df, col("g"), col("v"),
        Seq(500, 950, 990))
      .as[(String, Long, Long, Long)].collect()
    assert(ex.nonEmpty)
    for ((g, q, _, want) <- ex) {
      val (e, lo, hi) = est((g, q))
      assert(want >= lo && want < hi, s"g=$g q=$q exact=$want not in [$lo,$hi)")
      assert(math.abs(e - want).toDouble / want <= math.pow(2, -5),
        s"g=$g q=$q est=$e exact=$want")
    }
  }

  test("kmvIntersect: unfull sketches are exact; full sketches approximate") {
    val a = spark.range(1, 1001).toDF("k")
    val b = spark.range(501, 1501).toDF("k")
    // k=4096 > |A∪B|: every hash retained → exact everywhere
    val exact = Sketches.kmvIntersect(a, "k", b, "k", 4096)
      .select(col("est_inter"), col("exact_inter"), col("est_jaccard"))
      .as[(Double, Long, Double)].collect().head
    assert(exact._1 == 500.0 && exact._2 == 500L, exact.toString)
    assert(math.abs(exact._3 - 500.0 / 1500.0) < 1e-3, exact.toString)
    // k=256 full sketch: estimate within 35% (k=256 → σ≈1/16)
    val approx = Sketches.kmvIntersect(a, "k", b, "k", 256)
      .select(col("est_inter"), col("exact_inter"))
      .as[(Double, Long)].collect().head
    assert(math.abs(approx._1 - 500.0) / 500.0 < 0.35, approx.toString)
  }

  test("rake pulls both marginals to uniform on a skewed 2x2") {
    val rows = Seq.fill(40)(("en", "s1")) ++ Seq.fill(10)(("en", "s2")) ++
      Seq.fill(10)(("de", "s1")) ++ Seq.fill(40)(("de", "s2"))
    val out = Sampling.rake(rows.toDF("lang", "source"), "lang", "source", 5)
      .as[(String, String, Long, Double, Double)].collect()
    assert(out.length == 4)
    val byA = out.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    val byB = out.groupBy(_._2).view.mapValues(_.map(_._5).sum)
    // both marginals within 1% of the uniform target 50
    for ((_, s) <- byA ++ byB) assert(math.abs(s - 50.0) < 0.5, s.toString)
    assert(out.forall(_._4 > 0))
  }

  test("markov removal effect: two disjoint paths split the credit") {
    def ev(u: Long, i: Long, t: String, tp: String) =
      (u, Timestamp.valueOf(s"2024-01-01 00:0$t:00"), i, tp)
    val events = Seq(
      ev(1, 1, "1", "view"), ev(1, 2, "2", "purchase"),
      ev(2, 3, "1", "click"), ev(2, 4, "2", "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TimeSeries.markovRemovalEffect(events, "user_id", "ts",
        "event_id", "event_type", "purchase", iters = 12)
      .as[(String, Double, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // START→view .5→purchase 1; START→click .5→purchase 1 → base 1.0
    assert(out("view")._2 == 1.0 && out("click")._2 == 1.0, out.toString)
    assert(out("view")._4.contains(0.5) && out("click")._4.contains(0.5),
      out.toString)
  }

  test("markov removal effect: sole-path channel carries everything") {
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "view"),
      (1L, Timestamp.valueOf("2024-01-01 00:02:00"), 2L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TimeSeries.markovRemovalEffect(events, "user_id", "ts",
        "event_id", "event_type", "purchase", iters = 12)
      .as[(String, Double, Double, Option[Double])].collect()
    assert(out.length == 1 && out.head._1 == "view", out.mkString(","))
    assert(out.head._2 == 1.0 && out.head._3 == 0.0 &&
      out.head._4.contains(1.0), out.head.toString)
  }

  test("dp noisy counts: reproducible per seed, bounded noise, seed-sensitive") {
    val df = Seq.fill(100)("en").toDF("lang")
    def run(seed: String) = Profiling.dpNoisyCounts(df, "lang", 1.0, seed)
      .as[(String, Double, Double)].collect().head
    val a = run("dp1")
    assert(a == run("dp1"), "same seed must replay identically")
    assert(math.abs(a._2 - 100.0) < 25.0, a.toString) // |Lap| < ln(2^31)
    assert(a._2 != run("other")._2, "different seed must redraw")
  }

  test("partition cut audit: hand graph has known cuts and balance") {
    val e = Seq((0L, 1L), (2L, 3L), (0L, 3L)).toDF("src", "dst")
    val out = graft.query.GraphQueries.partitionCutAudit(e, 2)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // hash (pmod 2): all three edges cross parity; range ([0,1]|[2,3]):
    // only (0,3) crosses
    assert(out("hash")._4 == 3L && out("hash")._5 == 1.0, out.toString)
    assert(out("range")._4 == 1L &&
      math.abs(out("range")._5 - 0.333333) < 1e-6, out.toString)
    assert(out("hash")._6 == 0.5 && out("range")._6 == 0.5, out.toString)
  }
}
