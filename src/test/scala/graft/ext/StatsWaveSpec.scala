package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Known-answer properties for the round-6 statistics/diagnostics
  * wave: HITS, rich-club, power-law MLE, ROC-AUC, chi-square,
  * Spearman, weighted median, autocorrelation, rendezvous sharding,
  * Flesch, isotropy. Each test pins the semantics on a hand-computed
  * case the oracle gates can't isolate (they run on the corpus). */
class StatsWaveSpec extends SparkSpec {
  import spark.implicits._

  test("HITS: co-cited sinks share max authority, sources are the hubs") {
    // a→c, b→c, a→d: c is the strongest authority, a the strongest hub
    val e = Seq(("a", "c"), ("b", "c"), ("a", "d")).toDF("src", "dst")
    val out = graft.query.GraphQueries.hitsScores(e, rounds = 2)
      .as[(String, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> (r._2.getOrElse(-1.0), r._3.getOrElse(-1.0))).toMap
    assert(out("a")._1 == 1.0, s"a should be the max hub: $out")
    assert(out("c")._2 == 1.0, s"c should be the max authority: $out")
    assert(out("c")._1 == 0.0 && out("d")._1 == 0.0,
      s"pure sinks must have zero hub score: $out")
    assert(out("b")._1 < 1.0 && out("b")._1 > 0.0, s"b is a weaker hub: $out")
  }

  test("rich-club: K4 is a perfect club below its degree, empty at it") {
    val vs = Seq("a", "b", "c", "d")
    val e = (for { x <- vs; y <- vs if x < y } yield (x, y)).toDF("src", "dst")
    val out = graft.query.GraphQueries.richClub(e, maxK = 4)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 6L, Some(1.0))), s"k=1: $out")
    assert(out(2L) == ((4L, 6L, Some(1.0))), s"k=2: $out")
    assert(out(3L) == ((0L, 0L, None)), s"k=3 club must be empty: $out")
  }

  test("power-law MLE matches the closed form on a hand case") {
    // xmin=2, tail {2,2,4}: alpha = 1 + 3 / (2 ln(4/3) + ln(8/3))
    val df = Seq(1L, 2L, 2L, 4L).toDF("x")
    val Array(r) = Profiling.powerlawFit(df, "x", xmin = 2L)
      .as[(Long, Option[Double], Long)].collect()
    val expect = 1.0 + 3.0 /
      (2 * math.rint(math.log(2 / 1.5) * 1e9) / 1e9 +
        math.rint(math.log(4 / 1.5) * 1e9) / 1e9)
    assert(r._1 == 3L && r._3 == 2L)
    assert(math.abs(r._2.get - expect) < 1e-6, s"alpha ${r._2} vs $expect")
  }

  test("ROC-AUC: 1 for perfect separation, 0.5 for all-tied scores") {
    val sep = Seq((1.0, true), (2.0, true), (0.1, false), (0.2, false))
      .toDF("s", "y")
    val Array(a1) = Profiling.rocAuc(sep, "s", col("y"))
      .as[(Long, Long, Option[Double])].collect()
    assert(a1 == ((2L, 2L, Some(1.0))), a1.toString)
    val tied = Seq((5.0, true), (5.0, true), (5.0, false)).toDF("s", "y")
    val Array(a2) = Profiling.rocAuc(tied, "s", col("y"))
      .as[(Long, Long, Option[Double])].collect()
    assert(a2 == ((2L, 1L, Some(0.5))), a2.toString)
  }

  test("chi-square: zero on an exactly independent 2x2 table") {
    val df = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val Array(r) = Profiling.chiSquare(df, "a", "b")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(r == ((4L, 2L, 2L, 1L, 0.0)), r.toString)
  }

  test("Spearman: +1 on any monotone map, -1 reversed, ties supported") {
    val mono = Seq((1.0, 10.0), (2.0, 300.0), (5.0, 301.0)).toDF("x", "y")
    val Array(m) = Profiling.spearman(mono, "x", "y")
      .as[(Long, Option[Double])].collect()
    assert(m == ((3L, Some(1.0))), m.toString)
    val rev = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    val Array(v) = Profiling.spearman(rev, "x", "y")
      .as[(Long, Option[Double])].collect()
    assert(v == ((3L, Some(-1.0))), v.toString)
  }

  test("weighted median: weight mass picks the value, not the row count") {
    // g1: value 10 carries 1 of 11 weight units, value 99 carries 10
    val df = Seq(("g1", 10.0, 1.0), ("g1", 99.0, 10.0),
      ("g2", 5.0, 2.0), ("g2", 7.0, 2.0)).toDF("g", "v", "w")
    val out = Profiling.weightedMedian(df, "g", "v", "w")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out("g1") == 99.0, s"weight mass must win: $out")
    assert(out("g2") == 5.0, s"even split takes the smaller value: $out")
  }

  test("ACF: lag-1 negative on an alternating series, null on a constant") {
    def ev(xs: Seq[Int]) = xs.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map(_ => Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"))
    }.toDF("ts")
    val alt = TimeSeries.autocorrelation(ev(Seq(1, 5, 1, 5, 1, 5, 1, 5)), "ts", 2)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> r._3).toMap
    // exact finite-sample values for n=8 alternating: -7/8 and 3/4
    assert(alt(1L).contains(-0.875), s"alternating series lag-1: $alt")
    assert(alt(2L).contains(0.75), s"period 2 at lag 2: $alt")
    val const = TimeSeries.autocorrelation(ev(Seq(3, 3, 3, 3)), "ts", 1)
      .as[(Long, Long, Option[Double])].collect()
    assert(const.head._3.isEmpty, s"zero variance must yield null: ${const.toSeq}")
  }

  test("rendezvous sharding: in-range, deterministic, balanced, minimal movement") {
    val ids = (0L until 500L).toDF("doc_id")
    val s8 = Sampling.rendezvousShard(ids, "doc_id", 8)
    val m8 = s8.as[(Long, Long)].collect().toMap
    assert(m8.values.forall(s => s >= 0 && s < 8), "shard out of range")
    val again = Sampling.rendezvousShard(ids, "doc_id", 8)
      .as[(Long, Long)].collect().toMap
    assert(m8 == again, "assignment must be deterministic")
    val counts = m8.values.groupBy(identity).map(_._2.size)
    assert(counts.size == 8 && counts.min > 20,
      s"degenerate balance (the affine-fingerprint failure): $counts")
    val m9 = Sampling.rendezvousShard(ids, "doc_id", 9)
      .as[(Long, Long)].collect().toMap
    val moved = m8.count { case (id, s) => m9(id) != s }
    assert(moved > 10 && moved < 125,
      s"moved $moved of 500 on 8→9; rendezvous should move ~1/9")
    assert(m8.forall { case (id, s) => m9(id) == s || m9(id) == 8 },
      "rendezvous may only move keys INTO the new shard")
  }

  test("Flesch parts match the hand count") {
    val df = Seq((1L, "The cat sat. The dog ran!")).toDF("doc_id", "text")
    val Array(r) = df.select(Seq(col("doc_id")) ++
        TextAnalysis.fleschParts(col("text")): _*)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
    // 6 words, 2 sentence runs, 6 vowel runs:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(r == ((1L, 6L, 2L, 6L, Some(119.19))), r.toString)
  }

  test("isotropy: collapsed pair vs orthogonal pair") {
    val same = Seq((1L, Seq(3.0f, 0.0f, 0.0f)), (2L, Seq(5.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val Array(c) = Similarity.isotropy(same, "vec_id", "embedding")
      .as[(Long, Double, Double, Option[Double])].collect()
    assert(c._1 == 2L && c._4.contains(1.0), s"collapsed cone: $c")
    assert(c._3 == 1.0, s"mean normalized vector must be unit: $c")
    assert(c._2 == 4.0, s"avg original norm (3+5)/2: $c")
    val ortho = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val Array(o) = Similarity.isotropy(ortho, "vec_id", "embedding")
      .as[(Long, Double, Double, Option[Double])].collect()
    assert(o._4.contains(0.0), s"orthogonal pair avg cos: $o")
    assert(math.abs(o._3 - 0.707107) < 1e-6, s"mean vec norm sqrt(2)/2: $o")
  }
}
