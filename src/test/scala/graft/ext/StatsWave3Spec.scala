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

  test("JSD: identical corpora score 0, disjoint corpora score 1") {
    val a = Seq("a b", "a b a").toDF("text")
    val same = TextAnalysis.jsDivergence(a, a, "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(same == ((2L, 0L, 0L, 5L, 5L, 0.0)), same.toString)
    val b = Seq("c d c", "d d").toDF("text")
    val disj = TextAnalysis.jsDivergence(a, b, "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(disj == ((4L, 2L, 2L, 5L, 5L, 1.0)), disj.toString)
    // partial overlap lands strictly inside (0, 1)
    val c = Seq("a b c c").toDF("text")
    val mid = TextAnalysis.jsDivergence(a, c, "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(mid._6 > 0.0 && mid._6 < 1.0, mid.toString)
  }

  test("Cohen's kappa: textbook 2x2 gives 0.4; perfect agreement gives 1") {
    // n00=20 n01=5 n10=10 n11=15: po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)((false, false)) ++ Seq.fill(5)((false, true)) ++
      Seq.fill(10)((true, false)) ++ Seq.fill(15)((true, true))
    val df = rows.toDF("a", "b")
    val Array(r) = Profiling.cohensKappa(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect()
    assert(r == ((50L, 20L, 5L, 10L, 15L, 0.7, 0.5, Some(0.4))), r.toString)
    val perfect = Seq((true, true), (false, false)).toDF("a", "b")
    val Array(p) = Profiling.cohensKappa(perfect, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect()
    assert(p._8 == Some(1.0), p.toString)
    // both raters constant-true: chance agreement is total → null
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    val Array(c) = Profiling.cohensKappa(const, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect()
    assert(c._8.isEmpty, c.toString)
  }

  test("k-center walks to the farthest point each round") {
    // v0 seed; v3 is antipodal (picked first), v2 orthogonal, v1 a dup
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)), (3L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kcenterSelect(df, "vec_id", "embedding",
        k = 4, seedId = 0L)
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, None), (2L, 3L, Some(-1.0)),
      (3L, 2L, Some(0.0)), (4L, 1L, Some(1.0))), out.mkString(","))
  }

  test("hamming top-k: sign packing and XOR distance replay by hand") {
    // 2-dim signs: v0=(+,+)→11b, v1=(+,−)→01b, v2=(−,−)→00b, v3=(+,+)
    val df = Seq((0L, Array(1f, 1f)), (1L, Array(1f, -1f)),
      (2L, Array(-1f, -1f)), (3L, Array(2f, 3f)))
      .toDF("vec_id", "embedding")
    val packed = df.select(
        Similarity.signPack("embedding", 2).as("sig"))
      .as[Long].collect().toSeq
    assert(packed == Seq(3L, 1L, 0L, 3L), packed.toString)
    val out = Similarity.hammingTopK(df, df.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 3, dim = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((0L, 1L, 3L, 0L), (0L, 2L, 1L, 1L),
      (0L, 3L, 2L, 2L)), out.mkString(","))
  }

  test("multi-word sign packing: word 0 matches signPack, wide hamming exact") {
    // 70-dim vectors: 2 words; dims 0..63 in word 0, 64..69 in word 1
    def vec(flipAt: Set[Int]) =
      (0 until 70).map(i => if (flipAt(i)) -1f else 1f).toArray
    val df = Seq(
      (0L, vec(Set.empty)),
      (1L, vec(Set(0, 65))),          // differs at dim 0 (word 0) + 65 (word 1)
      (2L, vec((0 until 70).toSet)))  // all flipped
      .toDF("vec_id", "embedding")
    // word 0 of the multi-word pack == the single-word pack of dims 0..63
    val both = df.select(
        Similarity.signPackWords("embedding", 70).as("w"),
        Similarity.signPack("embedding", 64).as("s"))
      .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
    assert(both.forall { case (w, s) => w.length == 2 && w.head == s })
    val out = Similarity.hammingTopK(df, df.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 2, dim = 70)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((0L, 1L, 1L, 2L), (0L, 2L, 2L, 70L)),
      out.mkString(","))
  }

  test("Cramér's V: perfect association scores 1, degenerate table nulls") {
    val perfect = (Seq.fill(6)(("x", "p")) ++ Seq.fill(4)(("y", "q")))
      .toDF("a", "b")
    val Array(p) = Profiling.cramersV(perfect, "a", "b")
      .select(col("chi2"), col("min_dof"), col("v"))
      .as[(Double, Long, Option[Double])].collect()
    assert(p == ((10.0, 1L, Some(1.0))), p.toString)
    val degen = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val Array(g) = Profiling.cramersV(degen, "a", "b")
      .select(col("v")).as[Option[Double]].collect()
    assert(g.isEmpty, g.toString)
  }

  test("Simpson diversity: exact hand ratios, singleton group nulls d") {
    val df = Seq(("g1", "a a b b"), ("g2", "z")).toDF("src", "text")
    val out = TextAnalysis.simpsonDiversity(df, "src", "text")
      .as[(String, Long, Long, Option[Double], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // g1: N=4, cc1=4 → d=4/12; c2=8 → inv=16/8=2
    assert(out("g1") == ((4L, 2L, Some(0.333333), 2.0)), out.toString)
    assert(out("g2") == ((1L, 1L, None, 1.0)), out.toString)
  }

  test("landmark eccentricity: path graph hand case + diameter row") {
    // path a−b−c−d symmetrized; landmarks a, b
    val canon = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val e = canon.unionByName(canon.select(col("dst").as("src"),
      col("src").as("dst")))
    val lms = Seq(1L, 2L).toDF("node")
    val out = graft.query.GraphQueries.landmarkEccentricity(e, lms, rounds = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3L, 3L)), out.toString)   // a: reaches b,c,d; ecc 3
    assert(out(2L) == ((3L, 2L)), out.toString)   // b: reaches a,c,d; ecc 2
    assert(out(-1L) == ((6L, 3L)), out.toString)  // diameter lower bound
  }

  test("power iteration: w = Xt(X·1) replays by hand, norm to unit") {
    val df = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 2f)))
      .toDF("vec_id", "embedding")
    // s = (1, 2); w = (1·1, 2·2) = (1, 4); ‖w‖ = sqrt(17)
    val out = Similarity.powerIterationStep(df, "vec_id", "embedding")
      .as[(Long, Double, Option[Double])].collect().sortBy(_._1)
    def d6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0) == ((0L, 1.0, Some(d6(1.0 / math.sqrt(17))))),
      out.mkString(","))
    assert(out(1) == ((1L, 4.0, Some(d6(4.0 / math.sqrt(17))))),
      out.mkString(","))
  }

  test("recall curve: hits at each cutoff vs corpus-wide totals") {
    val res = Seq(("q1", 1, 1L), ("q1", 2, 0L), ("q1", 7, 1L),
      ("q2", 1, 0L)).toDF("query_id", "rank", "rel")
    val tot = Seq(("q1", 4L), ("q2", 0L)).toDF("query_id", "n_relevant")
    val out = Similarity.recallCurve(res, "query_id", "rank", "rel", tot)
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("q1") == ((4L, 1L, 1L, 2L, Some(0.5))), out.toString)
    assert(out("q2") == ((0L, 0L, 0L, 0L, None)), out.toString)
  }

  test("SRM: exact split scores 0, a starved bucket owes its full term") {
    val exact = (Seq.fill(8)("train") ++ Seq("val", "test")).toDF("split")
    val ws = Seq(("train", 80), ("val", 10), ("test", 10))
    val ok = Sampling.srmCheck(exact, "split", ws)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(ok("train") == ((8L, 8.0, 0.0)) && ok("TOTAL") == ((10L, 10.0, 0.0)),
      ok.toString)
    // 5/5/0 against 80/10/10: χ² = 1.125 + 16 + 1 = 18.125
    val skew = (Seq.fill(5)("train") ++ Seq.fill(5)("val")).toDF("split")
    val bad = Sampling.srmCheck(skew, "split", ws)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(bad("test") == ((0L, 1.0, 1.0)), bad.toString)
    assert(bad("TOTAL") == ((10L, 10.0, 18.125)), bad.toString)
  }

  test("two-proportion z: textbook pooled case, degenerate rates null out") {
    val units = Seq((true, true), (true, false), (false, false),
      (false, false)).toDF("arm", "s")
    val Array(r) = Profiling.twoProportionZ(units, col("arm"), col("s"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect()
    // z = 0.5 / sqrt(0.25 · 0.75 · 1) = 1.154701
    assert(r == ((2L, 1L, 2L, 0L, Some(0.5), Some(0.0), Some(1.154701))),
      r.toString)
    val all = Seq((true, true), (false, true)).toDF("arm", "s")
    val Array(a) = Profiling.twoProportionZ(all, col("arm"), col("s"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(a._7.isEmpty, a.toString)
  }

  test("up-streaks: islands, longest and current runs by hand") {
    val daily = Seq((1, 1L), (2, 2L), (3, 3L), (4, 2L), (5, 3L), (6, 4L),
      (7, 5L)).map { case (d, x) => (java.sql.Date.valueOf(f"2024-01-$d%02d"), x) }
      .toDF("dt", "x")
    val Array(r) = TimeSeries.upStreaks(daily, "dt", "x")
      .as[(Long, Long, Long, Long)].collect()
    assert(r == ((7L, 5L, 3L, 3L)), r.toString)
    val flat = Seq((1, 5L), (2, 5L), (3, 5L)).map { case (d, x) =>
      (java.sql.Date.valueOf(f"2024-01-$d%02d"), x) }.toDF("dt", "x")
    val Array(f) = TimeSeries.upStreaks(flat, "dt", "x")
      .as[(Long, Long, Long, Long)].collect()
    assert(f == ((3L, 0L, 0L, 0L)), f.toString)
  }

  test("nearest as-of: direction choice, backward ties, tolerance cutoff") {
    def ev(id: Long, t: Long, typ: String) =
      (id, new Timestamp(t * 1000L), 1L, typ)
    val events = Seq(
      ev(1, 0, "view"), ev(2, 100, "view"),
      ev(10, 99, "purchase"),   // back gap 99 vs fwd gap 1 → forward
      ev(11, 10, "purchase"),   // view@0 vs view@100: back wins (10 < 90)
      ev(12, 5000, "purchase"), // both beyond tol → null
      ev(13, 100, "purchase")   // same-ts view counts backward, gap 0
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.streaming.Streams.asOfNearest(events, "view", "purchase",
        toleranceSec = 1000)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    assert(out(10L) == ((Some(100000000L), Some(1000000L))), out.toString)
    assert(out(11L) == ((Some(0L), Some(-10000000L))), out.toString)
    assert(out(12L) == ((None, None)), out.toString)
    assert(out(13L) == ((Some(100000000L), Some(0L))), out.toString)
    // exact-distance tie → backward
    val tie = Seq(ev(1, 0, "view"), ev(2, 20, "view"), ev(10, 10, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val Array(t) = graft.streaming.Streams.asOfNearest(tie, "view",
        "purchase", toleranceSec = 1000)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(t._4 == Some(0L) && t._5 == Some(-10000000L), t.toString)
  }

  test("centroid drift: rounded-component cosine replays by hand") {
    val df = Seq(("g1", Array(1f, 0f)), ("g1", Array(1f, 0f)),
      ("g2", Array(0f, 1f))).toDF("src", "embedding")
    val out = Similarity.centroidDrift(df, "src", "embedding")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def r12(x: Double) = math.rint(x * 1e12) / 1e12
    val (gx, gy) = (r6(2.0 / 3), r6(1.0 / 3))
    val nb = r12(gx * gx) + r12(gy * gy)
    val cos1 = r6(r12(1.0 * gx) / math.sqrt(nb))
    val cos2 = r6(r12(1.0 * gy) / math.sqrt(nb))
    assert(out("g1") == ((2L, Some(cos1))), s"${out("g1")} vs $cos1")
    assert(out("g2") == ((1L, Some(cos2))), s"${out("g2")} vs $cos2")
  }

  test("naive forecast error: calendar-aligned pairs, exact sums") {
    val daily = Seq((1, 5L), (2, 3L), (8, 7L), (9, 3L), (11, 9L))
      .map { case (d, x) => (java.sql.Date.valueOf(f"2024-01-$d%02d"), x) }
      .toDF("dt", "x")
    val Array(r) = TimeSeries.naiveForecastError(daily, "dt", "x", lagDays = 7)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    // pairs: (5→7) ae=2, (3→3) ae=0; day 11 has no lag-7 partner
    assert(r == ((2L, 2L, Some(1.0), Some(0.2), Some(0.166667))), r.toString)
  }

  test("ANOVA F: textbook three-group case, within-only variance nulls") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6),
      ("c", 7), ("c", 8), ("c", 9)).toDF("g", "v")
    val Array(r) = Profiling.anovaF(df, "g", "v")
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    // Sg = 6,15,24; Sg²/ng = 12,75,192 → A=279; S²/n = 45²/9 = 225
    // SSB = 54; SSW = Q − A = 285 − 279 = 6; F = (54/2)/(6/6) = 27
    assert(r == ((9L, 3L, 54.0, 6.0, Some(27.0))), r.toString)
    // identical groups → SSB 0, F 0; constant data → SSW 0 → null
    val const = Seq(("a", 5), ("a", 5), ("b", 5), ("b", 5)).toDF("g", "v")
    val Array(c) = Profiling.anovaF(const, "g", "v")
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    assert(c._5.isEmpty && c._3 == 0.0 && c._4 == 0.0, c.toString)
  }

  test("corr matrix: perfect, inverted and zero-variance pairs in one pass") {
    val df = Seq((1L, 2L, 9L, 5L), (2L, 4L, 8L, 5L), (3L, 6L, 7L, 5L))
      .toDF("a", "b", "c", "d")
    val out = Profiling.corrMatrix(df, Seq("a" -> col("a"), "b" -> col("b"),
        "c" -> col("c"), "d" -> col("d")))
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", "b")) == Some(1.0), out.toString)   // b = 2a
    assert(out(("a", "c")) == Some(-1.0), out.toString)  // c = 10 − a
    assert(out(("a", "d")).isEmpty, out.toString)        // d constant
    assert(out.size == 6, out.toString)
  }

  test("chrono split: cutoff at the row-mass quantile, embargo quarantined") {
    // 10 rows over days 1..10 (one per day): 80% cutoff = day 8,
    // embargo 1 day = day 9, test = day 10
    val df = (1 to 10).map(d =>
      Tuple1(new Timestamp(java.sql.Date.valueOf(f"2024-03-$d%02d").getTime)))
      .toDF("ts")
    val out = Sampling.chronoSplit(df, "ts", trainPct = 80, embargoDays = 1)
      .as[(String, Long, java.sql.Date, java.sql.Date)].collect()
      .map(r => r._1 -> ((r._2, r._3.toString, r._4.toString))).toMap
    assert(out("train") == ((8L, "2024-03-01", "2024-03-08")), out.toString)
    assert(out("embargo") == ((1L, "2024-03-09", "2024-03-09")), out.toString)
    assert(out("test") == ((1L, "2024-03-10", "2024-03-10")), out.toString)
  }

  test("DF PageRank: mass conserved, symmetry respected, hub ranked up") {
    // path a−b−c symmetrized: a and c are exchangeable, b is the hub
    val canon = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val e = canon.unionByName(canon.select(col("dst").as("src"),
      col("src").as("dst")))
    val out = graft.query.GraphQueries.pagerankDf(e, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-6, out.toString)
    assert(out(1L) == out(3L), s"symmetric endpoints must tie: $out")
    assert(out(2L) > out(1L), s"the hub must outrank the leaves: $out")
  }

  test("edge Jaccard: triangle + pendant hand case") {
    // triangle a,b,c plus pendant d on a
    val canon = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val out = graft.query.GraphQueries.edgeJaccard(canon)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out((1L, 2L)) == ((1L, 3L, 2L, 0.25)), out.toString)
    assert(out((1L, 3L)) == ((1L, 3L, 2L, 0.25)), out.toString)
    assert(out((2L, 3L)) == ((1L, 2L, 2L, 0.333333)), out.toString)
    assert(out((1L, 4L)) == ((0L, 3L, 1L, 0.0)), out.toString)
  }

  test("mutual info: perfect association is 1 bit, independence is 0") {
    val perfect = (Seq.fill(2)(("x", "p")) ++ Seq.fill(2)(("y", "q")))
      .toDF("a", "b")
    val Array(p) = Profiling.mutualInfo(perfect, "a", "b")
      .as[(Long, Double, Double, Double, Option[Double])].collect()
    assert(p == ((4L, 1.0, 1.0, 1.0, Some(1.0))), p.toString)
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val Array(i) = Profiling.mutualInfo(indep, "a", "b")
      .as[(Long, Double, Double, Double, Option[Double])].collect()
    assert(i == ((4L, 1.0, 1.0, 0.0, Some(0.0))), i.toString)
    // constant margin → zero entropy → NMI null
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val Array(c) = Profiling.mutualInfo(const, "a", "b")
      .as[(Long, Double, Double, Double, Option[Double])].collect()
    assert(c._2 == 0.0 && c._5.isEmpty, c.toString)
  }

  test("hop histogram: path-graph distances and the 90% marker") {
    // path a−b−c−d symmetrized; landmarks a, b →
    // d=1: 3 pairs, d=2: 2, d=3: 1; only the last bucket reaches 90%
    val canon = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val e = canon.unionByName(canon.select(col("dst").as("src"),
      col("src").as("dst")))
    val lms = Seq(1L, 2L).toDF("node")
    val out = graft.query.GraphQueries.hopHistogram(e, lms, rounds = 3)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 3L, false), (2L, 2L, 5L, false),
      (3L, 1L, 6L, true)), out.mkString(","))
  }

  test("listagg gate is partition-order independent") {
    val a = Seq(("g", "zeta"), ("g", "alpha"), ("g", "mid")).toDF("k", "v")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("k"))
        .agg(array_join(array_sort(collect_list(col("v"))), ",").as("names"))
        .as[(String, String)].collect().toMap
    assert(agg(a) == Map("g" -> "alpha,mid,zeta"))
    assert(agg(a.repartition(7)) == Map("g" -> "alpha,mid,zeta"))
  }

  test("balance labels: every class lands exactly at the minority count") {
    val df = (Seq.fill(5)(0) ++ Seq.fill(3)(1) ++ Seq.fill(7)(2))
      .zipWithIndex.map { case (l, i) => (l, i.toLong) }.toDF("label", "vid")
    val out = Sampling.balanceLabels(df, "label", "vid")
      .as[(Int, Long)].collect()
    val byLabel = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLabel == Map(0 -> 3, 1 -> 3, 2 -> 3), byLabel.toString)
    // deterministic under physical layout changes
    val out2 = Sampling.balanceLabels(df.repartition(5), "label", "vid")
      .as[(Int, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      out2.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("rank-1 energy: collinear corpus scores 1, orthogonal pair ~1/2") {
    val collinear = Seq((0L, Array(2f, 0f)), (1L, Array(-3f, 0f)))
      .toDF("vec_id", "embedding")
    val Array(c) = Similarity.rank1Energy(collinear, "vec_id", "embedding")
      .as[(Long, Double, Double, Option[Double])].collect()
    assert(c == ((2L, 13.0, 13.0, Some(1.0))), c.toString)
    val ortho = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val Array(o) = Similarity.rank1Energy(ortho, "vec_id", "embedding")
      .as[(Long, Double, Double, Option[Double])].collect()
    assert(o._4.exists(r => r > 0.49 && r < 0.51), o.toString)
  }

  test("Wilson interval: replays the closed form, stays inside [0,1]") {
    val units = (Seq.fill(1)(true) ++ Seq.fill(3)(false)).map(("a", _))
      .toDF("g", "s")
    val Array(r) = Profiling.wilsonInterval(units, "g", col("s"))
      .as[(String, Long, Long, Double, Double, Double)].collect()
    val (z, n, x) = (1.96, 4.0, 1.0)
    val (zz, ph) = (z * z, x / n)
    val denom = 1.0 + zz / n
    val center = ph + zz / (n * 2)
    val half = z * math.sqrt(ph * (1.0 - ph) / n + zz / (n * n * 4))
    def d6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(r == (("a", 4L, 1L, 0.25, d6((center - half) / denom),
      d6((center + half) / denom))), r.toString)
    assert(r._5 > 0.0 && r._6 < 1.0 && r._5 < 0.25 && r._6 > 0.25, r.toString)
  }

  test("MV merge: batch-folded summaries equal the direct recompute") {
    val docs = Seq((0L, "g1", "a b c", 5L), (1L, "g1", "d e", 3L),
      (2L, "g2", "f", 1L), (3L, "g1", "g h i j", 7L))
      .toDF("doc_id", "source", "text", "n_chars")
    val parts = (0 until 3).map(i =>
      Materialize.docSummary(docs.filter(col("doc_id") % 3 === i), "source"))
    val merged = Materialize.mergeSummaries(parts)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val direct = Materialize.docSummary(docs, "source")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(merged == direct && merged == Seq(("g1", 3L, 9L, 15L),
      ("g2", 1L, 1L, 1L)), s"$merged vs $direct")
  }

  test("CMS join cardinality: exact truth, never-under and bound hold") {
    val r = Seq(1L, 1L, 2L).toDF("k")
    val s = Seq(1L, 2L, 2L, 3L).toDF("k")
    val Array(out) = Sketches.cmsJoinCardinality(r, s, "k")
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
    assert(out == ((3L, 4L, 4L, true, true)), out.toString)
  }

  test("decay attribution: two-touch hand case with exact ladder replay") {
    def ev(id: Long, t: Long, typ: String) =
      (id, new Timestamp(t * 1000L), 9L, typ)
    val events = Seq(ev(1, 0, "click"), ev(2, 3600, "view"),
      ev(3, 7200, "purchase"),
      ev(4, -200000, "click") // beyond the 24 h window
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = TimeSeries.decayAttribution(events, "user_id", "ts",
        "event_type", "purchase", windowMinutes = 1440, halfLifeMinutes = 120)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val (wc, wv) = (r9(math.pow(2, -1.0)), r9(math.pow(2, -0.5)))
    val tot = wc + wv
    assert(out("click") == ((1L, r4(r9(wc / tot)))), out.toString)
    assert(out("view") == ((1L, r4(r9(wv / tot)))), out.toString)
    assert(out.size == 2, s"out-of-window touch must be excluded: $out")
  }

  test("DAU/WAU: sliding distinct counts by hand, stickiness exact") {
    // u1 active days 1,2; u2 active day 2 only
    val ev = Seq((1, 1L), (2, 1L), (2, 2L)).map { case (d, u) =>
      (new Timestamp((d - 1) * 86400000L), u) }.toDF("ts", "user_id")
    val out = TimeSeries.dauWau(ev, "user_id", "ts", windowDays = 7)
      .as[(java.sql.Date, Long, Long, Double)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4))).toMap
    assert(out("1970-01-01") == ((1L, 1L, 1.0)), out.toString)
    // day 2: dau 2; wau = distinct over days {−5..2} = {u1, u2} = 2
    assert(out("1970-01-02") == ((2L, 2L, 1.0)), out.toString)
    assert(out.size == 2, out.toString)
  }

  test("periodogram: a pure 2-cycle series concentrates power at k=n/2") {
    // alternating 10,2 over 8 days: all AC power at the Nyquist bin
    val ev = (0 until 8).flatMap(d =>
      (0 until (if (d % 2 == 0) 10 else 2)).map(i => Tuple1(dayTs(d, i))))
      .toDF("ts")
    val out = TimeSeries.periodogram(ev, "ts")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(out.size == 4, out.toString)
    assert(out(4L) > 100 * math.max(out(1L), math.max(out(2L), out(3L))),
      s"k=4 must dominate: $out")
  }

  test("partial correlation: a pure confound collapses to null-or-zero") {
    // x and y both driven entirely by z: r_xy ≈ 1 via z alone, and
    // controlling z leaves no residual variance → null
    val df = (1 to 20).map(i => (i.toLong, i * 2L, i * 3L))
      .toDF("xx", "yy", "zz")
    val Array(r) = Profiling.partialCorr(df, "x" -> col("xx"),
        "y" -> col("yy"), "z" -> col("zz"))
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(r._1 == Some(1.0) && r._2 == Some(1.0) && r._4.isEmpty,
      r.toString)
    // independent z: partial equals the raw correlation
    val mixed = Seq((1L, 2L, 5L), (2L, 4L, 5L), (3L, 6L, 9L), (4L, 8L, 9L))
      .toDF("xx", "yy", "zz")
    val Array(m) = Profiling.partialCorr(mixed, "x" -> col("xx"),
        "y" -> col("yy"), "z" -> col("zz"))
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(m._1 == Some(1.0) && m._4.exists(_ > 0.99), m.toString)
  }

  test("max cover: greedy bigram gains, fully-covered docs can't win") {
    val docs = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = Sampling.maxCoverSelect(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc1 covers {a b, b c, c d} (3), doc3 adds {x y, y z} (2);
    // doc2's only bigram is then covered → no third pick
    assert(out.toSeq == Seq((1L, 1L, 3L), (2L, 3L, 2L)), out.mkString(","))
  }

  test("tiered rerank: hamming tier bounds the exact rescore set") {
    val df = Seq((0L, Array(1f, 0.1f)), (1L, Array(1f, 0.2f)),
      (2L, Array(1f, -0.1f)), (3L, Array(-1f, -0.5f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.tieredRerank(df, df.filter(col("vec_id") === 0),
        "vec_id", "embedding", m = 2, k = 2, dim = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    // tier-1 keeps {1 (hamming 0), 2 (hamming 1)}; 3 never rescored
    assert(out.map(_._3).toSeq == Seq(1L, 2L), out.mkString(","))
    assert(out(0)._4 > out(1)._4, out.mkString(","))
  }

  test("Cohen's d: unit-variance shifted groups score the mean gap") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6))
      .toDF("g", "v")
    val Array(r) = Profiling.cohensD(df, "g", "v", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    assert(r == ((3L, 3L, 2.0, 5.0, Some(-3.0))), r.toString)
    val const = Seq(("a", 5), ("a", 5), ("b", 5), ("b", 5)).toDF("g", "v")
    val Array(c) = Profiling.cohensD(const, "g", "v", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    assert(c._5.isEmpty, c.toString)
  }

  test("Kaplan–Meier: textbook risk table with censoring, S steps exactly") {
    def ev(u: Long, day: Int, typ: String) =
      (u, new Timestamp(day * 86400000L), typ)
    val events = Seq(
      ev(1, 0, "signup"), ev(2, 0, "signup"), ev(3, 0, "signup"),
      ev(4, 0, "signup"), ev(5, 0, "signup"),
      ev(1, 1, "purchase"), ev(4, 1, "purchase"), ev(2, 2, "purchase"),
      ev(5, -1, "purchase"),  // pre-signup: must censor, not drop
      ev(3, 3, "view")        // horizon marker: censor time = day 3
    ).toDF("user_id", "ts", "event_type")
    val out = TimeSeries.kmSurvival(events, "user_id", "ts", "event_type",
        "signup", "purchase")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // t=1: risk 5, events 2 → S=0.6; t=2: risk 3, events 1 → S=0.4
    assert(out.toSeq == Seq((1L, 5L, 2L, 0.6), (2L, 3L, 1L, 0.4)),
      out.mkString(","))
  }

  test("table checksum: layout-invariant, sensitive to a single cell") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    def sums(d: org.apache.spark.sql.DataFrame) =
      Profiling.tableChecksum(d, Seq(col("k"), col("v")))
        .as[(Long, Long, Long)].collect().head
    val base = sums(df)
    assert(sums(df.repartition(5)) == base, "layout must not matter")
    val changed = sums(Seq((1L, "a"), (2L, "b"), (3L, "d")).toDF("k", "v"))
    assert(changed._2 != base._2 || changed._3 != base._3,
      s"single-cell change must move the checksum: $base vs $changed")
  }

  test("Durbin–Watson: alternating residuals push DW toward 4") {
    // daily counts 5,1,5,1 → residuals ±(0.8, 2.4): DW = 3.4, rho −0.7
    val ev = Seq(5, 1, 5, 1).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => Tuple1(dayTs(d, i))) }.toDF("ts")
    val Array(r) = TimeSeries.durbinWatson(ev, "ts")
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(r == ((4L, Some(3.4), Some(-0.7))), r.toString)
    // perfect line → zero residuals → DW undefined
    val line = Seq(1, 2, 3).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => Tuple1(dayTs(d, i))) }.toDF("ts")
    val Array(l) = TimeSeries.durbinWatson(line, "ts")
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(l._2.isEmpty && l._3.isEmpty, l.toString)
  }

  test("label prop: majority vote with smallest-label ties, seeds keep") {
    // star: center 9 unlabeled, leaves 1(l=5), 2(l=5), 3(l=7);
    // leaf 4 unlabeled and connected only to 9 (no labeled nbr)
    val canon = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L)).toDF("src", "dst")
    val e = canon.unionByName(canon.select(col("dst").as("src"),
      col("src").as("dst")))
    val seeds = Seq((1L, 5L), (2L, 5L), (3L, 7L)).toDF("node", "label")
    val out = graft.query.GraphQueries.labelPropRound(e, seeds)
      .as[(Long, Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(9L) == ((5L, "prop", Some(2L))), out.toString)
    assert(out(1L) == ((5L, "seed", None)), out.toString)
    assert(!out.contains(4L), s"no labeled neighbor → no row: $out")
    // exact vote tie → smallest label wins
    val tie = graft.query.GraphQueries.labelPropRound(e,
        Seq((1L, 8L), (2L, 6L)).toDF("node", "label"))
      .as[(Long, Long, String, Option[Long])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(tie(9L) == 6L, tie.toString)
  }

  test("Neyman allocation: variance earns budget, quotas sum exactly") {
    // a: n=4 sd=0 → w=0; b: n=2 values {0,10}; c: n=2 values {0,1000}
    val df = (Seq.fill(4)(("a", 5)) ++ Seq(("b", 0), ("b", 10),
      ("c", 0), ("c", 1000))).toDF("g", "v")
    val out = Sampling.neymanAllocation(df, "g", "v", budget = 10)
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(out("a")._2 == 0L, out.toString)
    assert(out.values.map(_._2).sum == 10L, out.toString)
    assert(out("c")._2 > out("b")._2, s"higher sd must earn more: $out")
  }

  test("binseg: a planted level shift splits exactly at the jump") {
    // days 1-5 at 3/day, days 6-10 at 12/day
    val ev = (0 until 10).flatMap(d =>
      (0 until (if (d < 5) 3 else 12)).map(i => Tuple1(dayTs(d, i))))
      .toDF("ts")
    val Array(r) = TimeSeries.binsegChangepoint(ev, "ts")
      .as[(java.sql.Date, Long, Long, Double, Double, Double)].collect()
    assert(r._1.toString == "1970-01-06" && r._2 == 5L && r._3 == 5L &&
      r._4 == 3.0 && r._5 == 12.0, r.toString)
    // SSB at the true split: 5·3²+5·12² − 10·7.5² = 45+720−562.5 = 202.5
    assert(r._6 == 202.5, r.toString)
  }

  test("mutual kNN: reciprocated pair + hub one-way edge by hand") {
    val df = Seq((0L, Array(1f, 0f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val Array(r) = Similarity.mutualKnnStats(df, "vec_id", "embedding", k = 1)
      .as[(Long, Long, Long, Double)].collect()
    // 0↔1 mutual; 2→1 unreciprocated: 3 directed, 1 mutual
    assert(r == ((3L, 3L, 1L, 0.666667)), r.toString)
  }

  test("template prefixes: shared heads group, short docs use full text") {
    val docs = Seq((1L, "x y alpha"), (2L, "x y beta"), (3L, "z w"),
      (4L, "z w")).toDF("doc_id", "text")
    val out = TextAnalysis.templatePrefixes(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    assert(out.length == 2, out.mkString(","))
    assert(out(0)._2 == 2L && out(0)._3 == 1L && out(0)._4 == 2L,
      out.mkString(","))
    assert(out(1)._2 == 2L && out(1)._3 == 3L && out(1)._4 == 4L,
      out.mkString(","))
  }

  test("Katz truncated: path-graph walk counts replay exactly") {
    val canon = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val e = canon.unionByName(canon.select(col("dst").as("src"),
      col("src").as("dst")))
    val out = graft.query.GraphQueries.katzTruncated(e)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(1L) == ((1L, 2L, 2L, 122L, 0.122)), out.toString)
    assert(out(2L) == ((2L, 2L, 4L, 224L, 0.224)), out.toString)
    assert(out(3L) == ((1L, 2L, 2L, 122L, 0.122)), out.toString)
  }

  test("dedup yield: cross-source duplicate credits the min-id source") {
    val docs = Seq((1L, "s1", "a b c"), (2L, "s2", "a b c"),
      (3L, "s2", "d e"), (4L, "s2", "d e")).toDF("doc_id", "source", "text")
    val out = Dedup.dedupYield(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // s1 keeps its copy (min id); s2 loses the cross-source dup AND
    // one in-source dup: raw 2+2+2 = 6 tokens, kept only "d e"
    assert(out("s1") == ((1L, 3L, 1L, 3L, Some(1.0))), out.toString)
    assert(out("s2") == ((3L, 7L, 1L, 2L, Some(0.285714))), out.toString)
  }

  test("cumulative uniques: first-seen trick replays running distinct") {
    // u1 on days 1,2; u2 on day 2; u3 on day 3
    val ev = Seq((1, 1L), (2, 1L), (2, 2L), (3, 3L)).map { case (d, u) =>
      (new Timestamp((d - 1) * 86400000L), u) }.toDF("ts", "user_id")
    val out = TimeSeries.cumulativeUniques(ev, "user_id", "ts")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("1970-01-01") == ((1L, 1L, 1L, 0L)), out.toString)
    assert(out("1970-01-02") == ((2L, 1L, 2L, 1L)), out.toString)
    assert(out("1970-01-03") == ((1L, 1L, 3L, 0L)), out.toString)
  }

  test("moments: symmetric data has zero skew, uniform kurtosis known") {
    // {1,2,3}: mean 2, m2 = 2/3, skew 0, kurt = m4/m2² − 3 = −1.5
    val df = Seq(("g", 1), ("g", 2), ("g", 3)).toDF("s", "v")
    val Array(r) = Profiling.moments(df, "s", "v")
      .as[(String, Long, Double, Double, Option[Double], Option[Double])]
      .collect()
    assert(r._1 == "g" && r._2 == 3L && r._3 == 2.0, r.toString)
    assert(math.abs(r._4 - 2.0 / 3) < 1e-5 && r._5 == Some(0.0) &&
      r._6 == Some(-1.5), r.toString)
    // right-skewed {0,0,0,4}: skew positive
    val sk = Seq(("g", 0), ("g", 0), ("g", 0), ("g", 4)).toDF("s", "v")
    val Array(k) = Profiling.moments(sk, "s", "v")
      .as[(String, Long, Double, Double, Option[Double], Option[Double])]
      .collect()
    assert(k._5.exists(_ > 1.0), k.toString)
  }

  test("systematic PPS: integer ticks, multiplicity for heavy items") {
    val df = Seq((1L, 10L), (2L, 1L), (3L, 1L), (4L, 8L), (5L, 0L))
      .toDF("doc_id", "w")
    val out = Sampling.ppsSystematic(df, "doc_id", col("w"), k = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // W=20, ticks {0,5,10,15}: id1 [0,10)→2, id2 [10,11)→1, id4 [12,20)→1
    assert(out.toSeq == Seq((1L, 10L, 2L), (2L, 1L, 1L), (4L, 8L, 1L)),
      out.mkString(","))
  }

  test("SQ distortion: constant dims reconstruct exactly, bounds hold") {
    val const = Seq((0L, Array(1f, 2f)), (1L, Array(1f, 2f)))
      .toDF("vec_id", "embedding")
    val Array(c) = Similarity.sqDistortion(const, "vec_id", "embedding",
        dim = 2).as[(Long, Double, Double)].collect()
    assert(c == ((2L, 1.0, 1.0)), c.toString)
    val varied = Seq((0L, Array(1f, 0.3f)), (1L, Array(-0.5f, 2f)),
      (2L, Array(0.25f, -1f))).toDF("vec_id", "embedding")
    val Array(v) = Similarity.sqDistortion(varied, "vec_id", "embedding",
        dim = 2).as[(Long, Double, Double)].collect()
    assert(v._3 <= v._2 && v._2 <= 1.0 && v._3 > 0.98,
      s"8-bit grid on tame values must stay near 1: $v")
  }

  test("top-decile share: ceil rank cutoff and exact cents") {
    val df = (1 to 10).map(i => ("g", i.toLong * 10, i.toLong))
      .toDF("grp", "cents", "tie")
    val Array(r) = Profiling.topShare(df, "grp", col("cents"), col("tie"))
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
    // top_n = 1 → the 100-cent item; share = 100/550
    assert(r == (("g", 10L, 1L, 100L, 550L, Some(0.181818))), r.toString)
  }

  test("step latency: order-statistic quartiles are observed values") {
    def ev(u: Long, t: Long, typ: String) =
      (u, new Timestamp(t * 1000L), typ)
    // latencies: u1=10s, u2=20s, u3=30s, u4=40s; u5 purchase before
    // view only → excluded
    val events = Seq(
      ev(1, 0, "view"), ev(1, 10, "purchase"),
      ev(2, 0, "view"), ev(2, 20, "purchase"),
      ev(3, 0, "view"), ev(3, 30, "purchase"),
      ev(4, 0, "view"), ev(4, 40, "purchase"),
      ev(5, 100, "view"), ev(5, 50, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val Array(r) = TimeSeries.stepLatencyQuartiles(events, "user_id", "ts",
        "event_type", "view", "purchase")
      .as[(Long, Long, Long, Long)].collect()
    // n=4: q1 = element ⌈1⌉=1st (10s), med = 2nd (20s), q3 = 3rd (30s)
    assert(r == ((4L, 10000000L, 20000000L, 30000000L)), r.toString)
  }

  test("hapax rate: once-words counted exactly per group") {
    val docs = Seq(("g1", "a a b c"), ("g2", "x x x")).toDF("src", "text")
    val out = TextAnalysis.hapaxRate(docs, "src", "text")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("g1") == ((3L, 2L, 0.666667)), out.toString)
    assert(out("g2") == ((1L, 0L, 0.0)), out.toString)
  }

  test("source overlap: containment catches the embedded source") {
    // g2's only trigram set is a subset of g1's → containment 1.0
    val docs = Seq(("g1", "a b c d e"), ("g2", "a b c"),
      ("g3", "x y z w")).toDF("src", "text")
    val out = TextAnalysis.sourceOverlap(docs, "src", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out(("g1", "g2")) == ((1L, 3L, 1L, 1.0)), out.toString)
    assert(!out.contains(("g1", "g3")), s"disjoint pair must not appear: $out")
  }

  test("McNemar: one-sided disagreement scores, symmetric zeroes out") {
    // b=6, c=2: χ² = (|4|−1)²/8 = 9/8
    val rows = Seq.fill(6)((true, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(4)((true, true))
    val Array(r) = Profiling.mcnemar(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(r == ((12L, 6L, 2L, Some(1.125))), r.toString)
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val Array(g) = Profiling.mcnemar(agree, col("a"), col("b"))
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(g._4.isEmpty, g.toString)
  }

  test("local peaks: strict maxima only, boundaries excluded") {
    // counts 1,5,2,7,3: peaks at days 2 (5) and 4 (7); top-3 returns both
    val ev = Seq(1, 5, 2, 7, 3).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => Tuple1(dayTs(d, i))) }.toDF("ts")
    val out = TimeSeries.localPeaks(ev, "ts", topK = 3)
      .as[(java.sql.Date, Long, Long, Long)].collect().sortBy(_._1.toString)
    assert(out.map(_._2).toSeq == Seq(5L, 7L), out.mkString(","))
    assert(out(1) == ((java.sql.Date.valueOf("1970-01-04"), 7L, 2L, 3L)),
      out.mkString(","))
  }

  test("max drawdown: deepest dip below the running peak, earliest tie") {
    // counts 3,5,2,4,1,1: runmax 3,5,5,5,5,5 → drawdowns 0,0,3,1,4,4;
    // max draw 4 first hit on day 5 (1970-01-05), peak 5, trough 1
    val ev = Seq(3, 5, 2, 4, 1, 1).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => Tuple1(dayTs(d, i))) }.toDF("ts")
    val Array(r) = TimeSeries.maxDrawdown(ev, "ts")
      .as[(java.sql.Date, Long, Long, Long)].collect()
    assert(r == ((java.sql.Date.valueOf("1970-01-05"), 5L, 1L, 4L)),
      r.toString)
  }

  test("max drawdown: monotone rise never leaves the peak — drawdown 0") {
    val ev = Seq(1, 2, 3).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => Tuple1(dayTs(d, i))) }.toDF("ts")
    val Array(r) = TimeSeries.maxDrawdown(ev, "ts")
      .as[(java.sql.Date, Long, Long, Long)].collect()
    assert(r._4 == 0L && r._1 == java.sql.Date.valueOf("1970-01-01"),
      r.toString)
  }

  test("Jarque-Bera: symmetric two-point mass has S=0, K=-2, JB=n/6") {
    // {0,4}×3: mean 2, m2 = 4, skew 0, excess kurtosis −2 →
    // JB = 6/6·(0 + 4/4) = 1
    val df = Seq.fill(3)(0) ++ Seq.fill(3)(4)
    val Array(r) = Profiling.jarqueBera(df.map(("g", _)).toDF("g", "v"),
      "g", "v").as[(String, Long, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(r == (("g", 6L, Some(0.0), Some(-2.0), Some(1.0))), r.toString)
    // zero variance → all stats null
    val Array(z) = Profiling.jarqueBera(
      Seq(("g", 7), ("g", 7)).toDF("g", "v"), "g", "v")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(z == (("g", 2L, None, None, None)), z.toString)
  }

  test("avg neighbor degree: star graph — leaves see the hub, hub sees 1s") {
    // star 0-1, 0-2, 0-3: hub deg 3 with knn 1; leaves deg 1 with knn 3
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val out = graft.query.GraphQueries.avgNeighborDegree(e)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(3L) == ((1L, 3L, 1.0)), out.toString)
    assert(out(1L) == ((3L, 9L, 3.0)), out.toString)
  }

  test("average precision: hits at ranks 1 and 3 score (1 + 2/3)/2") {
    val df = Seq(("q1", 1, 1L), ("q1", 2, 0L), ("q1", 3, 1L), ("q1", 4, 0L),
      ("q2", 1, 0L), ("q2", 2, 0L)).toDF("query_id", "rank", "rel")
    val out = Similarity.averagePrecision(df, "query_id", "rank", "rel")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("q1") == ((2L, Some(0.833333))), out.toString)
    assert(out("q2") == ((0L, None)), out.toString)
  }

  test("Yule's K: repeated type raises K, single-token group scores 0") {
    // "a a b": N=3, Σc²=5 → K = 1e4·2/9 = 2222.222222
    val docs = Seq(("g1", "a a b"), ("g2", "x")).toDF("src", "text")
    val out = TextAnalysis.yulesK(docs, "src", "text")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("g1") == ((3L, 2L, Some(2222.222222))), out.toString)
    assert(out("g2") == ((1L, 1L, Some(0.0))), out.toString)
  }

  test("Brown-Forsythe: spread difference through the exact ANOVA chain") {
    // g1 {0,10}: lower med 0 → deviations {0,10}; g2 {5,5}: devs {0,0}
    // → ssb 25, ssw 50, F = 25/(50/2) = 1
    val df = Seq(("g1", 0), ("g1", 10), ("g2", 5), ("g2", 5)).toDF("g", "v")
    val Array(r) = Profiling.brownForsythe(df, "g", "v")
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    assert(r == ((4L, 2L, 25.0, 50.0, Some(1.0))), r.toString)
  }

  test("mode per group: deterministic smallest-value tie-break") {
    val df = Seq(("g1", 1L), ("g1", 1L), ("g1", 2L),
      ("g2", 4L), ("g2", 3L)).toDF("g", "v")
    val out = Profiling.modePerGroup(df, "g", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out("g1") == ((1L, 2L)), out.toString)
    assert(out("g2") == ((3L, 1L)), s"tie must pick smaller value: $out")
  }

  test("longest gap: per-user max gap order statistics, singles excluded") {
    // A: gaps 10s,5s → max 10s; B: gap 2s; C: one event → excluded
    val ev = Seq(("A", 0L), ("A", 10L), ("A", 15L), ("B", 0L), ("B", 2L),
      ("C", 0L)).map { case (u, s) => (u, new Timestamp(s * 1000L)) }
      .toDF("u", "ts")
    val Array(r) = TimeSeries.longestGapStats(ev, "u", "ts")
      .as[(Long, Long, Long, Long)].collect()
    assert(r == ((2L, 2000000L, 10000000L, 10000000L)), r.toString)
  }

  test("rolling median: full 7-day windows only, 4th sorted element") {
    // counts 1..8 → day 7 median 4, day 8 window {2..8} median 5
    val ev = (0 until 8).flatMap(d =>
      (0 to d).map(i => Tuple1(dayTs(d, i)))).toDF("ts")
    val out = TimeSeries.rollingMedian(ev, "ts")
      .as[(java.sql.Date, Long, Long)].collect().sortBy(_._1.toString)
    assert(out.length == 2, out.mkString(","))
    assert(out(0) == ((java.sql.Date.valueOf("1970-01-07"), 7L, 4L)),
      out.mkString(","))
    assert(out(1) == ((java.sql.Date.valueOf("1970-01-08"), 8L, 5L)),
      out.mkString(","))
  }

  test("dim stats: per-dimension mean/var exact, dead dim reads 0.0") {
    val emb = Seq(Tuple1(Array(1f, 0f)), Tuple1(Array(3f, 0f)))
      .toDF("embedding")
    val out = Similarity.dimStats(emb, "embedding")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(1L) == ((2L, 2.0, 1.0, 1.0, 3.0)), out.toString)
    assert(out(2L) == ((2L, 0.0, 0.0, 0.0, 0.0)), out.toString)
    // dead dim variance must be +0.0, not -0.0 (hash-compare trap)
    assert(1.0 / out(2L)._3 > 0, "vr must canonicalize to +0.0")
  }

  test("ntile over a unique key: quartile sizes 2,1,1,1 on five rows") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val df = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 20L),
      ("g", 4L, 30L), ("g", 5L, 40L)).toDF("g", "id", "v")
    val out = df.withColumn("tile", ntile(4).over(w).cast("long"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._4).toSeq == Seq(1L, 1L, 2L, 3L, 4L),
      out.mkString(","))
  }

  test("struct-max argmax: value tie resolved to the larger key") {
    val df = Seq(("g", 7L, 100L), ("g", 9L, 100L), ("g", 3L, 50L))
      .toDF("grp", "k", "cents")
    val Array(r) = df.groupBy(col("grp"))
      .agg(max(struct(col("cents"), col("k"))).as("m"))
      .select(col("grp"), col("m.k"), col("m.cents"))
      .as[(String, Long, Long)].collect()
    assert(r == (("g", 9L, 100L)), r.toString)
  }

  test("runs test: median days drop, textbook E/V/z on the hand case") {
    // counts 1,9,2,8,3,7 → med 3 drops day 5; signs 0,1,0,1,1 →
    // n1=3, n2=2, runs 4, z = (4−3.4)/√0.84 = 0.654654
    val ev = Seq(1, 9, 2, 8, 3, 7).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => Tuple1(dayTs(d, i))) }.toDF("ts")
    val Array(r) = TimeSeries.runsTest(ev, "ts")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(r == ((3L, 2L, 4L, Some(0.654654))), r.toString)
  }

  test("runs test: one-sided series has no variance — z null") {
    val ev = Seq(1, 5, 1, 5, 1).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => Tuple1(dayTs(d, i))) }.toDF("ts")
    val Array(r) = TimeSeries.runsTest(ev, "ts")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(r._2 == 0L && r._4.isEmpty, r.toString)
  }

  test("k-fold report: folds bounded, counts total, assignment replays") {
    val df = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "lab")
    val out = Sampling.kfoldReport(df, "id", "lab", k = 5)
      .as[(Long, String, Long)].collect()
    assert(out.map(_._3).sum == 100L, out.mkString(","))
    assert(out.forall(r => r._1 >= 0 && r._1 < 5), out.mkString(","))
    val again = Sampling.kfoldReport(df, "id", "lab", k = 5)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq, "assignment must replay")
  }

  test("transitivity: triangle plus pendant scores 3/5") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val Array(r) = graft.query.GraphQueries.transitivity(e)
      .as[(Long, Long, Option[Double])].collect()
    assert(r == ((1L, 5L, Some(0.6))), r.toString)
  }

  test("Boruvka MSF: textbook hand case with a weight tie") {
    // square 1-2(1), 2-3(2), 3-4(1), 1-4(2), diagonal 1-3(3): the
    // w=2 tie resolves by the (w, src, dst) total order — (2,1,4)
    // precedes (2,2,3), so 1-4 joins the tree and 2-3 is the cycle
    // edge; MSF = {1-2, 3-4, 1-4}
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (1L, 4L, 2L),
      (1L, 3L, 3L)).toDF("src", "dst", "w")
    val out = graft.query.GraphQueries.boruvkaMsf(e)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._3, r._1, r._2))
    assert(out.toSeq == Seq((1L, 2L, 1L), (3L, 4L, 1L), (1L, 4L, 2L)),
      out.mkString(","))
  }

  test("Boruvka MSF: equals sequential Kruskal on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val raw = (0 until 150).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b), (rnd.nextInt(9) + 1).toLong)
    }.filter(t => t._1 != t._2)
    // canonical dedup keeping min weight — mirror the operator's prep
    val canon = raw.groupBy(t => (t._1, t._2))
      .map { case ((a, b), ts) => (a, b, ts.map(_._3).min) }.toSeq
    // reference: Kruskal with union-find under the (w, src, dst) order
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val expected = canon.sortBy(t => (t._3, t._1, t._2)).filter {
      case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) false else { parent(ra) = rb; true }
    }.toSet
    val out = graft.query.GraphQueries.boruvkaMsf(
      canon.toDF("src", "dst", "w")).as[(Long, Long, Long)].collect().toSet
    assert(out == expected,
      s"missing=${expected -- out} extra=${out -- expected}")
    // spanning: |MSF| = n_nodes - n_components
    val nodes = canon.flatMap(t => Seq(t._1, t._2)).distinct
    val comps = nodes.map(find).distinct.size
    assert(out.size == nodes.size - comps, s"${out.size} edges")
  }

  test("shortest path trace: unique path via the (d, pred) tie-break") {
    // diamond a→{b,c}→d all w=1: d has two d=2 routes — min pred "b"
    // wins; the trace is a(0,''), b(1,a), d(2,b); c is NOT on it
    val e = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "d", 1L),
      ("c", "d", 1L)).toDF("src", "dst", "w")
    val out = graft.query.GraphQueries.shortestPathTrace(e, "a", rounds = 4)
      .as[(String, Long, String)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(("a", 0L, ""), ("b", 1L, "a"), ("d", 2L, "b")),
      out.mkString(","))
  }

  test("shortest path trace: relaxation beats the direct heavier edge") {
    // a→b(1), b→c(1), a→c(9): c arrives at d=2 through b
    val e = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 9L))
      .toDF("src", "dst", "w")
    val out = graft.query.GraphQueries.shortestPathTrace(e, "a", rounds = 3)
      .as[(String, Long, String)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(("a", 0L, ""), ("b", 1L, "a"), ("c", 2L, "b")),
      out.mkString(","))
  }

  test("WoW growth: Monday-truncated weeks, percentage vs previous") {
    // weeks (Mon 12-29, 01-05, 01-12): 2, 3, 6 events → null, 50%, 100%
    val ev = (Seq(0, 1) ++ Seq(4, 5, 6) ++ (11 to 13).flatMap(d =>
      Seq(d, d))).map(d => Tuple1(dayTs(d, 0))).toDF("ts")
    val out = TimeSeries.wowGrowth(ev, "ts")
      .as[(java.sql.Date, Long, Option[Long], Option[Double])].collect()
      .sortBy(_._1.toString)
    assert(out.map(_._2).toSeq == Seq(2L, 3L, 6L), out.mkString(","))
    assert(out.map(_._4).toSeq == Seq(None, Some(50.0), Some(100.0)),
      out.mkString(","))
  }

  test("centroid eval: separable labels classify cleanly on held-out") {
    val emb = Seq(
      (0L, "A", Array(1f, 0f)), (2L, "B", Array(0f, 1f)),
      (1L, "A", Array(0.8f, 0.2f)), (3L, "B", Array(0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidEval(emb, "vec_id", "embedding", "label",
      col("vec_id") % 2 === 0)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(("A", "A", 1L), ("B", "B", 1L)),
      out.mkString(","))
  }

  test("group percentiles: exact order statistics on 1..10") {
    val df = (1 to 10).map(("g", _)).toDF("g", "v")
    val Array(r) = Profiling.groupPercentiles(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(r == (("g", 10L, 3L, 5L, 8L, 9L)), r.toString)
  }

  test("median anomaly: spike flagged against zero-MAD flat baseline") {
    // 7 flat days, a 50-spike, 6 flat days: residuals all 0 except 45
    // at the spike; MAD 0 → |r| > 0 flags exactly the spike day
    val ev = (Seq.fill(7)(5) ++ Seq(50) ++ Seq.fill(6)(5)).zipWithIndex
      .flatMap { case (c, d) => (0 until c).map(i => Tuple1(dayTs(d, i))) }
      .toDF("ts")
    val out = TimeSeries.medianAnomalies(ev, "ts")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
    assert(out.toSeq ==
      Seq((java.sql.Date.valueOf("1970-01-08"), 50L, 5L, 45L, 0L)),
      out.mkString(","))
  }

  test("dup cluster sizes: chain makes one 3-cluster, rest singletons") {
    val docs = (1L to 5L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val out = Dedup.dupClusterSizes(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)), out.mkString(","))
  }

  test("rolling DAU: window covers lookback days, observed days only") {
    // A active days 1,3; B day 3 → day1 window {A}=1, day3 window
    // {A,B}=2; day2 unobserved → not reported
    val ev = Seq(("A", 0), ("A", 2), ("B", 2))
      .map { case (u, d) => (u, dayTs(d, 0)) }.toDF("u", "ts")
    val out = TimeSeries.rollingDistinctUsers(ev, "u", "ts")
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    assert(out.toSeq == Seq(
      (java.sql.Date.valueOf("1970-01-01"), 1L),
      (java.sql.Date.valueOf("1970-01-03"), 2L)), out.mkString(","))
  }

  test("rendezvous rebalance: only keys won by the NEW shard move") {
    val df = (1L to 200L).map(Tuple1(_)).toDF("id")
    val Array(r) = Sampling.rendezvousRebalance(df, "id", 8, 9)
      .as[(Long, Long, Double)].collect()
    assert(r._1 == 200L && r._2 > 0 && r._2 < 60,
      s"~1/9 of 200 keys should move: $r")
    // the moved keys must all land on the added shard (id 8)
    val a = Sampling.rendezvousShard(df, "id", 8)
      .withColumnRenamed("shard", "sa")
    val b = Sampling.rendezvousShard(df, "id", 9)
      .withColumnRenamed("shard", "sb")
    val moved = a.join(b, Seq("id")).filter(col("sa") =!= col("sb"))
      .select(col("sb")).as[Long].collect()
    assert(moved.nonEmpty && moved.forall(_ == 8L),
      s"moved keys must go to the new shard: ${moved.toSeq}")
  }

  test("cosine profile: parallel pair tops the scale, orthogonal mid-bin") {
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.cosineProfile(emb, "vec_id", "embedding")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((5L, 1L), (9L, 1L)), out.mkString(","))
  }

  test("betweenness: path middle brokers both directions, ends score 0") {
    // path a-b-c, landmarks {a, c}: each source gives delta(b)=1 →
    // bc(b)=2; endpoints are landmarks/terminals → excluded/zero
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val lms = Seq("a", "c").map(Tuple1(_)).toDF("node")
    val out = graft.query.GraphQueries.landmarkBetweenness(e, lms, rounds = 4)
      .as[(String, Double)].collect().toMap
    assert(out == Map("b" -> 2.0), out.toString)
  }

  test("betweenness: star hub brokers all leaf pairs from one landmark") {
    // star h-{x,y,z}, landmark {x}: δ(h) = 1/1·(1+0)·2 targets = 2
    val e = Seq("x", "y", "z").flatMap(v => Seq(("h", v), (v, "h")))
      .toDF("src", "dst")
    val lms = Seq(Tuple1("x")).toDF("node")
    val out = graft.query.GraphQueries.landmarkBetweenness(e, lms, rounds = 3)
      .as[(String, Double)].collect().toMap
    assert(out == Map("h" -> 2.0), out.toString)
  }

  test("betweenness: split shortest paths share credit by sigma ratio") {
    // a→{b,c}→d→e, landmark {a}: σ(d)=2, δ(b)=δ(c)=0.5·(1+1)=1,
    // δ(d)=1 — the σ-ratio split is the Brandes signature
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"))
    val e = pairs.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .toDF("src", "dst")
    val lms = Seq(Tuple1("a")).toDF("node")
    val out = graft.query.GraphQueries.landmarkBetweenness(e, lms, rounds = 4)
      .as[(String, Double)].collect().toMap
    assert(out == Map("b" -> 1.0, "c" -> 1.0, "d" -> 1.0), out.toString)
  }

  test("calendar gaps: missing-day runs found, complete coverage empty") {
    // active days 1,2,5,6,9 → gaps [3,4] and [7,8]
    val ev = Seq(0, 1, 4, 5, 8).map(d => Tuple1(dayTs(d, 0))).toDF("ts")
    val out = TimeSeries.calendarGaps(ev, "ts")
      .as[(java.sql.Date, java.sql.Date, Long)].collect()
      .sortBy(_._1.toString)
    assert(out.toSeq == Seq(
      (java.sql.Date.valueOf("1970-01-03"), java.sql.Date.valueOf("1970-01-04"), 2L),
      (java.sql.Date.valueOf("1970-01-07"), java.sql.Date.valueOf("1970-01-08"), 2L)),
      out.mkString(","))
    val full = Seq(0, 1, 2).map(d => Tuple1(dayTs(d, 0))).toDF("ts")
    assert(TimeSeries.calendarGaps(full, "ts").isEmpty)
  }

  test("Ljung-Box: constant series scores 0, alternation scores large") {
    val flat = (0 until 8).flatMap(d =>
      (0 until 3).map(i => Tuple1(dayTs(d, i)))).toDF("ts")
    val Array(f) = TimeSeries.ljungBox(flat, "ts", maxLag = 3)
      .as[(Long, Long, Double)].collect()
    assert(f == ((8L, 3L, 0.0)), f.toString)
    val alt = (0 until 10).flatMap(d =>
      (0 until (if (d % 2 == 0) 1 else 5)).map(i => Tuple1(dayTs(d, i))))
      .toDF("ts")
    val Array(a) = TimeSeries.ljungBox(alt, "ts", maxLag = 3)
      .as[(Long, Long, Double)].collect()
    assert(a._3 > 5.0, s"alternating series must reject whiteness: $a")
  }

  test("triplet eval: margin triplet scores correct, missing neg drops") {
    val emb = Seq(
      (0L, "A", Array(1f, 0f)), (1L, "A", Array(1f, 0.1f)),
      (2L, "B", Array(0f, 1f)), (3L, "B", Array(0.1f, 1f)))
      .toDF("vec_id", "label", "embedding")
    // anchors with positives: 0 (pos 1, neg id 2 = B: valid),
    // 2 (pos 3, neg id 4: missing → dropped)
    val Array(r) = Similarity.tripletEval(emb, "vec_id", "embedding",
      "label", stride = 2L)
      .as[(Long, Long, Option[Double])].collect()
    assert(r == ((1L, 1L, Some(1.0))), r.toString)
  }

  test("textrank: bridging word outranks its leaf neighbors") {
    // "a b a c": co-occurrence a-b, a-c → a has degree 2, b/c 1
    val docs = Seq(Tuple1("a b a c")).toDF("text")
    val out = TextAnalysis.textRank(docs, "text", iters = 3, topK = 5)
      .as[(String, Double)].collect()
    assert(out.length == 3 && out.head._1 == "a" &&
      out.head._2 > out(1)._2, out.mkString(","))
  }

  test("textrank adaptive faces: string-keyed and dictionary-encoded " +
      "PageRank are bit-identical") {
    // the round-12 adaptive pick (encode only above a distinct-edge
    // threshold) is only legal because both faces are exact: PageRank
    // is relabeling-invariant and the 9-dp recurrence is
    // order-independent, so forcing each face must give byte-equal
    // ordered output on real text
    val docs = graft.Tables.documents(spark, sf0001)
    val str = TextAnalysis.textRank(docs, "text", iters = 3, topK = 20,
      encodeThreshold = Long.MaxValue).as[(String, Double)].collect().toSeq
    val enc = TextAnalysis.textRank(docs, "text", iters = 3, topK = 20,
      encodeThreshold = 0L).as[(String, Double)].collect().toSeq
    assert(str == enc, s"faces differ:\n$str\n$enc")
  }

  test("cluster purity: dominant label ratio per nearest-seed cluster") {
    val emb = Seq(
      (0L, "A", Array(1f, 0f)), (1L, "B", Array(0f, 1f)),
      (2L, "A", Array(0.9f, 0.1f)), (3L, "B", Array(0.8f, 0.2f)),
      (4L, "B", Array(0.1f, 0.9f))).toDF("vec_id", "label", "embedding")
    val out = Similarity.clusterPurity(emb,
      emb.filter(col("vec_id") < 2), "vec_id", "embedding", "label")
      .as[(Long, Long, String, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 3L, "A", 2L, 0.666667),
      (1L, 2L, "B", 2L, 1.0)), out.mkString(","))
  }

  test("two-way ANOVA: balanced 2x2 hand case with zero interaction") {
    // cells {1,3},{5,7},{2,4},{6,8}: SSA=2, SSB=32, SSAB=0, SSW=8 →
    // F_a=1, F_b=16, F_ab=0
    val df = Seq(("a1", "b1", 1), ("a1", "b1", 3), ("a1", "b2", 5),
      ("a1", "b2", 7), ("a2", "b1", 2), ("a2", "b1", 4),
      ("a2", "b2", 6), ("a2", "b2", 8)).toDF("fa", "fb", "v")
    val Array(r) = Profiling.twoWayAnova(df, "fa", "fb", "v")
      .as[(Long, Long, Long, Double, Double, Double, Double,
        Option[Double], Option[Double], Option[Double])].collect()
    assert(r == ((8L, 2L, 2L, 2.0, 32.0, 0.0, 8.0, Some(1.0),
      Some(16.0), Some(0.0))), r.toString)
  }

  test("Welch t: textbook unequal-variance case with Satterthwaite df") {
    // A={0,2}: mean 1, var 2; B={10,14}: mean 12, var 8 →
    // t = −11/√5 = −4.91935, df = 25/17 = 1.470588
    val df = Seq(("A", 0), ("A", 2), ("B", 10), ("B", 14)).toDF("g", "v")
    val Array(r) = Profiling.welchT(df, "g", "v", "A", "B")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect()
    assert(r == ((2L, 2L, 1.0, 12.0, Some(-4.91935), Some(1.470588))),
      r.toString)
  }

  test("Cochran-Armitage: perfect dose-response scores the textbook z") {
    // w=1:{0/2}, w=2:{1/2}, w=3:{2/2}: T = 8−6 = 2, V = 1 → z = 2
    val df = Seq((1, false), (1, false), (2, true), (2, false),
      (3, true), (3, true)).toDF("w", "y")
    val Array(r) = Profiling.cochranArmitage(df, col("w"), col("y"))
      .as[(Long, Long, Long, Double, Option[Double])].collect()
    assert(r == ((6L, 3L, 3L, 2.0, Some(2.0))), r.toString)
  }

  test("style cosine: repeated bigrams weigh in, disjoint pairs absent") {
    // g1 "a b a b": counts {ab:2, ba:1}, ‖g1‖²=5; g2 "a b": {ab:1} →
    // cos = 2/√5; g3 shares nothing with g1 → no row
    val docs = Seq(("g1", "a b a b"), ("g2", "a b"), ("g3", "x y"))
      .toDF("src", "text")
    val out = TextAnalysis.sourceStyleCosine(docs, "src", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("g1", "g2")) == 0.894427, out.toString)
    assert(!out.contains(("g1", "g3")), out.toString)
  }

  test("clustering vs null: triangle+pendant beats its degree-null 3x") {
    // transitivity 0.6; degrees {2,2,3,1}: <k>=2, <k2>=4.5 →
    // c_null = 2.5²/(4·8) = 0.1953125 → ratio ≈ 3.072
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val Array(r) = graft.query.GraphQueries.clusteringVsNull(e)
      .as[(Long, Option[Double], Double, Option[Double])].collect()
    assert(r._1 == 4L && r._2 == Some(0.6) && r._3 == 0.195313 &&
      r._4 == Some(3.072), r.toString)
  }

  test("top session paths: gap splits sessions, first-3 types ordered") {
    val ev = Seq(
      ("A", 1L, 0L, "view"), ("A", 2L, 60L, "click"),
      ("A", 3L, 120L, "buy"), ("A", 4L, 120L + 7200L, "view"),
      ("B", 5L, 0L, "view"), ("B", 6L, 30L, "click"))
      .map { case (u, id, s, t) => (u, id, new Timestamp(s * 1000L), t) }
      .toDF("u", "eid", "ts", "et")
    val out = TimeSeries.topSessionPaths(ev, "u", "ts", "eid", "et")
      .as[(String, Long)].collect().toMap
    assert(out == Map("view>click>buy" -> 1L, "view" -> 1L,
      "view>click" -> 1L), out.toString)
  }

  test("dedup source impact: template source drops, curated untouched") {
    // pairs collapse docs 1,2,3 (src t) to one survivor; src c keeps 2
    val docs = Seq((1L, "t"), (2L, "t"), (3L, "t"), (4L, "c"), (5L, "c"))
      .toDF("doc_id", "src")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val out = Dedup.dedupSourceImpact(docs, "doc_id", "src", pairs)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("c", 2L, 2L, 0.0), ("t", 3L, 1L, 66.67)),
      out.mkString(","))
  }

  test("markov stationary: 5 power steps close on the 4:1 equilibrium") {
    // one user, A A A A B A: P(A→A)=3/4, P(A→B)=1/4, P(B→A)=1 →
    // true stationary (0.8, 0.2); after 5 steps from uniform the
    // dyadic iterates land on 0.800293 / 0.199707 exactly
    val ev = Seq("A", "A", "A", "A", "B", "A").zipWithIndex.map {
      case (t, i) => (1L, (i + 1).toLong, new Timestamp(i * 1000L), t) }
      .toDF("u", "eid", "ts", "et")
    val out = TimeSeries.markovStationary(ev, "u", "ts", "eid", "et",
      iters = 5).as[(String, Double)].collect().toMap
    assert(out == Map("A" -> 0.800293, "B" -> 0.199707), out.toString)
  }

  test("markov stationary: two-state alternation stays uniform") {
    val ev = Seq("A", "B", "A", "B", "A").zipWithIndex.map {
      case (t, i) => (1L, (i + 1).toLong, new Timestamp(i * 1000L), t) }
      .toDF("u", "eid", "ts", "et")
    val out = TimeSeries.markovStationary(ev, "u", "ts", "eid", "et",
      iters = 5).as[(String, Double)].collect().toMap
    assert(out == Map("A" -> 0.5, "B" -> 0.5), out.toString)
  }

  test("waterfill: capped source keeps its rows, budget redistributes") {
    // A capped at 10 of its 40-quota; the 30 unused redistribute to
    // B and C equally; residue 0
    val avail = Seq(("A", 10L), ("B", 100L), ("C", 100L))
      .toDF("source", "avail")
    val out = Sampling.waterfillQuotas(avail, Seq("A" -> 8L), budget = 50L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("A") == ((10L, 8L, 10L)), out.toString)
    assert(out("B") == ((100L, 1L, 20L)), out.toString)
    assert(out("C") == ((100L, 1L, 20L)), out.toString)
    assert(out("__rest") == ((0L, 0L, 0L)), out.toString)
  }

  test("shingle df profile: shared bigram counts once per doc") {
    val docs = Seq((1L, "a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val out = Dedup.shingleDfProfile(docs, "doc_id", "text", shingleN = 2)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L)), out.mkString(","))
  }

  test("markov entropy rate: deterministic cycle carries zero bits") {
    // A→B→A→B...: every transition certain → H = 0 exactly
    val ev = Seq("A", "B", "A", "B", "A").zipWithIndex.map {
      case (t, i) => (1L, (i + 1).toLong, new Timestamp(i * 1000L), t) }
      .toDF("u", "eid", "ts", "et")
    val Array(r) = TimeSeries.markovEntropyRate(ev, "u", "ts", "eid",
      "et", iters = 5).as[(Long, Double)].collect()
    assert(r == ((2L, 0.0)), r.toString)
  }

  test("markov entropy rate: fair branch from half the mass is 0.5 bit") {
    // P(A→B)=P(A→C)=1/2, B/C →A certain; π(A)=1/2 → H = 1/2·1 = 0.5
    // (after 5 rounded power steps π(A)=0.666667 → 0.666667 bits)
    val ev = Seq("A", "B", "A", "C", "A", "B", "A", "C").zipWithIndex.map {
      case (t, i) => (1L, (i + 1).toLong, new Timestamp(i * 1000L), t) }
      .toDF("u", "eid", "ts", "et")
    val Array(r) = TimeSeries.markovEntropyRate(ev, "u", "ts", "eid",
      "et", iters = 5).as[(Long, Double)].collect()
    assert(r._1 == 3L && r._2 > 0.3 && r._2 <= 1.0, r.toString)
  }

  test("component report composes CC sizes with PageRank leaders") {
    // two components: triangle {1,2,3} + edge {10,11}; the triangle's
    // PR is symmetric so the tie pins to the smallest node
    val canon = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
      .toDF("src", "dst")
    val sym = canon.unionByName(
      canon.select(col("dst").as("src"), col("src").as("dst")))
    val comp = graft.query.GraphQueries.connectedComponentsStar(canon)
    val pr = graft.query.GraphQueries.pagerankDf(sym, iters = 3)
    val out = comp.join(pr, Seq("node"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("pr"), (-col("node")).as("nn"))).as("m"))
      .select(col("component"), col("n"), (-col("m.nn")).as("top"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 1L), (10L, 2L, 10L)),
      out.mkString(","))
  }

  test("Fisher CI: symmetric around r=0, degenerate r=1 is null") {
    val corr = Seq(("a", "b", 0.0), ("a", "c", 1.0)).toDF("x", "y", "r")
    val out = Profiling.fisherCi(corr, lit(103L))
      .as[(String, String, Double, Option[Double], Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val (_, lo, hi) = out(("a", "b"))
    assert(lo.get < 0 && hi.get > 0 &&
      math.abs(lo.get + hi.get) < 2e-6, out.toString)
    assert(out(("a", "c"))._2.isEmpty && out(("a", "c"))._3.isEmpty,
      out.toString)
  }

  test("seasonal strength: strong daily cycle near 1, flat series null") {
    def hourly(v: Int => Double) = (0 until 72).map(h =>
      (new Timestamp(h * 3600000L), v(h))).toDF("ts", "value")
    val cyc = hourly(h => if (h % 24 < 12) 10.0 else 1.0)
    val Array(c) = TimeSeries.seasonalStrength(cyc, "ts", "value")
      .as[(Long, Option[Double])].collect()
    assert(c._2.exists(_ > 0.8), c.toString)
    val flat = hourly(_ => 5.0)
    val Array(f) = TimeSeries.seasonalStrength(flat, "ts", "value")
      .as[(Long, Option[Double])].collect()
    assert(f._2.isEmpty, f.toString)
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
