package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Data-quality expectations (Profiling) + CDC snapshot diff. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("QualityClassifier: GD training separates planted corruption, scores sane") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val corrupted = docs.select(($"doc_id" + 999999L).as("doc_id"),
      concat_ws(" ", array_repeat(substring($"text", 1, 8), 40)).as("text"))
    val corpus = docs.withColumn("label", lit(1.0))
      .unionByName(corrupted.withColumn("label", lit(0.0)))
      .withColumn("feat", QualityClassifier.features($"text"))
    val w = QualityClassifier.trainLogReg(
      corpus.filter($"doc_id" % 3 =!= 0), "feat", "label",
      dim = 6, iters = 50, lr = 2.0)
    assert(w.length == 6 && w.forall(x => !x.isNaN && !x.isInfinite))
    val acc = QualityClassifier.accuracy(
      corpus.filter($"doc_id" % 3 === 0), "feat", "label", w)
    assert(acc >= 0.9, s"holdout accuracy $acc")
    // the bounded-sample local trainer reaches the same quality (and
    // is deterministic: content-hash-ordered sample, sequential folds)
    val ws = QualityClassifier.trainLogRegSampled(
      corpus.filter($"doc_id" % 3 =!= 0), "feat", "label", "doc_id",
      dim = 6, iters = 50, lr = 2.0)
    val accS = QualityClassifier.accuracy(
      corpus.filter($"doc_id" % 3 === 0), "feat", "label", ws)
    assert(accS >= 0.9, s"sampled-trainer holdout accuracy $accS")
    val ws2 = QualityClassifier.trainLogRegSampled(
      corpus.filter($"doc_id" % 3 =!= 0), "feat", "label", "doc_id",
      dim = 6, iters = 50, lr = 2.0)
    assert(ws.sameElements(ws2))
    // probability scores stay in (0,1) and rank clean above corrupted
    val m = corpus.select($"label",
        QualityClassifier.score($"feat", w).as("p"))
      .groupBy($"label").agg(avg($"p").as("p"), min($"p").as("lo"), max($"p").as("hi"))
      .as[(Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(1.0)._2 > m(0.0)._2, s"mean score ordering: $m")
    assert(m.values.forall(r => r._3 >= 0.0 && r._4 <= 1.0))
  }

  test("checkRowRules: one pass, null counts as violation") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (5L, "b"), (null, "c"))
      .toDF("v", "s")
    val r = Profiling.checkRowRules(df, Seq(
        "v_small" -> (col("v") <= 3), // 5 violates; null violates
        "s_nonempty" -> (length(col("s")) > 0)))
      .as[(String, Long, Long, Boolean)].collect().map(x => x._1 -> x).toMap
    assert(r("v_small") == (("v_small", 3L, 2L, false)))
    assert(r("s_nonempty") == (("s_nonempty", 3L, 0L, true)))
  }

  test("uniquenessViolations counts rows beyond the first per key") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "s")
    val r = Profiling.uniquenessViolations(df, Seq("k"), "k_unique")
      .as[(String, Long, Long, Boolean)].head()
    assert(r == (("k_unique", 3L, 1L, false)))
  }

  test("orphanCount: child keys missing from parent") {
    val child = Seq(1, 2, 9).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Profiling.orphanCount(child, "fk", parent, "pk", "fk_ok")
      .as[(String, Long, Long, Boolean)].head()
    assert(r == (("fk_ok", 3L, 1L, false)))
  }

  test("snapshotDiff classifies inserts, deletes, updates; drops unchanged") {
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "t", "l")
    val neu = Seq((2L, "b", "y"), (3L, "C2", "z"), (4L, "d", "w"))
      .toDF("id", "t", "l")
    val d = ChangeCapture.snapshotDiff(old, neu, Seq("id"), Seq("t", "l"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "D", 3L -> "U", 4L -> "I"), d.toString)
  }

  test("snapshotDiff is null-safe on compare columns") {
    val old = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("id", "t")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "t")
    val d = ChangeCapture.snapshotDiff(old, neu, Seq("id"), Seq("t"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "U"), d.toString) // 2: null == null ⇒ unchanged
  }

  test("kmvSketch: merge of per-group sketches equals the direct union sketch") {
    val k = 64
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val sk = Sketches.kmvSketch(li, "l_returnflag", "l_orderkey", k)
    // every per-group sketch holds at most k hashes
    assert(sk.groupBy("grp").count().filter($"count" > k).isEmpty)
    val merged = Sketches.kmvMerge(sk, k).select("h")
    val direct = Sketches.kmvSketch(
      li.withColumn("one", lit("ALL")), "one", "l_orderkey", k).select("h")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("kmvEstimate: exact below k, within 30% when the sketch is full") {
    val k = 64
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    // small group: fewer distinct suppkeys than k in a tight filter
    val small = li.filter($"l_suppkey" <= 5)
    val exactSmall = small.select("l_suppkey").distinct().count().toDouble
    val estSmall = Sketches.kmvEstimate(
      Sketches.kmvSketch(small, "l_returnflag", "l_suppkey", 1000), 1000)
    // not full -> every group's estimate is its exact distinct hash count
    estSmall.collect().foreach(r => assert(r.getDouble(1) <= exactSmall))
    val full = Sketches.kmvEstimate(
      Sketches.kmvSketch(li.withColumn("g", lit("ALL")), "g", "l_orderkey", k), k)
      .head().getDouble(1)
    val exact = li.select("l_orderkey").distinct().count().toDouble
    assert(math.abs(full - exact) / exact < 0.3, s"est $full vs exact $exact")
  }

  test("psiDrift: zero on identical corpora, detects a planted shift") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val same = Profiling.psiDrift(docs, docs, "n_chars", nBins = 10)
    // p == q in every bin -> every contribution is exactly 0
    assert(same.filter($"psi_contrib" =!= 0.0).isEmpty)
    assert(same.count() == 10)
    val shifted = docs.filter(!($"n_chars" < 150 && $"doc_id" % 2 === 0))
    val psi = Profiling.psiDrift(docs, shifted, "n_chars", nBins = 10)
      .select("psi_total").as[Double].head()
    assert(psi > 0.02, s"psi_total $psi did not register the shift")
  }

  test("outliersMad catches what stddev-based z-scores miss, zero-MAD guarded") {
    val vals = Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 100.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val mad = Profiling.outliersMad(df, "v", "grp", cutoff = 3.5)
      .select("v").as[Double].collect().toSet
    assert(mad == Set(100.0, 10.0), s"MAD flagged $mad")
    // the 100 inflates the stddev enough that classic z misses BOTH
    val z = Profiling.outliersZ(df, "v", "grp", z = 3.0).count()
    assert(z == 0L, s"z-score flagged $z rows")
    // constant group: MAD = 0, guard yields no outliers (no div-by-zero)
    val const = Seq((1L, "c", 5.0), (2L, "c", 5.0), (3L, "c", 5.0))
      .toDF("id", "grp", "v")
    assert(Profiling.outliersMad(const, "v", "grp").isEmpty)
  }

  test("winsorize clamps to the band and leaves interior values untouched") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val w = Profiling.winsorize(docs, "n_chars", "source", 0.1, 0.9)
    assert(w.filter($"v_wins" < $"lo" || $"v_wins" > $"hi").isEmpty)
    assert(w.filter($"n_chars" >= $"lo" && $"n_chars" <= $"hi" &&
      $"v_wins" =!= $"n_chars".cast("double")).isEmpty)
    // something actually got clipped at a 10/90 band on 25-doc groups
    assert(w.filter($"v_wins" =!= $"n_chars".cast("double")).count() > 0)
  }

  test("benfordReport: digit extraction exact, geometric conforms, uniform flunks") {
    // digit comes from integer cents + string length, not log10
    val probe = Seq((1L, 987.65), (2L, 12.34), (3L, 0.07)).toDF("id", "v")
    val digs = Profiling.benfordReport(probe, "v")
      .filter($"n" > 0).select($"digit", $"n")
      .as[(Long, Long)].collect().toMap
    assert(digs == Map(9L -> 1L, 1L -> 1L, 7L -> 1L), digs.toString)
    // 1.05^i spans ~4 decades → near-Benford; 100+i covers digits 1-2
    val geo = (0 until 200).map(i => (i.toLong, math.pow(1.05, i)))
      .toDF("id", "v")
    val unif = (0 until 200).map(i => (i.toLong, 100.0 + i)).toDF("id", "v")
    def chi2(df: org.apache.spark.sql.DataFrame): Double =
      Profiling.benfordReport(df, "v").select($"chi2_total")
        .as[Double].head()
    val (cg, cu) = (chi2(geo), chi2(unif))
    assert(cg < cu / 5.0, s"geometric chi2 $cg vs uniform $cu")
    assert(Profiling.benfordReport(geo, "v").count() == 9)
  }

  test("giniConcentration: 0 for equal shares, (n-1)/n for total concentration") {
    val eq = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)).toDF("g", "n")
    val g0 = Profiling.giniConcentration(eq, "g", col("n"))
      .as[(Long, Long, Double)].head()
    assert(g0 == ((4L, 20L, 0.0)), g0.toString)
    val one = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 10L)).toDF("g", "n")
    assert(Profiling.giniConcentration(one, "g", col("n"))
      .as[(Long, Long, Double)].head()._3 == 0.75)
    // hand case: weights 1 and 3 → G = 0.25
    val two = Seq(("a", 1L), ("b", 3L)).toDF("g", "n")
    assert(Profiling.giniConcentration(two, "g", col("n"))
      .as[(Long, Long, Double)].head()._3 == 0.25)
  }

  test("ksTest: identical samples give D=0, disjoint give D=1, shift hand-computed") {
    val a = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val same = Profiling.ksTest(a, a, "v")
      .as[(Long, Long, Double)].head()
    assert(same == ((100L, 100L, 0.0)), same.toString)
    val b = (1 to 100).map(i => (i.toLong, i + 1000.0)).toDF("id", "v")
    assert(Profiling.ksTest(a, b, "v").as[(Long, Long, Double)].head()._3 == 1.0)
    // half-shifted: b' = a shifted by 50 → D = 0.5 exactly
    val c = (1 to 100).map(i => (i.toLong, i + 50.0)).toDF("id", "v")
    assert(Profiling.ksTest(a, c, "v").as[(Long, Long, Double)].head()._3 == 0.5)
  }

  test("bayesianBootstrapCi: degenerate on constants, brackets the mean, deterministic") {
    val const = (1 to 50).map(i => (i.toLong, 7.0)).toDF("id", "v")
    val c = Profiling.bayesianBootstrapCi(const, "id", "v", b = 20)
      .as[(Long, Double, Double, Double)].head()
    assert(c == ((20L, 7.0, 7.0, 7.0)), c.toString)
    // mixed data: ordered CI that brackets the true mean
    val data = (1 to 200).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val (n, lo, mid, hi) = Profiling.bayesianBootstrapCi(data, "id", "v", b = 40)
      .as[(Long, Double, Double, Double)].head()
    assert(n == 40L)
    assert(lo < mid && mid < hi, s"($lo, $mid, $hi)")
    assert(lo < 4.5 && 4.5 < hi, s"true mean 4.5 outside ($lo, $hi)")
    assert(hi - lo < 1.0, s"CI implausibly wide: ($lo, $hi)")
    // deterministic replay
    val again = Profiling.bayesianBootstrapCi(data, "id", "v", b = 40)
      .as[(Long, Double, Double, Double)].head()
    assert(again == ((n, lo, mid, hi)))
  }

  test("quantileNormalize equalizes group distributions onto the pooled grid") {
    // group a: values 1..10; group b: 101..110 — after normalization
    // both groups must land on the SAME set of pooled grid values,
    // order-preserving within each group
    val df = ((1 to 10).map(v => (v.toLong, "a", v.toDouble)) ++
        (1 to 10).map(v => (v.toLong + 10, "b", v + 100.0)))
      .toDF("id", "grp", "v")
    val out = Profiling.quantileNormalize(df, "v", "grp", nBins = 10)
      .select($"id", $"grp", $"v", $"v_qnorm")
      .as[(Long, String, Double, Double)].collect()
    val a = out.filter(_._2 == "a").sortBy(_._3).map(_._4)
    val b = out.filter(_._2 == "b").sortBy(_._3).map(_._4)
    assert(a.toSeq == b.toSeq, s"a=${a.mkString(",")} b=${b.mkString(",")}")
    assert(a.sorted.toSeq == a.toSeq, "normalization must preserve order")
    // pooled 10-bin grid over the 20 values spans both groups' ranges
    assert(a.head < 11.0 && a.last > 100.0, a.mkString(","))
    // identical distributions after the map: same multiset per group
    assert(a.toSet.size == 10, a.mkString(","))
  }
}
