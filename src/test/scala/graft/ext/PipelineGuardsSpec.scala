package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Corpus-hygiene guards added in round 7: within-doc repetition,
  * Luhn validation, domain blocklists, and the IVF-PQ composed
  * index's recall calibration. */
class PipelineGuardsSpec extends SparkSpec {
  import spark.implicits._

  test("dupNgramStats: clean text zero, repeated block caught, short text zeros") {
    val docs = Seq(
      (1L, "a b c d e f g h"),                    // 8 distinct tokens: no dup 5-grams
      (2L, "a b c d e a b c d e"),                // full self-repeat
      (3L, "x y")                                  // shorter than n
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupNgramStats(docs, "doc_id", "text", n = 5)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out(0) == ((1L, 4L, 0L, 0.0)), out(0).toString)
    // doc 2: 6 windows, the repeated "a b c d e" occurs at pos 1 and 6
    val (_, n2, dup2, frac2) = out(1)
    assert(n2 == 6L && dup2 == 2L, out(1).toString)
    assert(frac2 > 0.0 && frac2 < 1.0)
    assert(out(2) == ((3L, 0L, 0L, 0.0)), out(2).toString)
  }

  test("luhnValid: known card test vectors and rejects") {
    val cases = Seq(
      ("4111111111111111", true),   // canonical Visa test number
      ("79927398713", true),        // the textbook Luhn example
      ("79927398710", false),
      ("4111111111111112", false),
      (":", false),                 // ascii(':')-48 = 10 ≡ 0 mod 10 — the
                                    // non-digit that fooled the unguarded form
      ("4111a11111111111", false),  // embedded non-digit
      ("", false))
    val out = cases.map(_._1).toDF("dg")
      .select($"dg", TextAnalysis.luhnValid($"dg").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((s, want) <- cases)
      assert(out(s) == want, s"luhn($s) = ${out(s)}, want $want")
  }

  test("blockedByDomainList: suffix blocks subdomains, full-host entry is exact") {
    import graft.etl.UrlFunctions
    val bl = Seq("bad.com", "cdn.meh.org")
    val cases = Seq(
      ("https://bad.com/x", true),
      ("https://a.bad.com/x", true),
      ("https://notbad.com/x", false),       // no substring matching
      ("https://cdn.meh.org/x", true),
      ("https://meh.org/x", false),          // full-host entry only
      ("https://www.cdn.meh.org/x", true),   // entry is itself a suffix
      ("https://localhost/x", false))
    val out = cases.map(_._1).toDF("url")
      .select($"url", UrlFunctions.blockedByDomainList($"url", bl).as("b"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((u, want) <- cases)
      assert(out(u) == want, s"blocked($u) = ${out(u)}, want $want")
  }

  test("compactParquet: many small files collapse, data survives as a multiset") {
    import graft.etl.Staging
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    df.repartition(37).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.count()
    val (nBefore, nAfter, bytes) = Staging.compactParquet(spark, dir,
      targetBytes = 512L * 1024)
    info(s"compact: $nBefore files -> $nAfter ($bytes bytes)")
    assert(nBefore == 37 && nAfter < nBefore && bytes > 0)
    val after = spark.read.parquet(dir)
    assert(after.count() == beforeRows)
    assert(after.exceptAll(df).isEmpty && df.exceptAll(after).isEmpty)
  }

  test("compactParquet: crash mid-swap is recovered on the next run") {
    import graft.etl.Staging
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_cr")
      .toString + "/t"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    df.repartition(3).write.parquet(dir)
    // simulate a crash inside the swap window: dir moved aside, no dir
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".__compact_old")))
    val (nb, na, _) = Staging.compactParquet(spark, dir, 1L << 20)
    assert(nb == 3 && na == 1)
    assert(spark.read.parquet(dir).exceptAll(df).isEmpty &&
      df.exceptAll(spark.read.parquet(dir)).isEmpty)
  }

  test("calibrationReport: out-of-range confidence clamps into the edge bins") {
    val df = Seq((-0.2, false), (0.1, false), (1.4, true), (0.9, true))
      .toDF("conf", "ok")
    val bins = Profiling.calibrationReport(df, $"conf", $"ok", bins = 4)
      .select($"bin", $"n").as[(Long, Long)].collect().toMap
    assert(bins.keySet == Set(0L, 3L), bins.toString)
    assert(bins(0L) == 2L && bins(3L) == 2L, bins.toString)
  }

  test("fellegiSunter: integer log-odds compose per field") {
    val pairs = Seq(
      ("ann", "ann", "a"),
      ("ann", "anx", "a"),
      ("ann", "xyz", "b")).toDF("n1", "n2", "s")
    val out = FuzzyJoin.fellegiSunter(pairs, Seq(
        (levenshtein($"n1", $"n2") <= 1, 3, -1),
        ($"s" === "a", 2, -1)))
      .select($"fs_score").as[Long].collect().toSeq
    assert(out == Seq(5L, 5L, -2L), out.toString)
  }

  test("calibrationReport: perfectly calibrated bins give zero ECE, skew does not") {
    // bin 0.25: 4 rows conf .25, 1 positive -> acc .25, gap 0
    // bin 0.75: 4 rows conf .75, 3 positive -> acc .75, gap 0
    val good = (Seq.fill(3)((0.25, false)) ++ Seq((0.25, true)) ++
      Seq.fill(3)((0.75, true)) ++ Seq((0.75, false))).toDF("conf", "ok")
    val g = Profiling.calibrationReport(good, $"conf", $"ok", bins = 4)
      .orderBy($"bin")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(g.map(_._1).toSeq == Seq(1L, 3L))
    assert(g.forall(_._6 == 0.0) && g.forall(_._7 == 0.0), g.mkString(","))
    // overconfident: conf .75 but only 25% correct -> gap 0.5
    val bad = (Seq.fill(3)((0.75, false)) ++ Seq((0.75, true))).toDF("conf", "ok")
    val b = Profiling.calibrationReport(bad, $"conf", $"ok", bins = 4)
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(b._6 == 0.5 && b._7 == 0.5, b.toString)
  }

  test("funnelConversion: ordered steps, out-of-order events don't count") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "view"), (2L, ts(2), "click"),
      (3L, ts(2), "view"), (3L, ts(1), "click"),  // click BEFORE view
      (4L, ts(5), "click")                        // never viewed
    ).toDF("user_id", "ts", "event_type")
    val out = graft.ext.TimeSeries.funnelConversion(ev, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy($"step")
      .as[(Long, String, Long, Double, Double)].collect().toSeq
    assert(out(0) == ((1L, "view", 3L, 1.0, 1.0)), out(0).toString)
    assert(out(1) == ((2L, "click", 2L, 0.666667, 0.666667)), out(1).toString)
    assert(out(2) == ((3L, "purchase", 1L, 0.5, 0.333333)), out(2).toString)
  }

  test("pseudonymize: stable, salt-sensitive, join-preserving") {
    val tok = TextAnalysis.pseudonymize($"k", "s1")
    val df = Seq(1L, 2L, 1L).toDF("k").select($"k", tok.as("t"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getString(1))
    assert(rows(0)._2 == rows(2)._2, "same key must map to same token")
    assert(rows(0)._2 != rows(1)._2, "different keys must differ here")
    assert(rows(0)._2.startsWith("tok_"))
    val other = Seq(1L).toDF("k")
      .select(TextAnalysis.pseudonymize($"k", "s2")).head().getString(0)
    assert(other != rows(0)._2, "salt must change the token")
  }

  test("knnOutlierScores: lone point scores far above a tight cluster") {
    // 8 near-identical vectors + one orthogonal lone point, k=3
    val cluster = (0 until 8).map { i =>
      (i.toLong, Seq(1.0f, 0.001f * i, 0.0f, 0.0f)) }
    val lone = Seq((99L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))
    val corpus = (cluster ++ lone).toDF("vec_id", "embedding")
    val edges = Similarity.knnGraph(corpus, "vec_id", "embedding",
      k = 3, via = "brute")
    val scores = Similarity.knnOutlierScores(edges)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    val clusterLof = (0L until 8L).map(scores)
    info(s"lof: lone=${scores(99L)} cluster=${clusterLof.mkString(",")}")
    assert(scores(99L) > 100.0,
      s"lone point must stand out: ${scores(99L)}")
    // tiny-denominator ratios wobble a few x inside the cluster;
    // the signal is the 5-orders-of-magnitude contrast with the
    // lone point, not the absolute members' values
    assert(clusterLof.forall(l => l < 5.0),
      s"cluster members must look normal: $clusterLof")
  }

  test("knnOutlierScores: identical scores through brute and ANN edges on a shared graph") {
    val e = Tables.embeddings(spark, sf0001).limit(100)
    val brute = Similarity.knnOutlierScores(
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5, via = "brute"))
    // the ANN path exercises the same scoring code — full coverage,
    // sane range (recall differences shift which edges feed it)
    val ann = Similarity.knnOutlierScores(
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5, via = "ivf"))
    assert(brute.count() == 100 && ann.count() == 100)
    assert(ann.filter($"lof" < 0.1 || $"lof" > 10.0).count() == 0,
      "ANN-edge lof must stay in a sane band on uniform data")
  }

  test("splitLeakAudit: naive split leaks, leakageSafeSplit audits clean") {
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id1", "id2")
    // naive split cuts straight through pairs (1,2) and (5,6)
    val naive = docs.select($"doc_id",
      when($"doc_id" % 2 === 0, "eval").otherwise("train").as("split"))
    val leaked = Sampling.splitLeakAudit(naive, "doc_id", "split", pairs)
      .filter($"is_cross").agg(sum($"n_pairs")).as[Long].head()
    assert(leaked == 3L, s"all three pairs cross the naive split: $leaked")
    // the component-aware split keeps every pair on one side
    val safe = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      Seq("train" -> 80, "eval" -> 20))
    val clean = Sampling.splitLeakAudit(safe, "doc_id", "split", pairs)
      .filter($"is_cross").count()
    assert(clean == 0L, "leakage-safe split must audit cross-free")
  }

  test("conformalInterval: exact line gives zero band and full coverage") {
    import java.sql.Timestamp
    // 20 days, exactly y = 100 + 2d events per day
    val ev = (0 until 20).flatMap { d =>
      (0 until 100 + 2 * d).map { i =>
        Tuple1(Timestamp.valueOf(f"2026-02-${d + 1}%02d 0${i % 9}:00:00")) }
    }.toDF("ts")
    val r = graft.ext.TimeSeries.conformalInterval(ev, "ts", alphaPct = 20)
      .as[(Long, Long, Long, Double, Double, Double, Long)].head()
    val (nFit, nCal, nTest, slope, _, qhat, nCov) = r
    assert(nFit == 12 && nCal == 4 && nTest == 4, r.toString)
    assert(slope == 2.0, s"slope $slope")
    assert(qhat == 0.0, s"perfect line needs no band: $qhat")
    assert(nCov == nTest, "zero-residual tail must be fully covered")
  }

  test("conformalInterval: noisy series still covers the tail at >= 1 - alpha - slack") {
    import java.sql.Timestamp
    // linear trend + deterministic bounded noise (pseudo-random via d*7%5)
    val ev = (0 until 30).flatMap { d =>
      (0 until 50 + d + (d * 7 % 5)).map { i =>
        Tuple1(Timestamp.valueOf(f"2026-03-${d + 1}%02d 0${i % 9}:10:00")) }
    }.toDF("ts")
    val r = graft.ext.TimeSeries.conformalInterval(ev, "ts", alphaPct = 20)
      .as[(Long, Long, Long, Double, Double, Double, Long)].head()
    val (_, nCal, nTest, _, _, qhat, nCov) = r
    info(s"conformal: $r")
    assert(nCal == 6 && nTest == 6)
    assert(qhat > 0.0)
    // finite-sample guarantee is on exchangeable data; this bounded-
    // noise series should still cover most of the tail
    assert(nCov >= nTest - 2, s"covered $nCov of $nTest")
  }

  test("ivfPqTopK: recall vs brute clears the q_n22 floor with margin") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 10)
    val cents = Similarity.trainIvfCentroids(e, "embedding", k = 16)
    val cb = Similarity.trainPqCodebooks(e, "embedding", dim = 64, m = 8, k = 16)
    val ann = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", cents,
        dim = 64, m = 8, kCentroids = 16, codebooks = cb, k = 5,
        nprobe = 4, oversample = 8)
      .select($"query_id", $"cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select($"query_id", $"cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & bf).size.toDouble / bf.size
    info(s"ivfpq recall@5 sf0.001: $recall")
    assert(recall >= 0.3, s"recall $recall too close to the 0.25 gate floor")
  }
}
