package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("codegen cosine agrees with HOF cosine on real embeddings") {
    val e = Tables.embeddings(spark, sf0001).limit(50)
    val pairs = e.select($"vec_id".as("id1"), $"embedding".as("v1"))
      .crossJoin(e.select($"vec_id".as("id2"), $"embedding".as("v2")))
      .filter($"id1" < $"id2")
    val diff = pairs.select(
      abs(VectorFunctions.cosine($"v1", $"v2") -
        VectorFunctions.cosineHof($"v1", $"v2")).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diff < 1e-12)
  }

  test("dot product on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val d = df.select(VectorFunctions.dot($"a", $"b")).as[Double].head()
    assert(d == 32.0)
  }

  test("brute-force top-k returns the true nearest neighbors") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),   // closest to 0
      (2L, Seq(0.5f, 0.5f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "vec")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"id" === 0), "id", "vec", k = 2)
      .select("cand_id", "rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1), (2L, 2)))
  }

  test("LSH ANN recall >= 0.6 vs brute force on sf0.001 embeddings") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(e, q, "vec_id", "embedding",
      dim = 64, k = 5, nBits = 16, bands = 8)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random-hyperplane LSH on near-uniform synthetic vectors is a weak
    // signal; this asserts the bucketing machinery works, not SOTA recall
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVF ANN: recall vs brute force, and probes fraction of corpus") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 20)
    val centroids = Similarity.trainIvfCentroids(e, "embedding", k = 8)
    assert(centroids.length == 8 && centroids.head.length == 64)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", centroids,
      k = 5, nprobe = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall") // uniform synthetic vectors: weak cells
  }

  test("persisted IVF index: same results as the in-session IVF path, " +
      "and the postings scan prunes cell directories") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 5)
    val root = java.nio.file.Files.createTempDirectory("graftvidx").toString
    val store = new graft.store.GraphStore(spark, root)
    val vi = new VectorIndex(spark, store)
    vi.build(e, "vec_id", "embedding", k = 8)
    val fromIndex = vi.query(q, "vec_id", "embedding", topK = 5, nprobe = 2)
    val inSession = Similarity.ivfTopK(e, q, "vec_id", "embedding",
      vi.centroids(), k = 5, nprobe = 2)
    // identical codebook -> identical cells -> identical candidates
    assert(fromIndex.exceptAll(inSession).count() == 0 &&
      inSession.exceptAll(fromIndex).count() == 0)
    // the isin(cell) filter must reach the scan as a PARTITION filter
    val plan = { fromIndex.collect(); fromIndex.queryExecution.executedPlan.toString }
    assert(plan.contains("PartitionFilters: [cell"),
      s"cell pruning not in the scan:\n$plan")
  }

  test("IVF centroid training is deterministic under a fixed seed") {
    val e = Tables.embeddings(spark, sf0001).limit(200)
    val a = Similarity.trainIvfCentroids(e, "embedding", k = 4)
    val b = Similarity.trainIvfCentroids(e, "embedding", k = 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("multi-probe LSH: strictly-superset candidates, recall >= single-probe") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val single = Similarity.lshTopK(e, q, "vec_id", "embedding",
        dim = 64, k = 5, nBits = 16, bands = 8)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshTopK(e, q, "vec_id", "embedding",
        dim = 64, k = 5, nBits = 16, bands = 8, multiProbe = true)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val rs = (exact & single).size.toDouble / exact.size
    val rm = (exact & multi).size.toDouble / exact.size
    assert(rm >= rs, s"multi-probe recall $rm < single $rs")
    assert(rm >= 0.8, s"multi-probe recall $rm")
  }

  test("lshTopK score-at-join is identical to the dedup-then-attach " +
      "formulation it replaced") {
    // the pre-round-11 shape: distinct on bare id pairs, then two
    // joins re-attaching the embeddings — semantically equal but it
    // sorted a vector-carrying stream proportional to band-collision
    // volume (ENOSPC at sf10). This asserts the rewrite is exact.
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 20)
    val now = Similarity.lshTopK(e, q, "vec_id", "embedding",
      dim = 64, k = 5, nBits = 16, bands = 8, multiProbe = true)
    val bitsPerBand = 2 // 16 bits / 8 bands
    val cB = Similarity.lshBuckets(e, "vec_id", "embedding", 64, 16, 8)
      .select(col("id").as("cand_id"), col("band_idx"), col("band_val"))
    val qB = Similarity.lshBuckets(q, "vec_id", "embedding", 64, 16, 8)
      .select(col("id").as("query_id"), col("band_idx"), col("band_val"))
      .select(col("query_id"), col("band_idx"),
        explode(array_union(
          array(col("band_val")),
          array((0 until bitsPerBand).map(j =>
            col("band_val").bitwiseXOR(1L << j)): _*))).as("band_val"))
    val candidates = cB.join(qB, Seq("band_idx", "band_val"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id")).distinct()
    val old = Similarity.rankTopK(candidates
      .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("cand_v")),
        Seq("cand_id"))
      .join(q.select(col("vec_id").as("query_id"), col("embedding").as("query_v")),
        Seq("query_id"))
      .withColumn("cos",
        round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6)), k = 5)
    assert(now.exceptAll(old).count() == 0 && old.exceptAll(now).count() == 0)
  }

  test("nnDescent with rounds = 0 is exactly the seed's edge set") {
    val e = Tables.embeddings(spark, sf0001)
    val n = e.count()
    val seed = Similarity.lshTopK(e, e, "vec_id", "embedding", dim = 64,
      k = 5, nBits = AnnGeometry.lshBits(n), bands = 4, multiProbe = false)
    val out = Similarity.nnDescent(e, "vec_id", "embedding", k = 5,
      seed, rounds = 0)
    assert(out.exceptAll(seed).count() == 0 &&
      seed.exceptAll(out).count() == 0)
  }

  test("nnDescent refinement never hurts the seed's recall and lifts a " +
      "weak single-probe seed to multi-probe-grade recall") {
    val e = Tables.embeddings(spark, sf0001)
    val n = e.count()
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "cand_id")
        .as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    // same-degree refinement: monotone improvement over the seed
    val seed5 = Similarity.lshTopK(e, e, "vec_id", "embedding", dim = 64,
      k = 5, nBits = AnnGeometry.lshBits(n), bands = 4, multiProbe = false)
    val rSeed = recall(seed5.filter($"rank" <= 5))
    val rNnd5 = recall(Similarity.nnDescent(e, "vec_id", "embedding",
      k = 5, seed5, rounds = 2).filter($"rank" <= 5))
    assert(rNnd5 >= rSeed, s"nnd $rNnd5 < seed $rSeed")
    // the production face (buildK = 3k, 3 rounds, truncate to k — the
    // knnGraph "nnd" shape): measured ≥0.72 across sf0.001–sf0.1,
    // floor with margin
    val rNnd = recall(Similarity.knnGraph(e, "vec_id", "embedding",
      k = 5, via = "nnd", knownN = n))
    assert(rNnd >= 0.6, s"nnd production-face recall $rNnd")
  }

  test("knnGraph via=nnd: k rows per node, deterministic across builds") {
    val e = Tables.embeddings(spark, sf0001)
    val n = e.count()
    val a = Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
      via = "nnd", knownN = n)
    assert(a.groupBy($"query_id").count().filter($"count" =!= 5).count() == 0)
    val b = Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
      via = "nnd", knownN = n)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("hardNegatives excludes positives and self, still yields k") {
    val e = Tables.embeddings(spark, sf0001)
    val queries = e.filter($"vec_id" < 3)
    // label each query's true nearest neighbor as its positive
    val nn = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 1)
      .select($"query_id", $"cand_id".as("pos_id"))
    val neg = Similarity.hardNegatives(e, queries, nn, "vec_id", "embedding", k = 5)
      .select($"query_id", $"cand_id", $"rank").as[(Long, Long, Int)].collect()
    assert(neg.length == 15) // 3 queries x 5 negatives
    val neighbors = nn.as[(Long, Long)].collect().toSet
    assert(neg.forall { case (q, c, _) => !neighbors((q, c)) && q != c })
    // negatives are the top-k of the remainder: rank-1 negative equals
    // the brute-force rank-2 overall
    val bf2 = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 2)
      .filter($"rank" === 2).select($"query_id", $"cand_id")
      .as[(Long, Long)].collect().toSet
    assert(neg.filter(_._3 == 1).map(r => (r._1, r._2)).toSet == bf2)
  }

  test("rrfFuse: rank math, asymmetric membership, deterministic ties") {
    // list A ranks: x(1), y(2), z(3); list B ranks: y(1), x(2) — z absent
    val a = Seq(("x", 0.9), ("y", 0.8), ("z", 0.7)).toDF("id", "score")
    val b = Seq(("y", 0.99), ("x", 0.5)).toDF("id", "score")
    val out = Similarity.rrfFuse(Seq(a, b), "id", "score", kConst = 60)
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def rr(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("x") == ((rr(1, 2), 2L)))
    assert(out("y") == ((rr(2, 1), 2L)))
    assert(out("z") == ((rr(3), 1L))) // single-list membership
    // equal scores tie-break by id: both get ranks in id order
    val t = Seq(("b", 1.0), ("a", 1.0)).toDF("id", "score")
    val tied = Similarity.rrfFuse(Seq(t), "id", "score")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(tied("a") == rr(1) && tied("b") == rr(2))
  }

  test("PQ encode/ADC: table score equals reconstruction cosine modulo query norm") {
    val e = Tables.embeddings(spark, sf0001).limit(100)
    val cb = Similarity.trainPqCodebooks(e, "embedding", dim = 64, m = 8, k = 4)
    assert(cb.length == 8 * 4 * 8)
    val m = 8; val dsub = 8; val k = 4
    val norm2 = graft.functions.PqKernel.centroidNorm2(cb, m, dsub, k)
    val row = e.select(
        graft.functions.Pq.pqTableScore(
          graft.functions.Pq.pqAdcTable($"embedding", cb, m, dsub, k),
          graft.functions.Pq.pqEncode($"embedding", cb, m, dsub, k),
          norm2, k).as("score"),
        $"embedding",
        graft.functions.Pq.pqEncode($"embedding", cb, m, dsub, k).as("codes"))
      .as[(Double, Seq[Float], Seq[Int])].collect()
    row.foreach { case (score, vec, codes) =>
      // reconstruct decoded vector on the driver and recompute
      val decoded = codes.zipWithIndex.flatMap { case (c, j) =>
        (0 until dsub).map(i => cb(j * k * dsub + c * dsub + i)) }
      val dot = vec.zip(decoded).map { case (a, b) => a.toDouble * b }.sum
      val dn = math.sqrt(decoded.map(x => x * x).sum)
      val expected = if (dn == 0.0) 0.0 else dot / dn
      assert(math.abs(score - expected) < 1e-9, s"$score vs $expected")
    }
  }

  test("PQ ANN: recall vs brute force with oversample-and-refine") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 20)
    val cb = Similarity.trainPqCodebooks(e, "embedding", dim = 64, m = 8, k = 16)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(e, q, "vec_id", "embedding",
      dim = 64, m = 8, kCentroids = 16, codebooks = cb, k = 5, oversample = 8)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // measured 0.65 at sf0.001 (uniform vectors, PQ's worst case)
    assert(recall >= 0.5, s"recall $recall")
    // refine output carries exact cosine: every returned pair's cos must
    // match the brute-force score for that pair
    val bfScores = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 200)
      .select("query_id", "cand_id", "cos").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val pqScores = Similarity.pqTopK(e, q, "vec_id", "embedding",
      dim = 64, m = 8, kCentroids = 16, codebooks = cb, k = 5, oversample = 8)
      .select("query_id", "cand_id", "cos").as[(Long, Long, Double)].collect()
    pqScores.foreach { case (qid, cid, cos) =>
      bfScores.get((qid, cid)).foreach(bf => assert(math.abs(bf - cos) < 1e-9)) }
  }

  test("PQ kernels tolerate short vectors (zero-pad) instead of faulting the task") {
    val cb = Array.fill(2 * 2 * 2)(0.5) // m=2, dsub=2, k=2
    val df = Seq(Seq(1.0f), Seq(1.0f, 2.0f, 3.0f, 4.0f)).toDF("v")
    val out = df.select(
      graft.functions.Pq.pqEncode($"v", cb, 2, 2, 2).as("codes"),
      graft.functions.Pq.pqTableScore(
        graft.functions.Pq.pqAdcTable($"v", cb, 2, 2, 2),
        graft.functions.Pq.pqEncode($"v", cb, 2, 2, 2),
        graft.functions.PqKernel.centroidNorm2(cb, 2, 2, 2), 2).as("score"))
      .collect()
    assert(out.length == 2 && out.forall(!_.isNullAt(0)))
  }

  test("lshSignature is deterministic and seed-sensitive") {
    val e = Tables.embeddings(spark, sf0001).limit(10)
    val s1 = e.select(Similarity.lshSignature($"embedding", 64, 16, seed = 42).as("s"))
      .as[Long].collect().toSeq
    val s2 = e.select(Similarity.lshSignature($"embedding", 64, 16, seed = 42).as("s"))
      .as[Long].collect().toSeq
    val s3 = e.select(Similarity.lshSignature($"embedding", 64, 16, seed = 7).as("s"))
      .as[Long].collect().toSeq
    assert(s1 == s2)
    assert(s1 != s3)
  }

  test("sqTopK: 8-bit quantized retrieval stays close to brute force") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    val truth = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.sqTopK(e, q, "vec_id", "embedding", dim = 64, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (sq & truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"SQ8 recall@5 $recall")
    // the quantization grid is sane: range training covers the corpus
    val (lo, hi) = Similarity.trainSqRange(e, "embedding", 64)
    assert(lo.size == 64 && hi.size == 64 && lo.zip(hi).forall(p => p._1 <= p._2))
  }

  test("funnelTopK: full-prefix funnel is exactly brute force; " +
      "truncated prefix keeps recall") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id", "cos", "rank")
    val full = Similarity.funnelTopK(e, q, "vec_id", "embedding",
        dimPrefix = 64, k = 5)
      .select("query_id", "cand_id", "cos", "rank")
    assert(full.exceptAll(brute).isEmpty && brute.exceptAll(full).isEmpty)
    // these embeddings are NOT MRL-trained (synthetic, variance spread
    // over all 64 dims), so the 16-dim prefix is a worst case for the
    // funnel; oversample is the recall knob — it must climb with it
    def recallAt(oversample: Int): Double = {
      val trunc = Similarity.funnelTopK(e, q, "vec_id", "embedding",
          dimPrefix = 16, k = 5, oversample = oversample)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      val truth = brute.select("query_id", "cand_id")
        .as[(Long, Long)].collect().toSet
      (trunc & truth).size.toDouble / truth.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16)
    assert(r16 >= r4 && r16 >= 0.5, s"funnel recall@5: x4 $r4, x16 $r16")
  }

  test("pre-filter retrieval returns k from the filtered set; post-filter loses rows") {
    val e = Tables.embeddings(spark, sf0001)
    val meta = Tables.documents(spark, sf0001)
      .select($"doc_id".as("vec_id"), $"lang")
    val en = e.join(meta, Seq("vec_id")).filter($"lang" === "en")
      .select($"vec_id", $"embedding")
    val q = e.filter($"vec_id" < 6)
    val pre = Similarity.bruteForceTopK(en, q, "vec_id", "embedding", k = 5)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    // every pre-filter result IS from the filtered set, 5 per query
    val enIds = en.select($"vec_id").as[Long].collect().toSet
    assert(pre.forall(p => enIds.contains(p._2)))
    assert(pre.groupBy(_._1).forall(_._2.size == 5))
    // post-filter: global top-5 intersected with the predicate — a
    // strict subset (queries whose global top-5 is not all-English
    // come up short); the measured loss is the point of pre-filtering
    val post = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .filter(p => enIds.contains(p._2)).toSet
    assert(post.subsetOf(pre), "post-filter found something pre-filter missed")
    assert(post.size < pre.size, "post-filter lost nothing — predicate vacuous?")
  }

  test("mmrRerank: diversity skips the near-duplicate; lambda=1 is pure relevance") {
    val vecs = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // query
      (1L, Array(0.99f, 0.14f, 0.0f, 0.0f)),  // top relevance
      (2L, Array(0.99f, 0.141f, 0.0f, 0.0f)), // near-duplicate of 1
      (3L, Array(0.8f, 0.0f, 0.6f, 0.0f)),    // relevant AND diverse
      (4L, Array(0.0f, 0.0f, 0.0f, 1.0f))     // orthogonal, irrelevant
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 100L)
    def picks(lam: Double): Seq[Long] =
      Similarity.mmrRerank(vecs, q, "vec_id", "embedding",
          m = 4, k = 3, lambda = lam)
        .orderBy("pick_rank").as[(Long, Long, Long, Double)]
        .collect().map(_._3).toSeq
    // λ=0.5: 2's redundancy (sim≈1 to pick 1) buries it below even the
    // orthogonal 4 — the greedy path is 1, 3 (diverse), 4
    assert(picks(0.5) == Seq(1L, 3L, 4L), picks(0.5).mkString(", "))
    // λ=1 disables the penalty: identical to relevance order
    assert(picks(1.0) == Seq(1L, 2L, 3L), picks(1.0).mkString(", "))
  }

  test("signProject: JL cosine preservation within ~1/sqrt(outDim), no checkerboard") {
    val e = Tables.embeddings(spark, sf0001).limit(100)
    def cosines(df: org.apache.spark.sql.DataFrame, vc: String): Map[(Long, Long), Double] =
      df.select($"vec_id".as("id1"), col(vc).as("v1"))
        .crossJoin(df.select($"vec_id".as("id2"), col(vc).as("v2")))
        .filter($"id1" < $"id2" && ($"id1" + $"id2") % 7 === 0)
        .select($"id1", $"id2", VectorFunctions.cosineHof($"v1", $"v2").as("c"))
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val orig = cosines(e, "embedding")
    val proj = Similarity.signProject(e, "vec_id", "embedding", outDim = 16)
    val pc = cosines(proj, "proj")
    assert(pc.keySet == orig.keySet)
    val mae = orig.keys.map(k => math.abs(orig(k) - pc(k))).sum / orig.size
    assert(mae < 0.3, s"mean |cos - projCos| = $mae over ${orig.size} pairs")
    // a (j+k)-parity sign pattern would make all projected dims equal
    // up to sign — pairwise |cos| would collapse to ~1.0; mean |projCos|
    // staying moderate proves the hash is not a checkerboard
    val meanAbs = pc.values.map(math.abs).sum / pc.size
    assert(meanAbs < 0.9, s"mean |projCos| = $meanAbs — sign matrix degenerate")
    // deterministic: a second invocation projects identically
    val again = Similarity.signProject(e, "vec_id", "embedding", outDim = 16)
    assert(cosines(again, "proj") == pc)
  }

  test("signProject codegen kernel is bit-identical to the HOF composition") {
    // The FloatVecSignProject kernel replaced the aggregate(sequence(...))
    // HOF form (interpreted ArrayAggregate) in round 13; both compute
    // out[j] = (Σ_k v[k]·sgn(j,k))/√outDim with the same squared-modular
    // hash and the same sequential k-order double fold, so every output
    // double must match EXACTLY (not within epsilon) on real embeddings.
    val e = Tables.embeddings(spark, sf0001).limit(200)
    for (outDim <- Seq(1, 16, 33)) {
      val kern = Similarity.signProject(e, "vec_id", "embedding", outDim)
        .as[(Long, Seq[Double])].collect().toMap
      val hof = Similarity.signProjectHof(e, "vec_id", "embedding", outDim)
        .as[(Long, Seq[Double])].collect().toMap
      assert(kern.keySet == hof.keySet)
      kern.foreach { case (id, v) =>
        assert(v == hof(id), s"outDim=$outDim vec_id=$id kernel=$v hof=${hof(id)}")
      }
    }
  }
}
