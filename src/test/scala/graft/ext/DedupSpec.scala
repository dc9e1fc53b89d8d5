package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private lazy val docs = Seq(
    (1L, base),
    (2L, "prefix tokens " + base),                  // near-dup of 1
    (3L, "completely different words about spark engines and columnar scans here"),
    (4L, base)                                      // exact dup of 1
  ).toDF("id", "text")

  test("exact groups: representative + multiplicity") {
    val g = Dedup.groups(docs, "id", Seq("text")).orderBy("rep_id")
      .select("rep_id", "n").as[(Long, Long)].collect().toSeq
    assert(g == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    assert(Dedup.dropExact(docs, "id", Seq("text")).count() == 3)
  }

  test("minhash LSH finds planted near-dups and exact dups, not unrelated docs") {
    val pairs = Dedup.minHashDupPairs(docs, "id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash jaccard estimate: exact dup scores 1.0") {
    val pairs = Dedup.minHashDupPairs(docs, "id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.4)
      .filter($"id1" === 1 && $"id2" === 4).select("jaccard").as[Double].collect()
    assert(pairs.length == 1 && pairs(0) == 1.0)
  }

  test("simhash: identical text -> distance 0; near text -> small; different -> large") {
    val sigs = docs.select($"id", Dedup.simHash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(2L)) <= 8)
    assert(hamming(sigs(1L), sigs(3L)) > 8)
  }

  test("simHashDupPairs returns planted pairs within hamming budget") {
    val pairs = Dedup.simHashDupPairs(docs, "id", "text", maxHamming = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard matches hand computation") {
    val a = "w1 w2 w3 w4" // shingles: {w1 w2 w3, w2 w3 w4}
    val b = "w1 w2 w3 w5" // shingles: {w1 w2 w3, w2 w3 w5}
    val d = Seq((1L, a), (2L, b)).toDF("id", "text")
    val out = Dedup.ngramJaccardPairs(d, "id", "text", shingleN = 3, threshold = 0.1)
      .as[(Long, Long, Double)].collect().toSeq
    // |A∩B| = 1, |A∪B| = 3 -> 1/3
    assert(out == Seq((1L, 2L, 0.3333)))
  }

  test("embedding near-dup: identical vectors score 1.0, orthogonal excluded") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f))).toDF("id", "vec")
    val out = Dedup.embeddingDupPairs(e, "id", "vec", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 1.0)))
  }

  test("LSH embedding dedup: subset of brute force, high recall, exact scores") {
    val e = graft.Tables.embeddings(spark, sf0001)
    val bf = Dedup.embeddingDupPairs(e, "vec_id", "embedding", threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.embeddingDupPairsLsh(e, "vec_id", "embedding",
        threshold = 0.4, dim = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(bf.nonEmpty) // the comparison must not be vacuous
    // verify-on-candidates ⇒ every emitted pair is exact (same cos as
    // brute force); band recall is probabilistic (2-bit bands ⇒ ≈0.98
    // per pair at cos 0.4), so assert subset + a recall floor — the
    // gate query q_d6 asserts exact equality at its own configuration
    assert(lsh.subsetOf(bf), s"non-subset: ${lsh -- bf}")
    val recall = lsh.size.toDouble / bf.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${bf.size})")
  }

  test("semDeDup: planted scaled copies are dropped, survivors keep one per group") {
    val e = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    val copies = e.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", x => x * lit(1.001f)).as("embedding"))
    val corpus = e.unionByName(copies)
    val cents = Similarity.trainIvfCentroids(corpus, "embedding", k = 8)
    val pairs = Dedup.semanticDupPairs(corpus, "vec_id", "embedding", cents, 0.45)
    // every planted identity pair is found (copies co-cluster: cosine
    // 1.0 and L2-adjacent) and scored exactly 1.0
    val planted = pairs.filter($"id2" === $"id1" + 1000000L)
      .as[(Long, Long, Double)].collect()
    assert(planted.length == copies.count().toInt, s"found ${planted.length}")
    assert(planted.forall(_._3 == 1.0))
    // drop face: one survivor per component, no surviving planted pair
    val kept = Dedup.semDeDup(corpus, "vec_id", "embedding", cents, 0.45)
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    val bothEnds = planted.filter(p => keptIds(p._1) && keptIds(p._2))
    assert(bothEnds.isEmpty, s"surviving planted pairs: ${bothEnds.toSeq}")
    // representatives survive: min-id end of each planted pair kept
    // unless it was itself merged into a lower-id component
    assert(kept.count() < corpus.count())
    assert(keptIds.nonEmpty)
    // deterministic across calls with the same centroids
    val again = Dedup.semDeDup(corpus, "vec_id", "embedding", cents, 0.45)
      .select("vec_id").as[Long].collect().toSet
    assert(again == keptIds)
  }

  test("keepBestNearDup keeps the highest-preference member per component") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "b", 99L), (3L, "c", 50L), // component {1,2,3}
      (7L, "d", 1L),                                  // singleton
      (10L, "e", 5L), (11L, "f", 5L)                  // pref tie -> min id
    ).toDF("id", "text", "pref")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (10L, 11L, 0.9))
      .toDF("id1", "id2", "sim")
    val kept = Dedup.keepBestNearDup(docs, "id", pairs, "pref")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 7L, 10L)) // max pref wins; singleton kept; tie -> min id
    // schema passes through unchanged
    assert(Dedup.keepBestNearDup(docs, "id", pairs, "pref").columns.toSeq ==
      Seq("id", "text", "pref"))
  }

  test("resolveDupGroups: min-label propagation over chained pairs") {
    // chain 1-2, 2-3, 3-4 plus isolated pair 10-11: components
    // {1,2,3,4} rep 1 and {10,11} rep 10 — the chain needs >1
    // propagation round, exercising the fixpoint loop
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val comp = Dedup.resolveDupGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L).toDF("id")
    val kept = Dedup.dropNearDups(docs, "id", pairs)
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 5L, 10L)) // reps + unpaired survive
  }

  test("incremental minhash dedup: cross-batch and in-batch dups flagged; " +
      "index grows only with novel docs; replay is safe") {
    val root = java.nio.file.Files.createTempDirectory("graftincdedup").toString
    val store = new graft.store.GraphStore(spark, root)
    val inc = new Dedup.IncrementalMinHashDedup(spark, store, threshold = 0.9)
    inc.init()
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about graph analytics engines at scale"
    val textC = "a third unrelated document mentioning training data pipelines"
    def ids() = store.nodes("minhash_sig").select("id").as[Long].collect().toSet

    val r1 = inc.applyBatch(
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), "doc_id", "text")
    assert(r1.count() == 0 && ids() == Set(1L, 2L))

    // 3 duplicates A (cross-batch), 4 is novel, 5 duplicates 4 (in-batch)
    val batch2 = Seq((3L, textA), (4L, textC), (5L, textC)).toDF("doc_id", "text")
    val r2 = inc.applyBatch(batch2, "doc_id", "text")
    val pairs = r2.select("new_id", "matched_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((3L, 1L, 1.0), (5L, 4L, 1.0)))
    assert(ids() == Set(1L, 2L, 4L)) // dups never enter the index

    // at-least-once replay: everything in the batch now reads as a dup
    // (4 matches its own stored signature) and the index is unchanged
    val r3 = inc.applyBatch(batch2, "doc_id", "text")
    assert(r3.filter($"new_id" === 4L && $"matched_id" === 4L).count() == 1)
    assert(ids() == Set(1L, 2L, 4L))
  }

  test("ngram jaccard df-cap drops hot-shingle pairs but keeps exact ones") {
    // shingle 'w1 w2 w3' appears in all 3 docs (df=3); with the cap at
    // 2 no pair can form through it, and doc pairs that ONLY share it
    // disappear — the documented at-scale approximation
    val d = Seq((1L, "w1 w2 w3 a4"), (2L, "w1 w2 w3 b4"), (3L, "w1 w2 w3 c4"))
      .toDF("id", "text")
    val uncapped = Dedup.ngramJaccardPairs(d, "id", "text", shingleN = 3,
      threshold = 0.1)
    assert(uncapped.count() == 3)
    val capped = Dedup.ngramJaccardPairs(d, "id", "text", shingleN = 3,
      threshold = 0.1, maxShingleDf = 2)
    assert(capped.count() == 0)
  }

  test("prefix-filtered exact Jaccard equals the all-pairs result (lossless blocking)") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id".as("id"), $"text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val brute = Dedup.ngramJaccardPairs(docs, "id", "text",
          shingleN = 3, threshold = t, maxShingleDf = Int.MaxValue)
        .as[(Long, Long, Double)].collect().toSet
      val prefix = Dedup.prefixJaccardPairs(docs, "id", "text",
          shingleN = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefix == brute, s"threshold $t: ${prefix.size} vs ${brute.size}")
    }
    // planted corpus: the copies must all pair with their originals
    val planted = docs.unionByName(
      docs.filter($"id" % 10 === 0)
        .select(($"id" + 1000000).as("id"),
          concat(lit("duplicate marker "), $"text").as("text")))
    val pairs = Dedup.prefixJaccardPairs(planted, "id", "text",
        shingleN = 3, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val expected = docs.filter($"id" % 10 === 0)
      .select($"id").as[Long].collect()
      .map(i => (i, i + 1000000)).toSet
    assert(expected.subsetOf(pairs))
  }

  test("containmentPairs: quotes contained at 1.0, asymmetric, lossless blocking") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "e f g h i j k l m"), // contiguous slice of 1 → C(2→1) = 1.0
      (3L, "t s r q p o n m l k j i h g f"), // reversed order: different shingles
      (4L, "a b c d e f g h i j k l m n o p q r s t") // exact dup of 1
    ).toDF("id", "text")
    val pairs = Dedup.containmentPairs(corpus, "id", "text",
        shingleN = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.contains((2L, 1L, 1.0)) && pairs.contains((2L, 4L, 1.0)))
    assert(pairs.contains((1L, 4L, 1.0)) && pairs.contains((4L, 1L, 1.0)))
    // asymmetry: the big doc is NOT contained in its quote
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 2L))
    // prefix blocking is lossless vs the brute-force all-pairs replay
    val sets = corpus.select($"id",
      array_distinct(TextAnalysis.shingles($"text", 3)).as("sh"))
    val brute = sets.as("a").join(sets.as("b"), $"a.id" =!= $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        round(size(array_intersect($"a.sh", $"b.sh")).cast("double") /
          size($"a.sh"), 4).as("c"))
      .filter($"c" >= 0.9).as[(Long, Long, Double)].collect().toSet
    assert(pairs == brute, s"${pairs.size} vs brute ${brute.size}")
  }
}
