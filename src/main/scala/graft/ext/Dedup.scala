package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines (driver
  * extension, SURVEY §7 module 6): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every operator is a constant number of DataFrame
  * jobs. The approximate ones (MinHash, SimHash) compute per-row
  * signatures map-side (no shuffle), then shuffle only the tiny
  * (band, id) pairs for bucketing — the classic shingle→minhash→band→
  * bucket-join layout that keeps the candidate join linear in the
  * number of colliding pairs rather than quadratic in corpus size.
  * The exact-Jaccard verify runs only on candidates.
  */
object Dedup {

  /** Exact dedup: one representative (min id) + multiplicity per
    * distinct key. `groups(...).filter($"n" > 1)` is the duplicate
    * report; semantics match reference A6 generalized to any column. */
  def groups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n"))

  /** Exact dedup: keep the min-id row per distinct key. */
  def dropExact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.join(groups(df, idCol, keyCols).select(col("rep_id").as(idCol)), Seq(idCol), "left_semi")

  /** Per-group token-yield report of exact dedup — "what will dedup
    * cost each source?", the budgeting number a mixture plan needs
    * BEFORE committing quotas (a source that is 40% self-copies
    * contributes far fewer net tokens than its raw size claims).
    * Keep-first = min id per exact text (the [[dropExact]] rule, as
    * one keyed window — a duplicate spanning two sources credits the
    * min-id's source, exactly like the real pass would). All counts
    * exact integers; yield is one division. Returns
    * (grp, n_docs, raw_tokens, kept_docs, kept_tokens, token_yield). */
  def dedupYield(docs: DataFrame, idCol: String, textCol: String,
      grpCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    docs.select(col(grpCol).as("grp"), col(idCol), col(textCol),
        TextAnalysis.tokenCount(col(textCol)).as("__nt"))
      .withColumn("__rk", row_number().over(w))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("raw_tokens"),
        sum(when(col("__rk") === 1, 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("__rk") === 1, col("__nt")).otherwise(0L))
          .as("kept_tokens"))
      .withColumn("token_yield",
        when(col("raw_tokens") > 0, round(col("kept_tokens").cast("double") /
          col("raw_tokens").cast("double"), 6)))
  }

  // ---- MinHash + LSH ----

  /** Deterministic MinHash signature (k permutations) over a string
    * shingle array. h_j(s) = (a_j·xxhash64(s) + b_j) mod p, p
    * Mersenne-31; signature_j = min over shingles. Backed by the
    * codegen'd [[graft.functions.MinHashSignature]] kernel — the
    * composed-HOF formulation was ~300× slower at sf0.1 because
    * projection collapse duplicates the shingle-hash subtree into
    * every signature position (see graft.functions.MinHash). */
  def minHashSignature(shingleArr: Column, k: Int, seed: Long = 42L): Column =
    graft.functions.MinHash.minhashSignature(shingleArr, k, seed)

  /** MinHash+LSH near-dup pairs, exact-Jaccard-verified.
    *
    * @param docs (id, text)
    * @return (id1, id2, jaccard) with id1 < id2, jaccard >= threshold
    */
  def minHashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    // tokens only on the big pass; shingle strings are never
    // materialized per row (fused into the minhash kernel) — the
    // exact-Jaccard verify computes shingles post-join, so only
    // candidate pairs pay the HOF cost
    val base = docs.select(
        col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleN)
    val banded = base.select(col("id"),
      posexplode(graft.functions.MinHash.minhashTokenBands(
        col("toks"), shingleN, k, bands, seed)).as(Seq("band_idx", "band_hash")))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2")).distinct()
    exactJaccard(candidates, base, shingleN, threshold)
  }

  /** Exact Jaccard over candidate pairs: join both token arrays, then
    * one fused kernel pass per pair ([[graft.functions.JaccardKernel]]
    * — the HOF shingle-array formulation was interpreted and
    * dominated the sf10 pair builds; same string-set semantics,
    * bit-identical results). */
  private def exactJaccard(pairs: DataFrame, base: DataFrame, shingleN: Int,
      threshold: Double): DataFrame = {
    val a = base.select(col("id").as("id1"), col("toks").as("t1"))
    val b = base.select(col("id").as("id2"), col("toks").as("t2"))
    pairs.join(a, Seq("id1")).join(b, Seq("id2"))
      .withColumn("jaccard", round(graft.functions.Jaccard
        .tokenShingleJaccard(col("t1"), col("t2"), shingleN), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** All-pairs exact n-gram Jaccard >= threshold (the oracle-checkable
    * baseline the LSH path approximates): shingle-explode, equi-join on
    * shingle, count shared per pair, compute |A|+|B|-shared union size.
    *
    * The pair join is bounded by a shingle document-frequency cap
    * (the standard stop-shingle guard): a shingle appearing in df
    * documents contributes df² join rows, so one boilerplate shingle
    * shared by millions of documents would otherwise dominate the
    * shuffle. Shingles with df > `maxShingleDf` are dropped before
    * the join (and df < 2 shingles too — they can't form a pair).
    * Exact whenever no shared shingle exceeds the cap (true on this
    * corpus where max df is tiny); at 100 TB the dropped shingles are
    * boilerplate whose pairs the LSH path ([[minHashDupPairs]]) is
    * the advertised way to find. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Int = 10000): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
        array_distinct(TextAnalysis.shingles(col(textCol), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("setsize", size(col("sh")))
    val exploded0 = sets.select(col("id"), col("setsize"), explode(col("sh")).as("s"))
    val pairable = exploded0.groupBy("s").agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2, maxShingleDf)).select("s")
    val exploded = exploded0.join(pairable, Seq("s"))
    val shared = exploded.as("x").join(exploded.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id1"), col("y.id").as("id2"),
        col("x.setsize").as("n1"), col("y.setsize").as("n2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("n1") + col("n2") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** EXACT Jaccard-threshold self-join with prefix filtering (SSJoin/
    * PPJoin family — Chaudhuri et al. ICDE'06, Xiao et al. WWW'08):
    * the scale-safe exact path between [[ngramJaccardPairs]] (all
    * pairs by shingle — the oracle baseline, quadratic in shared-
    * shingle frequency) and [[minHashDupPairs]] (linear but
    * approximate).
    *
    * Completeness: order every document's shingle set by one global
    * total order (document frequency asc, then shingle — rare-first,
    * which is what keeps blocks small); J(A,B) ≥ t implies
    * |A∩B| ≥ ceil(t·|A|), and if none of those common shingles sat in
    * A's first |A| − ceil(t·|A|) + 1 shingles they would all have to
    * fit in the ceil(t·|A|) − 1 suffix slots — contradiction. So
    * blocking on prefix shingles only (both sides) loses NO pair above
    * the threshold; DedupSpec pins equality with the all-pairs result.
    * Shingles with df = 1 are skipped after ranking (no partner
    * exists; ranks are computed over the full set first so prefix
    * membership is unchanged).
    *
    * The exact-Jaccard verify runs only on candidate id pairs (sets
    * joined back by id — point lookups, not a second all-pairs). */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold $threshold")
    import org.apache.spark.sql.expressions.Window
    // materialized once: the shingle kernel feeds FOUR consumers (two
    // prefix sides, two verify joins) and would re-run per reference
    // otherwise — measured 6.7 → 3.2 s at sf0.1
    val sets = docs.select(col(idCol).as("id"),
        array_distinct(TextAnalysis.shingles(col(textCol), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
      .localCheckpoint(true)
    val ex = sets.select(col("id"), col("sz"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfreq, Seq("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
    val prefix = ranked
      .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1 &&
        col("df") >= 2)
      .select(col("id"), col("s"), col("sz"), col("rk"))
      .localCheckpoint(true) // self-joined below: one window pass, not two
    // two further LOSSLESS prunes (PPJoin): length filter — J ≥ t
    // forces t·|B| ≤ |A| ≤ |B|/t — and positional filter — a pair
    // first meeting at ranks (rkA, rkB) has at most
    // min(|A|−rkA, |B|−rkB) + 1 shared shingles, which must still
    // reach the overlap bound α = ceil(t/(1+t)·(|A|+|B|)). On a
    // dense-vocabulary corpus these cut candidates ~10×; DedupSpec's
    // equality-with-all-pairs property holds over them.
    val alpha = ceil(lit(threshold / (1.0 + threshold)) *
      (col("a.sz") + col("b.sz")))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
        col("a.sz") >= ceil(lit(threshold) * col("b.sz")) &&
        col("b.sz") >= ceil(lit(threshold) * col("a.sz")) &&
        least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")) + 1 >= alpha)
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    cand
      .join(sets.select(col("id").as("id1"), col("sh").as("sh1"),
        col("sz").as("n1")), Seq("id1"))
      .join(sets.select(col("id").as("id2"), col("sh").as("sh2"),
        col("sz").as("n2")), Seq("id2"))
      .withColumn("inter",
        graft.functions.Jaccard.intersectSize(col("sh1"), col("sh2")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Asymmetric containment self-join: directed pairs (a, b) with
    * C(a→b) = |Sa ∩ Sb| / |Sa| ≥ t over n-gram shingle sets — the
    * subset/quote detector symmetric Jaccard structurally misses
    * (a 50-token passage quoted inside a 5000-token page has
    * J ≈ 0.01 but C = 1.0; this is how a pipeline finds documents
    * that are mostly recycled from a larger one).
    *
    * Prefix principle, containment variant of [[prefixJaccardPairs]]:
    * C ≥ t forces |Sa ∩ Sb| ≥ ceil(t·|Sa|), so if no common shingle
    * sat in a's first |Sa| − ceil(t·|Sa|) + 1 rare-first slots they
    * would all have to fit in the remaining ceil(t·|Sa|) − 1 —
    * contradiction. Only the CONTAINED side can block on a prefix;
    * the containing side posts ALL its df ≥ 2 shingles (b may hold a
    * anywhere, no b-side prefix bound exists — this is inherent to
    * the asymmetric predicate, not a shortcut). Length prune:
    * |Sb| ≥ ceil(t·|Sa|). Exact containment verifies on candidate id
    * pairs only. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.9): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold $threshold")
    import org.apache.spark.sql.expressions.Window
    val sets = docs.select(col(idCol).as("id"),
        array_distinct(TextAnalysis.shingles(col(textCol), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
      .localCheckpoint(true) // feeds prefix, posting and both verify joins
    val ex = sets.select(col("id"), col("sz"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfreq, Seq("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
    val prefixA = ranked
      .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1 &&
        col("df") >= 2)
      .select(col("id").as("id_a"), col("s"), col("sz").as("n_a"))
    val postB = ex.join(dfreq.filter(col("df") >= 2).select("s"), Seq("s"))
      .select(col("id").as("id_b"), col("s"), col("sz").as("n_b"))
    val cand = prefixA.join(postB,
        prefixA("s") === postB("s") && col("id_a") =!= col("id_b") &&
        col("n_b") >= ceil(lit(threshold) * col("n_a")))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("sz").as("n_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("containment",
        round(graft.functions.Jaccard.intersectSize(col("sh_a"), col("sh_b"))
          .cast("double") / col("n_a"), 4))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** Resolve near-dup pairs into components with a canonical (min-id)
    * representative. Delegates to the alternating-star connected
    * components ([[graft.query.GraphQueries.connectedComponentsStar]],
    * Kiveris SoCC'14): O(log n) rounds instead of the O(diameter)
    * min-label propagation this used to run — the round-7 full-suite
    * sf1 bench caught a SimHash near-dup CHAIN whose diameter blew
    * past label propagation's 20-round cap (chains are exactly what
    * transitive near-dup closure produces on replicated corpora; at
    * 100 TB they are the norm, not the pathology). The result is
    * identical — every node labeled with its component's minimum id —
    * so every oracle's recursive-reachability replay still matches.
    *
    * @return (id, rep) for every id that appears in a pair
    */
  def resolveDupGroups(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    graft.query.GraphQueries.connectedComponentsStar(
        pairs.select(col("id1").as("u"), col("id2").as("v")),
        maxRounds = maxIter)
      .select(col("node").as("id"), col("component").as("rep"))

  /** Near-dup cluster-size histogram — the corpus-shape report the
    * pair list hides: "is duplication a few giant template families
    * or many small pairs?" drives whether keep-one dedup saves 5% or
    * 50% of the tokens. Components from [[resolveDupGroups]] over the
    * candidate pairs, sizes counted, unpaired docs reported as the
    * size-1 row. Returns (size, n_clusters). Scale: the pair CC plus
    * two hash aggregates; the singleton row is two scalar counts. */
  def dupClusterSizes(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val labels = resolveDupGroups(pairs)
    val multi = labels.groupBy(col("rep"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("size")).agg(count(lit(1)).as("n_clusters"))
    val singles = docs.agg(count(lit(1)).as("nt"))
      .crossJoin(broadcast(labels.agg(count(lit(1)).as("np"))))
      .select(lit(1L).as("size"), (col("nt") - col("np")).as("n_clusters"))
      .filter(col("n_clusters") > 0)
    multi.unionByName(singles)
  }

  /** Shingle document-frequency profile — the boilerplate SPECTRUM:
    * for k-token shingles, how many occur in exactly df documents
    * (df = 1 is original text, the heavy-df tail is the template/
    * license mass the substring and passage dedups will cut). The
    * one-histogram summary that says whether running them is worth
    * it, before running them. Returns (df, n_shingles). Scale: one
    * shingle explode + two hash aggregations — the exact shape every
    * dedup pass here already pays. */
  def shingleDfProfile(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    docs.select(col(idCol).as("__id"),
        explode(array_distinct(graft.functions.TextStats.shingles(
          col(textCol), shingleN))).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n_shingles"))

  /** Dedup impact BY SOURCE — who loses what when near-dups drop:
    * duplication is never uniform (template-heavy sources collapse,
    * curated ones barely move), so the post-dedup mixture silently
    * shifts — this report is the before/after per-source count grid
    * with the drop rate, the check run BEFORE trusting any mixture
    * weights computed pre-dedup. Returns
    * (source, n_before, n_after, drop_pct). */
  def dedupSourceImpact(docs: DataFrame, idCol: String, srcCol: String,
      pairs: DataFrame): DataFrame = {
    val before = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_before"))
    val after = dropNearDups(docs, idCol, pairs)
      .groupBy(col(srcCol).as("source")).agg(count(lit(1)).as("n_after"))
    before.join(after, Seq("source"), "left")
      .select(col("source"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        round((col("n_before") - coalesce(col("n_after"), lit(0L)))
          .cast("double") * 100 / col("n_before").cast("double"), 2)
          .as("drop_pct"))
  }

  /** Drop near-duplicates: keep every unpaired doc plus the canonical
    * (min-id) representative of each dup component. */
  def dropNearDups(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val doomed = resolveDupGroups(pairs)
      .filter(col("id") =!= col("rep")).select(col("id").as(idCol))
    docs.join(doomed, Seq(idCol), "left_anti")
  }

  /** Preference-based dedup DROP face: per near-dup component keep the
    * member with the HIGHEST `prefCol` (ties → lowest id) instead of
    * [[dropNearDups]]'s canonical min-id — "keep the best-quality
    * duplicate", the policy production corpus builds actually run
    * (longest text, highest quality score, newest crawl).
    *
    * Same component resolution as [[dropNearDups]]; the per-component
    * argmax routes through the native bounded-heap TopKPerKey (k=1) —
    * one shuffle on the component label, no sort, no window. Singletons
    * (ids in no pair) form their own component and always survive. */
  def keepBestNearDup(docs: DataFrame, idCol: String, pairs: DataFrame,
      prefCol: String): DataFrame = {
    val comp = resolveDupGroups(pairs)
      .select(col("id").as("__cid"), col("rep").as("__rep"))
    val labeled = docs.join(comp, col(idCol) === col("__cid"), "left")
      .withColumn("__grp", coalesce(col("__rep"), col(idCol)))
    graft.plans.TopK.topKPerKey(labeled, Seq(col("__grp")),
        Seq(col(prefCol).desc, col(idCol).asc), 1)
      .drop("__cid", "__rep", "__grp")
  }

  // ---- SimHash ----

  /** 64-bit SimHash over whitespace tokens: bit b of the signature is
    * set iff the sum over tokens of ±1 (by bit b of xxhash64(token))
    * is positive. Backed by the codegen'd
    * [[graft.functions.SimHash64]] kernel — one pass per row. */
  def simHash(text: Column): Column =
    graft.functions.SimHash.simhash64(TextAnalysis.tokens(text))

  /** SimHash near-dup pairs: LSH on 4×16-bit bands of the signature
    * (any identical band → candidate), verified by Hamming distance.
    * @return (id1, id2, hamming) with hamming <= maxHamming */
  def simHashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val banded0 = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("band_idx", "band_val")))
    // bucket-size cap (standard LSH guard): a band value shared by m
    // docs costs m² candidate rows; degenerate buckets (e.g. the
    // all-zero band from empty docs) are dropped before the join.
    // Buckets of 1 can't form a pair, so they're dropped too.
    val ok = banded0.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("__m"))
      .filter(col("__m").between(2, maxBucket)).select("band_idx", "band_val")
    val banded = banded0.join(ok, Seq("band_idx", "band_val"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        col("x.sig").as("sig1"), col("y.sig").as("sig2")).distinct()
    candidates
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  // ---- embedding near-dup ----

  /** Embedding-cosine near-dup pairs, brute force: all pairs with
    * cosine >= threshold. O(n²·d) with the codegen'd cosine kernel —
    * the correctness baseline; [[Similarity.lshBuckets]] is the
    * at-scale path. */
  def embeddingDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = embeddings.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", round(VectorFunctions.cosine(col("v1"), col("v2")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): semantic near-dup
    * pairs found ONLY within k-means clusters of the embedding space.
    * Each vector is assigned to its nearest centroid map-side (the
    * IVF nprobe=1 kernel), and the quadratic cosine comparison runs
    * per cluster — O(Σ cᵢ²) with k chosen so clusters stay bounded
    * (the paper uses k ≈ n/160), instead of O(n²) over the corpus.
    * Pairs crossing cluster boundaries are missed by design; that is
    * the documented recall trade the gate bounds. One shuffle on the
    * cell id; the within-cell join is an equi-join Catalyst plans as
    * a hash join, never a cartesian. */
  def semanticDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], threshold: Double): DataFrame = {
    val cellOf = graft.functions.Centroids.nearestCentroids(col(vecCol), centroids, 1)
    val assigned = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      explode(cellOf).as("cell"))
    assigned.as("x").join(assigned.as("y"),
        col("x.cell") === col("y.cell") && col("x.id") < col("y.id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("x.v"), col("y.v")), 4))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("id1"), col("y.id").as("id2"), col("cos"))
  }

  /** SemDeDup drop face: remove all but one representative per
    * semantic near-dup component (same component resolution as
    * [[dropNearDups]] — min-id representative). */
  def semDeDup(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], threshold: Double): DataFrame =
    dropNearDups(embeddings, idCol,
      semanticDupPairs(embeddings, idCol, vecCol, centroids, threshold))

  /** Embedding near-dup via hyperplane-LSH buckets — the 100 TB path
    * for [[embeddingDupPairs]]: sign-bit signatures map-side, candidate
    * pairs only from band-bucket agreement (bounded per bucket), exact
    * cosine verify on candidates only. Output ⊆ the brute-force result;
    * equality holds whenever every pair ≥ threshold agrees on ≥ 1 band
    * (seed-deterministic — the gate query verifies equality with the
    * brute-force oracle on this corpus). 2-bit bands (nBits/bands = 2)
    * keep single-pair recall ≈ 0.99 at cos ≈ 0.45. */
  def embeddingDupPairsLsh(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, nBits: Int = 16, bands: Int = 8,
      seed: Long = 42L, maxBucket: Int = 100000): DataFrame = {
    val b = Similarity.lshBuckets(embeddings, idCol, vecCol, dim, nBits, bands, seed)
      .select(col("id"), col("band_idx"), col("band_val"))
    val ok = b.groupBy("band_idx", "band_val").agg(count(lit(1)).as("__m"))
      .filter(col("__m").between(2, maxBucket)).select("band_idx", "band_val")
    val pruned = b.join(ok, Seq("band_idx", "band_val"))
    val candidates = pruned.as("x").join(pruned.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2")).distinct()
    val v1 = embeddings.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val v2 = embeddings.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    candidates.join(v1, Seq("id1")).join(v2, Seq("id2"))
      .withColumn("cos", round(VectorFunctions.cosine(col("v1"), col("v2")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Incremental near-dup detection against a PERSISTED corpus index —
    * "dedup the incoming crawl against everything already ingested",
    * the shape a continuously-fed 100 TB pipeline needs (re-running
    * [[minHashDupPairs]] over the full corpus per batch is O(corpus)
    * per batch; this is O(batch + collisions)).
    *
    * State: one store table of (id, minhash signature) — k longs per
    * accepted document, bounded and text-free. Each batch: signatures
    * map-side (fused kernel), LSH band join against the stored index
    * (bands re-derived from signatures, never from text), candidate
    * pairs verified by signature agreement (est-Jaccard = fraction of
    * equal positions, the standard unbiased estimator); novel docs'
    * signatures are appended, detected dups are reported and kept OUT
    * of the index. Within-batch dups are caught the same way (higher
    * id is the dup). At-least-once replays are safe: a replayed doc id
    * already in the index matches itself at est=1.0 and is reported,
    * not re-added. */
  final class IncrementalMinHashDedup(
      spark: org.apache.spark.sql.SparkSession,
      store: graft.store.GraphStore, sigLabel: String = "minhash_sig",
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, seed: Long = 42L) {

    import graft.functions.MinHash

    /** Create the empty signature index if absent. */
    def init(): Unit =
      store.createNodeTable(sigLabel, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sig",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = false))))

    private def banded(df: DataFrame): DataFrame =
      df.select(col("id"), col("sig"),
        posexplode(MinHash.minhashSigBands(col("sig"), bands)).as(Seq("b", "h")))

    private def estJaccard(s1: Column, s2: Column): Column =
      round(aggregate(zip_with(s1, s2, (a, b) => when(a === b, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / k, 4)

    /** One ingest batch. Returns the materialized dup report
      * `(new_id, matched_id, est_jaccard)`; mutates the index. */
    def applyBatch(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
      // cached, not parquet-materialized: the signatures derive only
      // from the caller's input (never from index files), so there is
      // no overwrite-lineage hazard — persist just stops the three
      // consumers (corpus join, in-batch join, novel anti-join) from
      // re-tokenizing the batch
      val sigs = docs.select(col(idCol).cast("long").as("id"),
          TextAnalysis.tokens(col(textCol)).as("toks"))
        .filter(size(col("toks")) >= shingleN)
        .select(col("id"),
          MinHash.minhashTokenSignature(col("toks"), shingleN, k, seed).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nb = banded(sigs)
      val vsCorpus = nb.as("x").join(banded(store.nodes(sigLabel)).as("y"),
          col("x.b") === col("y.b") && col("x.h") === col("y.h"))
        .select(col("x.id").as("new_id"), col("y.id").as("matched_id"),
          col("x.sig").as("s1"), col("y.sig").as("s2"))
      val inBatch = nb.as("x").join(nb.as("y"),
          col("x.b") === col("y.b") && col("x.h") === col("y.h") &&
          col("x.id") > col("y.id"))
        .select(col("x.id").as("new_id"), col("y.id").as("matched_id"),
          col("x.sig").as("s1"), col("y.sig").as("s2"))
      val report = graft.store.GraphStore.materialize(spark,
        vsCorpus.unionByName(inBatch).distinct()
          .withColumn("est_jaccard", estJaccard(col("s1"), col("s2")))
          .filter(col("est_jaccard") >= threshold)
          .select(col("new_id"), col("matched_id"), col("est_jaccard")))
      val novel = sigs.join(
        report.select(col("new_id").as("id")).distinct(), Seq("id"), "left_anti")
      store.writeNodes(sigLabel, store.nodes(sigLabel).unionByName(novel))
      sigs.unpersist(blocking = false)
      report
    }

    /** Streaming face: foreachBatch over an unbounded (id, text)
      * stream; per-batch dup reports go to `onReport`. */
    def sink(stream: DataFrame, idCol: String, textCol: String)(
        checkpointDir: String)(onReport: DataFrame => Unit)
        : org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          onReport(applyBatch(batch, idCol, textCol))
        }
        .start()
  }
}
