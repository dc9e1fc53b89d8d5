package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (driver extension, SURVEY §7 module 6).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact top-k by cosine. The query set is
  *    broadcast, so the big side streams once with a codegen'd cosine
  *    kernel and a per-query top-k window — correct at any corpus
  *    size, O(|corpus|·|queries|·d).
  *  - [[lshTopK]]: random-hyperplane LSH. Sign-bit signatures are
  *    computed map-side against a fixed seeded hyperplane set,
  *    bucketed by signature band; only same-bucket candidates are
  *    scored. At 100 TB this turns the cross product into a
  *    bucket-local join at some recall cost.
  */
object Similarity {

  /** ONE exact Lloyd k-means round by cosine against a broadcast
    * seed set — assignment is argmax over round(cos, 6) with ties to
    * the smallest seed id (packed as one max-of-struct aggregate, no
    * window), then per-cluster mean centroids over the first
    * `outDims` components (4-dp rounded, the q_v2 meanpool
    * convention). The seeds are corpus rows, so each seed lands in
    * its own cluster (cos = 1 with itself). Scale: corpus × k
    * map-side scoring against the broadcast seeds + two hash
    * aggregations — the canonical distributed Lloyd step; iterating
    * it is a driver loop over this function. Returns
    * (cluster, pos, c, n) — one row per cluster per component. */
  def kmeansAssignRound(corpus: DataFrame, seeds: DataFrame, idCol: String,
      vecCol: String, outDims: Int): DataFrame = {
    val sd = seeds.select(col(idCol).as("__seed"), col(vecCol).as("__sv"))
    val assign = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(sd))
      .select(col("__id"), col("__v"),
        struct(round(VectorFunctions.cosine(col("__v"), col("__sv")), 6)
            .as("cos"),
          (-col("__seed")).as("negseed")).as("__sc"))
      .groupBy(col("__id"), col("__v"))
      .agg(max(col("__sc")).as("__best"))
      .select(col("__id"), col("__v"), (-col("__best.negseed")).as("cluster"))
    assign
      .select(col("cluster"),
        posexplode(slice(col("__v"), 1, outDims)).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos").cast("long").as("pos"))
      // + 0.0 canonicalizes IEEE −0.0 (a tiny negative mean rounds to
      // −0.0 in engines that keep the sign — the q_v4 lesson)
      .agg((round(avg(col("x").cast("double")), 4) + lit(0.0)).as("c"),
        count(lit(1)).as("n"))
  }

  /** nDCG@k over a ranked retrieval result: per query,
    *   DCG = Σ rel_i / log2(rank_i + 1),  nDCG = DCG / IDCG,
    * with IDCG the same sum over the query's relevance multiset in
    * ideal (rel-descending) order. Each log-discounted term is
    * rounded to 9 dp and summed in DECIMAL(38,12) (the powerlaw/
    * chiSquare discipline — log2's last-ulp behavior never reaches
    * the sum), so the oracle replays the exact values. Input: one row
    * per (query, candidate) with an integer `rank` (1-based) and a
    * 0/1 `rel`; the ideal ordering comes from one per-query window
    * over ≤k rows. Returns (query_id, n_rel, dcg, idcg, ndcg). */
  def ndcgAtK(results: DataFrame, queryCol: String, rankCol: String,
      relCol: String): DataFrame = {
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(rankCol))
    val terms = results.select(col(queryCol), col(rankCol), col(relCol),
        row_number().over(w).as("__irank"))
      .select(col(queryCol),
        round(col(relCol).cast("double") /
          log2(col(rankCol).cast("double") + 1), 9)
          .cast("decimal(38,12)").as("__t"),
        round(col(relCol).cast("double") /
          log2(col("__irank").cast("double") + 1), 9)
          .cast("decimal(38,12)").as("__it"))
    terms.groupBy(col(queryCol))
      .agg(sum(col("__t")).as("__dcg"), sum(col("__it")).as("__idcg"),
        sum(when(col("__t") > 0, 1L).otherwise(0L)).as("n_rel"))
      .select(col(queryCol), col("n_rel"),
        round(col("__dcg").cast("double"), 6).as("dcg"),
        round(col("__idcg").cast("double"), 6).as("idcg"),
        when(col("__idcg") > 0,
          round(col("__dcg").cast("double") /
            col("__idcg").cast("double"), 6)).as("ndcg"))
  }

  /** MRR@k + hits@k over a ranked retrieval result — the second
    * IR-eval face beside [[ndcgAtK]] (nDCG grades the whole ranking;
    * MRR grades time-to-first-hit, the metric RAG stacks report).
    * Per query: first_rel_rank = min rank with rel=1, rr = 1/that
    * (exact reciprocal of an integer, rounded 6 dp — no summation,
    * so no decimal ladder needed), n_rel = hits within the top-k
    * input. One hash aggregate over ≤k rows per query; NULL rr when
    * the query has no hit (the ndcg null convention). Returns
    * (query_id, n_rel, first_rel_rank, rr). */
  def mrrAtK(results: DataFrame, queryCol: String, rankCol: String,
      relCol: String): DataFrame =
    results.groupBy(col(queryCol))
      .agg(sum(when(col(relCol) > 0, 1L).otherwise(0L)).as("n_rel"),
        min(when(col(relCol) > 0, col(rankCol).cast("long"))).as("first_rel_rank"))
      .select(col(queryCol), col("n_rel"), col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          round(lit(1.0) / col("first_rel_rank").cast("double"), 6)).as("rr"))

  /** Average precision per query — the third IR-eval face beside
    * [[ndcgAtK]] (whole-ranking grade) and [[mrrAtK]] (first-hit
    * grade): AP rewards packing ALL hits early, the metric that
    * averages to MAP across a query set.
    *   AP = (1/R) Σ_{ranks r with rel=1} P@r,   P@r = cum_rel(r)/r
    * with R the query's hit count in the ranked list. The cumulative
    * hit count is one bounded per-query window (≤k rows); each P@r
    * term is an exact small-integer ratio rounded 9 dp and summed in
    * DECIMAL(38,12) (the ndcg ladder discipline), so the oracle
    * replays every value. NULL AP when the query has no hit. Returns
    * (query_id, n_rel, ap). */
  def averagePrecision(results: DataFrame, queryCol: String,
      rankCol: String, relCol: String): DataFrame = {
    val w = Window.partitionBy(col(queryCol)).orderBy(col(rankCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    results
      .withColumn("__cum", sum(col(relCol).cast("long")).over(w))
      .select(col(queryCol), col(relCol),
        when(col(relCol) > 0,
          round(col("__cum").cast("double") / col(rankCol).cast("double"), 9))
          .otherwise(lit(0.0)).cast("decimal(38,12)").as("__p"))
      .groupBy(col(queryCol))
      .agg(sum(when(col(relCol) > 0, 1L).otherwise(0L)).as("n_rel"),
        sum(col("__p")).as("__sp"))
      .select(col(queryCol), col("n_rel"),
        when(col("n_rel") > 0,
          round(col("__sp").cast("double") / col("n_rel").cast("double"), 6))
          .as("ap"))
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Deterministic tie-break on
    * (cos desc, candidate id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c0 = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v"))
    // The |corpus|·|queries| cosine grid is CPU-dense, not byte-dense:
    // scan parallelism follows input SPLITS, so a corpus that fits one
    // split (any gate-scale parquet file) runs the whole grid in ONE
    // task (q_n16 measured 4M cosines / ~5 s on 1 of 32 cores). Spread
    // the probe side to the session's parallelism when the scan gives
    // fewer splits — at scale the corpus already has ≥ cores splits
    // and this is a no-op; results are row-independent scores, so
    // placement cannot change them.
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = if (c0.rdd.getNumPartitions < par) c0.repartition(par) else c0
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(scored, k)
  }

  /** Per-dimension quantization range for [[sqTopK]]: min/max of each
    * dimension over the corpus — one aggregation job, 2·dim floats to
    * the driver (the bounded-smalls convention: PQ codebooks, IVF
    * centroids). Returned as doubles (float→double is exact, so the
    * oracle recomputes identical values). */
  def trainSqRange(corpus: DataFrame, vecCol: String, dim: Int)
      : (Seq[Double], Seq[Double]) = {
    val row = corpus.agg(
      array((1 to dim).map(i => min(element_at(col(vecCol), i))): _*).as("lo"),
      array((1 to dim).map(i => max(element_at(col(vecCol), i))): _*).as("hi"))
      .head()
    (row.getSeq[Float](0).map(_.toDouble), row.getSeq[Float](1).map(_.toDouble))
  }

  /** Quantization-distortion report for the SQ8 path — the QA gate a
    * team runs BEFORE switching retrieval to compressed vectors:
    * per-vector cosine between the original and its
    * quantize→dequantize round trip (the exact [[sqTopK]] chain),
    * aggregated to mean (6-dp values summed in DECIMAL(38,12)) and
    * worst-case min. A min_cos near 1 licenses the 4× compression;
    * one outlier dimension dragging it down is exactly what this
    * surfaces. Returns (n, mean_cos, min_cos). */
  def sqDistortion(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val (lo, hi) = trainSqRange(corpus, vecCol, dim)
    val loC = typedLit(lo)
    val hiC = typedLit(hi)
    def l(i: Column) = element_at(loC, i + 1)
    def h(i: Column) = element_at(hiC, i + 1)
    val codes = transform(col(vecCol), (x, i) =>
      when(h(i) > l(i),
        floor(((x.cast("double") - l(i)) * lit(255.0)) / (h(i) - l(i)) + lit(0.5))
          .cast("long"))
        .otherwise(lit(0L)))
    val deq = transform(codes, (c, i) =>
      (l(i) + (c.cast("double") * (h(i) - l(i))) / lit(255.0)).cast("float"))
    corpus.select(col(vecCol).as("__v"), deq.as("__dv"))
      .select(round(VectorFunctions.cosine(col("__v"), col("__dv")), 6)
        .as("cos"))
      .agg(count(lit(1)).as("n"),
        sum(col("cos").cast("decimal(38,12)")).as("__s"),
        min(col("cos")).as("min_cos"))
      .select(col("n"),
        round(col("__s").cast("double") / col("n").cast("double"), 6)
          .as("mean_cos"), col("min_cos"))
  }

  /** SQ8 scalar-quantized ANN — the simplest vector-compression path
    * (faiss ScalarQuantizer convention): each dimension maps to an
    * 8-bit code on a per-dim [lo, hi] grid (4× smaller than float32,
    * no training beyond min/max), candidates score ASYMMETRICALLY —
    * full-precision query against dequantized corpus. Unlike the PQ
    * gate (bounds), this one is EXACTLY oracle-replayable: the
    * quantize→dequantize arithmetic is fixed-order double math with
    * an explicit floor(x + 0.5) (no round-mode ambiguity), dequantized
    * values round to FLOAT (IEEE nearest-even in both engines), and
    * the scoring reuses the kernel/list_cosine_similarity pair every
    * exact gate already hash-matches.
    *
    * Scale shape: encode is map-side; at 100 TB the corpus is STORED
    * as codes (the 4× read-volume cut is the point) and the ranking
    * tail is the native TopKPerKey heap. Constant dimensions encode
    * to 0 and dequantize to lo exactly. */
  def sqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int): DataFrame = {
    val (lo, hi) = trainSqRange(corpus, vecCol, dim)
    val loC = typedLit(lo)
    val hiC = typedLit(hi)
    def l(i: Column) = element_at(loC, i + 1)
    def h(i: Column) = element_at(hiC, i + 1)
    val codes = transform(col(vecCol), (x, i) =>
      when(h(i) > l(i),
        floor(((x.cast("double") - l(i)) * lit(255.0)) / (h(i) - l(i)) + lit(0.5))
          .cast("long"))
        .otherwise(lit(0L)))
    val deq = transform(codes, (c, i) =>
      (l(i) + (c.cast("double") * (h(i) - l(i))) / lit(255.0)).cast("float"))
    val c = corpus.select(col(idCol).as("cand_id"), deq.as("dv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("dv")), 6))
    rankTopK(scored, k)
  }

  /** Matryoshka funnel retrieval (Kusupati et al. NeurIPS'22 — MRL
    * embeddings are trained so every prefix is itself an embedding):
    * stage 1 scores only the first `dimPrefix` dimensions (dim/d_p×
    * cheaper per candidate — at 100 TB the corpus can even be STORED
    * as the prefix, an automatic dim/d_p compression), keeps
    * k·oversample candidates through the native TopKPerKey heap;
    * stage 2 rescores just those with exact full-dimension cosine.
    * Both stages are deterministic (scores rounded to 6 dp before
    * ranking, ties on candidate id), so the gate oracle replays the
    * whole funnel exactly — including which candidates survive the
    * truncated pass. */
  def funnelTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dimPrefix: Int, k: Int, oversample: Int = 4): DataFrame = {
    require(dimPrefix >= 1 && k >= 1 && oversample >= 1)
    val c = corpus.select(col(idCol).as("cand_id"),
      slice(col(vecCol), 1, dimPrefix).as("tv"))
    val q = queries.select(col(idCol).as("query_id"),
      slice(col(vecCol), 1, dimPrefix).as("qtv"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("tcos", round(VectorFunctions.cosine(col("qtv"), col("tv")), 6))
    val cands = graft.plans.TopK.topKPerKey(scored,
        Seq(col("query_id")), Seq(col("tcos").desc, col("cand_id")), k * oversample)
      .select(col("query_id"), col("cand_id"))
    val rescored = cands
      .join(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v")),
        Seq("cand_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("query_v"))), Seq("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"),
        col("cand_v")), 6))
    rankTopK(rescored, k)
  }

  /** Deterministic Johnson–Lindenstrauss sign projection, d → outDim:
    * proj[j] = (Σ_k v[k]·s(j,k)) / √outDim with s(j,k) ∈ {±1} drawn
    * from an integer hash of (j,k) — the Achlioptas '01 database-
    * friendly variant (signs, not Gaussians), which preserves pairwise
    * cosines to ~1/√outDim and is the standard cheap dimension cut in
    * front of an ANN index. The sign hash must be NONLINEAR in (j,k):
    * any affine-in-k scheme (including multiply-then-mod) makes
    * whole sign-matrix columns repeat at some lag — measured
    * |S^T S| off-diagonals of 16/16 — and the projection collapses;
    * two rounds of squaring mod a prime < 2^26.5 avalanche the parity
    * (measured off-diagonal mean 3.1 ≈ the √(2m/π) ideal) while every
    * intermediate stays < 2^53, so the oracle replays the arithmetic
    * exactly, and the double fold runs in fixed index order (the SQ8
    * replay convention).
    *
    * Pure map-side projection — no shuffle, no state, no trained
    * matrix to ship: the "matrix" is the hash, rematerialized wherever
    * the row is. outDim·d multiply-adds per row; if this ever sits on
    * a 100 TB hot path, the fused-kernel route (ShingleKernel
    * precedent) collapses the outDim HOF folds into one pass. */
  def signProject(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int = 16): DataFrame = {
    require(outDim >= 1, s"outDim must be >= 1: $outDim")
    // the outDim·d sign fold runs as the FloatVecSignProject codegen
    // kernel — bit-identical to the original aggregate(sequence(...))
    // HOF composition (same squared-modular hash, same sequential
    // index-order double fold, same 1/√outDim scale), but a generated
    // primitive loop instead of interpreted ArrayAggregate lambdas
    // (codegen-fallback; ~100M lambda evals for 100k×64→16 at sf0.1).
    // Equivalence vs the HOF form is spec-asserted (SimilaritySpec).
    df.select(col(idCol),
      graft.functions.VectorFunctions.signProject(col(vecCol), outDim)
        .as("proj"))
  }

  /** The original HOF composition of [[signProject]], kept as the
    * equivalence oracle for the codegen kernel (spec-only). */
  private[graft] def signProjectHof(df: DataFrame, idCol: String,
      vecCol: String, outDim: Int = 16): DataFrame = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    def sgn(j: Int, k: Column): Column = {
      val M = lit(94906249L)
      val h0 = (lit(j.toLong * 131L) + k.cast("long") * lit(65537L)) % M
      val h1 = (h0 * h0 + lit(j.toLong * 7919L) + k.cast("long")) % M
      val h2 = (h1 * h1 + lit(12345L)) % M
      when(h2 % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
    }
    val proj = array((0 until outDim).map { j =>
      aggregate(sequence(lit(0), size(col(vecCol)) - 1), lit(0.0),
        (acc, k) => acc + element_at(col(vecCol), k + 1).cast("double")
          * sgn(j, k)) * lit(scale)
    }: _*)
    df.select(col(idCol), proj.as("proj"))
  }

  /** Shared tail of the top-k searches: the native bounded-heap
    * TopKPerKey operator (no per-partition sort), then row_number
    * over the surviving ≤ k rows per query for the rank column. */
  private[ext] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = graft.plans.TopK.topKPerKey(scored,
      Seq(col("query_id")), Seq(col("cos").desc, col("cand_id")), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    topk.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    * SIGIR'98) — the diversity pass RAG retrieval runs after ANN:
    * from each query's top-`m` relevance candidates, greedily keep
    * `k`, each next pick maximizing λ·rel − (1−λ)·max-sim-to-picked,
    * so near-duplicate passages stop crowding out coverage. Scores
    * round to 6 dp and ties break on cand_id, making every greedy
    * draw deterministic; k−1 relational rounds (per round: one
    * equi-join candidates×picked + one max-aggregate + one
    * bounded-heap argmax per query) replay verbatim as an unrolled
    * CTE chain ([[mmrOracleSql]]).
    *
    * Scale shape: the expensive part is the candidate stream (one
    * corpus pass, swap in the IVF/LSH stream at 100 TB); the greedy
    * rounds touch only queries×m rows — candidate work is
    * checkpointed once, never recomputed per round. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, lambda: Double = 0.7): DataFrame = {
    require(m >= k && k >= 1, s"need m >= k >= 1: m=$m k=$k")
    val cands = bruteForceTopK(corpus, queries, idCol, vecCol, m)
      .select(col("query_id"), col("cand_id"), col("cos").as("rel"), col("rank"))
      .join(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v")),
        Seq("cand_id"))
      .localCheckpoint(true)
    var selected = cands.filter(col("rank") === 1)
      .select(col("query_id"), col("cand_id"), col("cand_v"), col("rel"),
        lit(1L).as("pick_rank"))
    var remaining = cands.filter(col("rank") > 1)
      .select(col("query_id"), col("cand_id"), col("cand_v"), col("rel"))
    for (i <- 2 to k) {
      val ms = remaining
        .join(selected.select(col("query_id"), col("cand_v").as("sel_v")),
          Seq("query_id"))
        .withColumn("sim",
          round(VectorFunctions.cosine(col("cand_v"), col("sel_v")), 6))
        .groupBy(col("query_id"), col("cand_id")).agg(max(col("sim")).as("max_sim"))
      val scored = remaining.join(ms, Seq("query_id", "cand_id"))
        .withColumn("mmr", round(lit(lambda) * col("rel") -
          lit(1.0 - lambda) * col("max_sim"), 6))
      // pin each round's (tiny: one row per query) pick: `selected` and
      // `remaining` both consume it AND feed the next round, so the
      // lazy form compounds the plan super-linearly in k — at k=5 the
      // gate spent ~7 s in the OPTIMIZER (wall 10.2 s vs 3.3 s of job
      // time) before this. Identity transform; the greedy draws and
      // their tie-breaks are unchanged. The FINAL round's pick stays
      // lazy and `remaining` is not updated — both are dead after the
      // loop, and the native top-k machinery stays visible in the
      // gate's final plan.
      val pick0 = graft.plans.TopK.topKPerKey(scored, Seq(col("query_id")),
          Seq(col("mmr").desc, col("cand_id")), 1)
        .select(col("query_id"), col("cand_id"), col("cand_v"), col("rel"),
          lit(i.toLong).as("pick_rank"))
      val pick = if (i < k) pick0.localCheckpoint(true) else pick0
      selected = selected.unionByName(pick)
      if (i < k) remaining = remaining.join(
        pick.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_anti")
    }
    selected.select(col("query_id"), col("pick_rank"), col("cand_id"), col("rel"))
  }

  /** The unrolled DuckDB oracle for [[mmrRerank]] over the embeddings
    * table with queries `vec_id < nq`, λ fixed at 0.7 (the 1−λ term
    * is written as an IEEE double subtraction so both engines carry
    * the same 0.30000000000000004). */
  def mmrOracleSql(nq: Int, m: Int, k: Int): String = {
    val lam = "CAST(0.7 AS DOUBLE)"
    val oneMinus = s"(CAST(1.0 AS DOUBLE) - $lam)"
    val sb = new StringBuilder(
      s"""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
          q AS (SELECT * FROM e WHERE vec_id < $nq),
          sc AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   round(list_cosine_similarity(q.v, c.v), 6) AS rel, c.v AS cv
                 FROM e c JOIN q ON c.vec_id <> q.vec_id),
          cand AS MATERIALIZED (SELECT query_id, cand_id, rel, cv FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY rel DESC, cand_id) AS rk FROM sc) WHERE rk <= $m),
          s1 AS (SELECT query_id, cand_id, rel, cv,
                   CAST(1 AS BIGINT) AS pick_rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY rel DESC, cand_id) AS rk FROM cand) WHERE rk = 1),
          r1 AS (SELECT c.* FROM cand c LEFT JOIN s1
                 ON c.query_id = s1.query_id AND c.cand_id = s1.cand_id
                 WHERE s1.cand_id IS NULL)""")
    for (i <- 2 to k) {
      val p = i - 1
      sb.append(s""", p$i AS MATERIALIZED (SELECT query_id, cand_id FROM (
          SELECT r.query_id, r.cand_id, row_number() OVER (
              PARTITION BY r.query_id
              ORDER BY round($lam * r.rel - $oneMinus * ms.ms, 6) DESC,
                r.cand_id) AS pk
          FROM r$p r JOIN (
            SELECT r2.query_id, r2.cand_id,
              max(round(list_cosine_similarity(r2.cv, s.cv), 6)) AS ms
            FROM r$p r2 JOIN s$p s ON r2.query_id = s.query_id
            GROUP BY r2.query_id, r2.cand_id) ms
          ON r.query_id = ms.query_id AND r.cand_id = ms.cand_id)
        WHERE pk = 1)""")
      sb.append(s""", s$i AS MATERIALIZED (SELECT * FROM s$p UNION ALL
        SELECT c.query_id, c.cand_id, c.rel, c.cv, CAST($i AS BIGINT) AS pick_rank
        FROM cand c JOIN p$i USING (query_id, cand_id))""")
      sb.append(s""", r$i AS MATERIALIZED (SELECT r.* FROM r$p r
        LEFT JOIN p$i p ON r.query_id = p.query_id AND r.cand_id = p.cand_id
        WHERE p.cand_id IS NULL)""")
    }
    sb.append(s"""
      SELECT query_id, pick_rank, cand_id, rel FROM s$k
      ORDER BY query_id, pick_rank""")
    sb.toString
  }

  /** One PCA power-iteration step over the (uncentered) second-moment
    * matrix, without ever materializing it: w = Xᵀ(X·v₀) with v₀ the
    * all-ones probe — two corpus passes and d-sized aggregates where
    * the naive C = XᵀX/n is a d² shuffle. The determinism ladder the
    * engine uses everywhere: per-row scores s_i = Σⱼ x_ij round to
    * 6 dp, per-dimension products x_ij·s_i round to 9 dp and sum in
    * DECIMAL(38,12), and the output folds −0.0 (the q_v4 lesson).
    * Reports each dimension's unnormalized w and w/‖w‖ — the leading
    * principal-direction estimate an embedding-health check iterates
    * (anisotropy's dominant direction; see [[isotropy]] for the
    * scalar twin). Returns (pos, w, w_norm), d rows. */
  def powerIterationStep(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val x = corpus.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("__id"), col("pos").cast("long").as("pos"),
        col("v").cast("double").as("v"))
      .localCheckpoint(true)
    val s = x.groupBy(col("__id")).agg(round(sum(col("v")), 6).as("s"))
    val w = x.join(s, Seq("__id"))
      .select(col("pos"),
        round(col("v") * col("s"), 9).cast("decimal(38,12)").as("t"))
      .groupBy(col("pos"))
      .agg((round(sum(col("t")).cast("double"), 6) + lit(0.0)).as("w"))
    val nrm = w.agg(sqrt(sum(col("w") * col("w"))).as("nm"))
    w.crossJoin(broadcast(nrm))
      .select(col("pos"), col("w"),
        when(col("nm") > 0,
          round(col("w") / col("nm"), 6) + lit(0.0)).as("w_norm"))
  }

  /** Recall@{1,5,10} + MRR's n_rel companion over a ranked retrieval
    * — the third IR-eval face beside [[ndcgAtK]] and [[mrrAtK]]:
    * nDCG grades ordering, MRR time-to-first-hit, recall COVERAGE
    * against the full relevant set (which top-k-only metrics can't
    * see — `totals` carries each query's corpus-wide relevant count).
    * hits@k are exact integers off one aggregate; recall@10 is one
    * division rounded 6 dp, NULL when the query has no relevant
    * items at all. Returns
    * (query_id, n_relevant, hits_1, hits_5, hits_10, recall_10). */
  def recallCurve(results: DataFrame, queryCol: String, rankCol: String,
      relCol: String, totals: DataFrame): DataFrame = {
    def hitsAt(k: Int) =
      sum(when(col(rankCol) <= k && col(relCol) > 0, 1L).otherwise(0L))
    results.groupBy(col(queryCol))
      .agg(hitsAt(1).as("hits_1"), hitsAt(5).as("hits_5"),
        hitsAt(10).as("hits_10"))
      .join(broadcast(totals), Seq(queryCol))
      .select(col(queryCol), col("n_relevant"), col("hits_1"),
        col("hits_5"), col("hits_10"),
        when(col("n_relevant") > 0,
          round(col("hits_10").cast("double") /
            col("n_relevant").cast("double"), 6)).as("recall_10"))
  }

  /** Per-group centroid vs the global centroid, by cosine — the
    * embedding-drift monitor: "which source/label is embedded
    * off-distribution?" flags ingestion regressions (a broken encoder
    * on one source) before any model sees the data. Determinism
    * ladder end to end: per-dimension means round 6 dp with −0.0
    * folded (the q_v2 convention), the cosine's dot/norm terms are
    * products of those ROUNDED components rounded 12 dp and summed in
    * DECIMAL(38,18) (order-free), final cosine rounds 6 dp. Shape:
    * one posexplode pass feeds both centroid aggregates; the d-row
    * global centroid broadcast-joins back by position. Returns
    * (grp, n_vecs, cos_to_global). */
  def centroidDrift(corpus: DataFrame, grpCol: String,
      vecCol: String): DataFrame = {
    def mean6(df: DataFrame, keys: Seq[Column], out: String) =
      df.groupBy(keys: _*)
        .agg((round(avg(col("v")), 6) + lit(0.0)).as(out),
          countDistinct(col("__id")).as(s"__n_$out"))
    val x = corpus.select(col(grpCol).as("grp"), col(vecCol).as("__vec"))
      .withColumn("__id", monotonically_increasing_id())
      .select(col("grp"), col("__id"),
        posexplode(col("__vec")).as(Seq("pos", "v")))
      .select(col("grp"), col("__id"), col("pos"), col("v").cast("double").as("v"))
      .localCheckpoint(true)
    val sc = mean6(x, Seq(col("grp"), col("pos")), "c")
    val g = mean6(x, Seq(col("pos")), "gc").select(col("pos"), col("gc"))
    def dterm(c: Column) = round(c, 12).cast("decimal(38,18)")
    sc.join(broadcast(g), Seq("pos"))
      .groupBy(col("grp"))
      .agg(max(col("__n_c")).as("n_vecs"),
        sum(dterm(col("c") * col("gc"))).as("__dot"),
        sum(dterm(col("c") * col("c"))).as("__na"),
        sum(dterm(col("gc") * col("gc"))).as("__nb"))
      .select(col("grp"), col("n_vecs"),
        when(col("__na") > 0 && col("__nb") > 0,
          round(col("__dot").cast("double") /
            (sqrt(col("__na").cast("double")) *
             sqrt(col("__nb").cast("double"))), 6)).as("cos_to_global"))
  }

  /** Energy explained by the dominant direction — the scalar that
    * closes [[powerIterationStep]]'s story: with ŵ the (rounded)
    * unit direction it found, e_rank1 = Σᵢ (xᵢ·ŵ)² against
    * e_total = Σᵢ ‖xᵢ‖². A ratio near 1 means the embeddings have
    * collapsed onto one axis (the anisotropy failure q_v5 scores);
    * near 1/d means healthy spread. Per-row dots/norms round 6 dp
    * (the q_v2 in-row-sum class), squared terms round 9 dp into
    * DECIMAL(38,12). One extra corpus pass over the broadcast
    * d-row direction. Returns (n, e_total, e_rank1, ratio). */
  def rank1Energy(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val w = powerIterationStep(corpus, idCol, vecCol)
      .select(col("pos"), coalesce(col("w_norm"), lit(0.0)).as("wn"))
      .localCheckpoint(true)
    val x = corpus.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("__id"), col("pos").cast("long").as("pos"),
        col("v").cast("double").as("v"))
    val per = x.join(broadcast(w), Seq("pos"))
      .groupBy(col("__id"))
      .agg(round(sum(col("v") * col("wn")), 6).as("dot"),
        round(sum(col("v") * col("v")), 6).as("ssq"))
    per.agg(count(lit(1)).as("n"),
        sum(round(col("dot") * col("dot"), 9).cast("decimal(38,12)"))
          .as("__e1"),
        sum(col("ssq").cast("decimal(38,12)")).as("__et"))
      .select(col("n"),
        round(col("__et").cast("double"), 4).as("e_total"),
        round(col("__e1").cast("double"), 4).as("e_rank1"),
        when(col("__et") > 0, round(col("__e1").cast("double") /
          col("__et").cast("double"), 6)).as("ratio"))
  }

  /** Two-tier retrieval: the cheap [[hammingTopK]] sign scan nominates
    * `m` candidates per query, exact cosine re-scores them, and only
    * the top `k` survive — THE production ANN shape (a compressed
    * first pass over everything, exact math over almost nothing).
    * Both tiers are deterministic given the data, so unlike the
    * seeded-LSH faces the gate replays the result row-for-row: the
    * oracle runs the same hamming-then-cosine cascade in SQL. Ties
    * break (hamming asc, cand_id) then (cos desc, cand_id). Returns
    * (query_id, rank, cand_id, cos). */
  def tieredRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, dim: Int = 64): DataFrame = {
    require(m >= k && k >= 1, s"need m >= k >= 1: m=$m k=$k")
    val cands = hammingTopK(corpus, queries, idCol, vecCol, m, dim)
      .select(col("query_id"), col("cand_id"))
    val rescored = cands
      .join(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v")),
        Seq("cand_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("query_v"))), Seq("query_id"))
      .withColumn("cos",
        round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(rescored, k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cos"))
  }

  /** Mutual-kNN graph statistics — the symmetry audit of a kNN graph
    * before density clustering builds on it (mutual edges are the
    * reliable ones; a point whose neighbors don't reciprocate is
    * likely a hub artifact of high-dimensional space): over the
    * exact top-k of EVERY point, count directed edges, mutual pairs
    * (b ∈ knn(a) ∧ a ∈ knn(b) — one self-join on the swapped key),
    * and the mutuality ratio 2·mutual/directed. Fully deterministic,
    * exact-oracle. Returns (n_nodes, n_directed, n_mutual,
    * mutuality). */
  def mutualKnnStats(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    mutualKnnStatsFromEdges(bruteForceTopK(corpus, corpus, idCol, vecCol, k))

  /** The scale face of [[mutualKnnStats]]: the audit itself over a
    * PREBUILT kNN edge set — (query_id, cand_id) from any builder
    * ([[knnGraph]] at scale, [[bruteForceTopK]] as the exact oracle
    * baseline). The self-join on the swapped key and the two count
    * combines are shuffle-on-pair only; nothing here broadcasts the
    * corpus. */
  def mutualKnnStatsFromEdges(edges: DataFrame): DataFrame = {
    val knn = edges
      .select(col("query_id").as("a"), col("cand_id").as("b"))
      .localCheckpoint(true)
    val mutual = knn
      .join(knn.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"))
      .filter(col("a") < col("b"))
    knn.agg(countDistinct(col("a")).as("n_nodes"),
        count(lit(1)).as("n_directed"))
      .crossJoin(broadcast(mutual.agg(count(lit(1)).as("n_mutual"))))
      .select(col("n_nodes"), col("n_directed"), col("n_mutual"),
        round(col("n_mutual").cast("double") * 2 /
          col("n_directed").cast("double"), 6).as("mutuality"))
  }

  /** kNN-GRAPH builder — every point is a query against the whole
    * corpus, the primitive semdedup / mutual-kNN audits / density
    * clustering build on. The scale problem is that the exact form
    * is O(n²); this composes the existing ANN machinery so the graph
    * costs what one ANN batch costs:
    *
    *  - `via = "ivf"`: corpus assigns map-side to its nearest
    *    trained centroid cell; the SAME corpus as the query side
    *    probes its `nprobe` nearest cells; candidates come from the
    *    cell equi-join (shuffle-partitioned on cell id — at 100 TB
    *    the index is bucketed at rest on cell and the join is
    *    co-located, each point scoring ~nprobe/nCells of the corpus,
    *    never all of it).
    *  - `via = "lsh"`: seeded hyperplane signatures, band equi-join
    *    with Hamming-1 multi-probe on the query side — no training
    *    step, the right pick when the corpus churns faster than
    *    centroids stay fresh. Band width AUTO-SCALES with corpus
    *    size (`nBits = 0`): bits-per-band ≈ log2(n/64), so bucket
    *    occupancy — and with it the band join's candidate count —
    *    stays ~constant per point as the corpus grows. Fixed bits
    *    would go quadratic (the round-7 sf1 sweep measured exactly
    *    that: 4-bit bands at 40× the calibration corpus ≈ n²/16
    *    collisions per band).
    *  - `via = "brute"`: the exact O(n²) baseline (query side
    *    broadcast) — the RECALL ORACLE at gate scale; never the
    *    production path.
    *
    * Neither ANN path broadcasts the corpus (plan-asserted in
    * SimilarityMoreSpec); both end in the native bounded-heap
    * TopKPerKey. Returns (query_id, cand_id, cos, rank) — k rows per
    * point (fewer only if the ANN candidates run dry). */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      via: String = "ivf", dim: Int = 64, nCells: Int = 16,
      nprobe: Int = 2, nBits: Int = 0, bands: Int = 4,
      seed: Long = 42L, knownN: Long = -1L): DataFrame = via match {
    case "ivf" =>
      val centroids = trainIvfCentroids(corpus, vecCol, k = nCells,
        seed = seed)
      ivfTopK(corpus, corpus, idCol, vecCol, centroids, k, nprobe)
    case "lsh" =>
      val nb = if (nBits > 0) nBits else {
        // auto-sizing needs n; pass knownN (or nBits directly) to
        // skip this extra corpus-count job on repeated builds
        val n = if (knownN >= 0) knownN else corpus.count()
        AnnGeometry.lshBits(n, bands)
      }
      lshTopK(corpus, corpus, idCol, vecCol, dim, k, nb, bands, seed,
        multiProbe = true)
    case "nnd" =>
      // NN-descent: a cheap LINEAR seed (single-probe LSH — candidate
      // volume ~N·occupancy·bands, no query-side fan-out) refined by
      // bounded neighbor-of-neighbor rounds. This is the scale-out
      // answer to the IVF face's designed Θ(N^1.5 log N): seed + R
      // refinement rounds cost O(N·(occupancy·bands + R·k²)) — linear
      // in N at fixed k. The graph builds at degree 3k and truncates
      // to k at the end: the wider working frontier is what carries
      // true neighbors through rounds — on the uniform synthetic
      // corpus (the ANN worst case) measured recall@5 at n=2000 is
      // 0.50 at buildK=2k/2 rounds vs 0.72 at buildK=3k/3 rounds,
      // for a bounded ~(3/2)²·(3/2) pair-volume constant. Candidate
      // volume stays N·C(2·3k,2)·rounds ≈ 1350·N at k=5 — LINEAR,
      // where the IVF face pays Θ(N^1.5 log N).
      val nb = if (nBits > 0) nBits else {
        val n = if (knownN >= 0) knownN else corpus.count()
        AnnGeometry.lshBits(n, bands)
      }
      val buildK = 3 * k
      val seedEdges = lshTopK(corpus, corpus, idCol, vecCol, dim, buildK,
        nb, bands, seed, multiProbe = false)
      nnDescent(corpus, idCol, vecCol, buildK, seedEdges, rounds = 3)
        .filter(col("rank") <= k)
    case "brute" =>
      bruteForceTopK(corpus, corpus, idCol, vecCol, k)
    case other =>
      throw new IllegalArgumentException(
        s"via must be ivf|lsh|brute|nnd: $other")
  }

  /** NN-descent kNN-graph refinement (Dong, Moses & Li, WWW '11 —
    * the standard scale-out kNN-graph recipe): starting from ANY
    * approximate kNN edge set, each round proposes every pair of
    * nodes that share a "general neighbor" (forward ∪ reverse
    * adjacency) as candidates, scores them exactly, and keeps each
    * node's best k. Converges because a node's true neighbors are
    * overwhelmingly neighbors-of-its-current-neighbors.
    *
    * Scale shape (the round-11 candidate-stream rule applied by
    * construction):
    *  - the reverse adjacency is capped at k per node (the paper's
    *    reverse sampling), so every node's general-neighbor list is
    *    ≤ 2k — candidate volume is N·C(2k,2) ≈ 2k²N per round,
    *    BOUNDED, independent of hub in-degree or bucket skew;
    *  - vectors ride only the bounded adjacency stream (≤ 2kN rows:
    *    one equi-join attaches the dst vector), and the pair join on
    *    the shared CENTER scores the cosine in the join's own stage —
    *    the pair stream leaves it as (ids, cos), 32 B/row;
    *  - pair dedup is a max-aggregate over identical 6-dp values
    *    (bit-identical to dedup-then-score), then the native
    *    bounded-heap TopKPerKey keeps k per node;
    *  - one localCheckpoint per round pins the frontier, so lineage
    *    (and replanning) stays O(1) per round, not O(rounds).
    *
    * Returns (query_id, cand_id, cos, rank) like every other face.
    * Deterministic given a deterministic seed: cosines round to 6 dp
    * and all ties break on ids. */
  def nnDescent(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val vec = corpus.select(col(idCol).as("dst"), col(vecCol).as("__dv"))
    var edges = seed.select(col("query_id"), col("cand_id"), col("cos"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val fwd = edges.select(col("query_id").as("src"),
        col("cand_id").as("dst"), col("cos"))
      // reverse adjacency capped at k per node — the bound that keeps
      // a hub (a node half the corpus lists as neighbor) from minting
      // indeg² candidate pairs
      val rev = graft.plans.TopK.topKPerKey(
        edges.select(col("cand_id").as("src"),
          col("query_id").as("dst"), col("cos")),
        Seq(col("src")), Seq(col("cos").desc, col("dst")), k)
      val adj = fwd.select(col("src"), col("dst"))
        .unionByName(rev.select(col("src"), col("dst"))).distinct()
      val adjV = adj.join(vec, Seq("dst"))
      // all pairs among each center's ≤2k neighbors, scored AT the
      // join (both vectors in-flight), projected to (ids, cos) before
      // anything else shuffles
      val pairs = adjV.as("x").join(adjV.as("y"),
          col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
        .select(col("x.dst").as("query_id"), col("y.dst").as("cand_id"),
          round(VectorFunctions.cosine(col("x.__dv"), col("y.__dv")), 6)
            .as("cos"))
      val proposals = pairs.unionByName(
        pairs.select(col("cand_id").as("query_id"),
          col("query_id").as("cand_id"), col("cos")))
      edges = graft.plans.TopK.topKPerKey(
        edges.unionByName(proposals)
          .groupBy(col("query_id"), col("cand_id"))
          .agg(max(col("cos")).as("cos")),
        Seq(col("query_id")), Seq(col("cos").desc, col("cand_id")), k)
        .localCheckpoint(true)
      r += 1
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    edges.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** kNN-distance outlier scores (the LOF shape of Breunig '00,
    * simplified to the ratio form distributed systems actually ship):
    * per point, the mean cosine DISTANCE (1 − cos) to its k nearest
    * neighbors, divided by the mean of its NEIGHBORS' own mean
    * distances — a point in a dense region scores ≈ 1, an isolated
    * point ≫ 1. This is the embedding-space "what doesn't belong"
    * audit run before trusting retrieval or clustering on a new
    * corpus, and the reason [[knnGraph]] exists as a primitive:
    * score any prebuilt edge set (brute at gate scale = the exact
    * oracle; IVF/LSH edges at 100 TB — same code path).
    *
    * Exactness: cos is 6-dp rounded upstream, per-point sums ride
    * DECIMAL(38,12), each mean is one division rounded 9 dp, the
    * final ratio one division rounded 6 dp. Two hash aggregations +
    * one self-join on the neighbor key — shuffle-on-id only.
    * Returns (node, avg_d, neigh_avg_d, lof). */
  def knnOutlierScores(edges: DataFrame): DataFrame = {
    val per = edges.select(col("query_id").as("node"),
        (lit(1.0) - col("cos")).cast("decimal(38,12)").as("__d"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("__k"), sum(col("__d")).as("__s"))
      .select(col("node"),
        round(col("__s").cast("double") / col("__k").cast("double"), 9)
          .as("avg_d"))
      .localCheckpoint(true)
    val neigh = edges.select(col("query_id").as("node"),
        col("cand_id").as("nb"))
      .join(per.select(col("node").as("nb"), col("avg_d").as("__nd")),
        Seq("nb"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("__k"),
        sum(col("__nd").cast("decimal(38,12)")).as("__s"))
      .select(col("node"),
        round(col("__s").cast("double") / col("__k").cast("double"), 9)
          .as("neigh_avg_d"))
    per.join(neigh, Seq("node"))
      .select(col("node"), col("avg_d"), col("neigh_avg_d"),
        when(col("neigh_avg_d") === 0.0,
          when(col("avg_d") === 0.0, 1.0).otherwise(lit(null).cast("double")))
          .otherwise(round(col("avg_d") / col("neigh_avg_d"), 6))
          .as("lof"))
  }

  /** Sign-bit packing for [[hammingTopK]]: dimension i contributes
    * bit i (set iff vec[i] ≥ 0), folded into ONE BIGINT with a
    * lambda-aggregate over `sequence(0, dim−1)` — pure codegen-able
    * Column, no UDF. dim ≤ 64 (one word); production-width vectors
    * (384–1024-d) use [[signPackWords]]. */
  def signPack(vecCol: String, dim: Int): Column = {
    require(dim >= 1 && dim <= 64, s"one 64-bit word packs <= 64 dims: $dim")
    expr(s"aggregate(sequence(0, ${dim - 1}), CAST(0 AS BIGINT), " +
      s"(acc, i) -> acc | IF(element_at(`$vecCol`, i + 1) >= 0D, " +
      "shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))")
  }

  /** Multi-word sign packing — [[signPack]] generalized past 64 dims:
    * ⌈dim/64⌉ BIGINT words, word w carrying dims [64w, 64w+63] in the
    * same bit layout as the single-word form (word 0 of a ≤64-d pack
    * is bit-identical to [[signPack]]). Still a pure codegen-able
    * Column — transform over the word index, lambda-aggregate per
    * word — so a 1024-d embedding compresses to 16 longs with no
    * UDF. */
  def signPackWords(vecCol: String, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    val nWords = (dim + 63) / 64
    expr(s"transform(sequence(0, ${nWords - 1}), w -> " +
      s"aggregate(sequence(w * 64, least(w * 64 + 63, ${dim - 1})), " +
      s"CAST(0 AS BIGINT), " +
      s"(acc, i) -> acc | IF(element_at(`$vecCol`, i + 1) >= 0D, " +
      "shiftleft(CAST(1 AS BIGINT), i - w * 64), CAST(0 AS BIGINT))))")
  }

  /** Hamming distance between two same-length sign-word arrays:
    * XOR + popcount folded over the words — the array form of
    * `bit_count(a XOR b)`. */
  def hammingWords(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, h) => acc + h)

  /** 1-bit sign-quantization ANN (binary hashing à la Charikar '02's
    * hyperplane LSH with the identity projections): each vector
    * compresses 256× to a single 64-bit sign word, similarity is
    * Hamming distance = `bit_count(a XOR b)` — one XOR + popcount per
    * pair, the cheapest candidate scorer there is. Exact and fully
    * deterministic given the signs, so the gate replays it bit-for-
    * bit (unlike the seeded-projection LSH face `q_n2`). At 100 TB
    * the corpus rides as (id, one long) — ⌈dim/64⌉ longs past 64
    * dims via [[signPackWords]], so production-width 384–1024-d
    * embeddings still compress 32× — the packed scan is what a
    * re-rank pipeline feeds its exact-scoring tail. Top-k per query
    * by (hamming asc, cand_id). Returns
    * (query_id, rank, cand_id, hamming). */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int = 64): DataFrame = {
    val pack: String => Column =
      if (dim <= 64) signPack(_, dim) else signPackWords(_, dim)
    val c = corpus.select(col(idCol).as("cand_id"),
      pack(vecCol).as("cand_sig"))
    val q = queries.select(col(idCol).as("query_id"),
      pack(vecCol).as("query_sig"))
    val dist: Column =
      if (dim <= 64)
        bit_count(col("cand_sig").bitwiseXOR(col("query_sig"))).cast("long")
      else hammingWords(col("cand_sig"), col("query_sig"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("hamming", dist)
    val topk = graft.plans.TopK.topKPerKey(scored, Seq(col("query_id")),
      Seq(col("hamming").asc, col("cand_id")), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("cand_id"))
    topk.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("hamming"))
  }

  /** Greedy k-center selection (farthest-point traversal, Gonzalez
    * '85 — the 2-approximation for the k-center objective): starting
    * from a seed, repeatedly pick the item FARTHEST from everything
    * selected so far — under cosine, the item whose max similarity to
    * the selected set is smallest (tie → smallest id). The classic
    * coreset/diverse-sample selector: k probes that cover the corpus,
    * where top-k-by-similarity would return k near-duplicates.
    *
    * Each of the k−1 rounds is one broadcast of the ≤k selected
    * vectors against the remaining corpus + one hash aggregate + a
    * 1-row TakeOrderedAndProject — no driver-side vectors, no
    * quadratic pass; the corpus is scanned k−1 times and never
    * shuffled on anything but the bounded argmin. Returns
    * (pick_rank, vec_id, maxsim) with maxsim the pick's max cosine
    * to the previously selected set (NULL for the seed) — the
    * monotone coverage-radius trace. */
  def kcenterSelect(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, seedId: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val base = corpus.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("v")).localCheckpoint(true)
    var selected = base.filter(col("vec_id") === seedId)
      .select(col("vec_id"), col("v"), lit(1L).as("pick_rank"),
        lit(null).cast("double").as("maxsim"))
    var remaining = base.filter(col("vec_id") =!= seedId)
    for (i <- 2 to k) {
      val ms = remaining.crossJoin(broadcast(
          selected.select(col("v").as("sel_v"))))
        .withColumn("sim",
          round(VectorFunctions.cosine(col("v"), col("sel_v")), 6))
        .groupBy(col("vec_id")).agg(max(col("sim")).as("ms"))
      // pin the single-row pick (same fix as mmrRerank): it feeds the
      // broadcast `selected` union AND the anti-joined `remaining`, so
      // the lazy form compounded each round's max-sim scan into every
      // later round's plan (identity transform). The FINAL round's
      // pick stays lazy and `remaining` is not updated — both are dead
      // after the loop, and the bounded top-k machinery stays visible
      // in the gate's final plan.
      val pick0 = remaining.join(ms, Seq("vec_id"))
        .orderBy(col("ms").asc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("v"), lit(i.toLong).as("pick_rank"),
          col("ms").as("maxsim"))
      val pick = if (i < k) pick0.localCheckpoint(true) else pick0
      selected = selected.unionByName(pick)
      if (i < k) remaining = remaining.join(pick.select(col("vec_id")),
        Seq("vec_id"), "left_anti")
    }
    selected.select(col("pick_rank"), col("vec_id"), col("maxsim"))
  }

  /** The unrolled DuckDB oracle for [[kcenterSelect]] over the
    * embeddings table (seed `seedId`, k picks) — the mmrOracleSql
    * convention: one materialized CTE trio per greedy round. */
  def kcenterOracleSql(k: Int, seedId: Long): String = {
    val sb = new StringBuilder(
      s"""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
          s1 AS (SELECT vec_id, v, CAST(1 AS BIGINT) AS pick_rank,
                   CAST(NULL AS DOUBLE) AS maxsim
                 FROM e WHERE vec_id = $seedId),
          r1 AS (SELECT * FROM e WHERE vec_id <> $seedId)""")
    for (i <- 2 to k) {
      val p = i - 1
      sb.append(s""", p$i AS MATERIALIZED (SELECT vec_id, ms FROM (
          SELECT r.vec_id, ms.ms, row_number() OVER (
              ORDER BY ms.ms ASC, r.vec_id) AS pk
          FROM r$p r JOIN (
            SELECT r2.vec_id,
              max(round(list_cosine_similarity(r2.v, s.v), 6)) AS ms
            FROM r$p r2, s$p s GROUP BY r2.vec_id) ms
          ON r.vec_id = ms.vec_id) WHERE pk = 1)""")
      sb.append(s""", s$i AS MATERIALIZED (SELECT * FROM s$p UNION ALL
        SELECT e.vec_id, e.v, CAST($i AS BIGINT) AS pick_rank, p$i.ms AS maxsim
        FROM e JOIN p$i USING (vec_id))""")
      sb.append(s""", r$i AS MATERIALIZED (SELECT r.* FROM r$p r
        LEFT JOIN p$i p ON r.vec_id = p.vec_id WHERE p.vec_id IS NULL)""")
    }
    sb.append(s"""
      SELECT pick_rank, vec_id, maxsim FROM s$k ORDER BY pick_rank""")
    sb.toString
  }

  /** Hard-negative mining — the contrastive-training-pair constructor
    * (DPR / Karpukhin et al. 2020 shape): for each query, the k most
    * similar corpus items that are NOT its labeled positives. These
    * near-miss negatives are what retrieval fine-tuning actually
    * trains on; random negatives are too easy.
    *
    * `positives` carries (query_id, pos_id). Exclusion is a left-anti
    * join BEFORE ranking, so every query gets exactly k negatives
    * (when the corpus has them) regardless of its positive count.
    * Same scale shape as [[bruteForceTopK]]: broadcast query set, one
    * corpus pass, native bounded-heap top-k — swap the scored source
    * for the IVF/LSH candidate stream when the corpus is 100 TB. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      positives: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .join(positives.select(col("query_id"), col("pos_id").as("cand_id")),
        Seq("query_id", "cand_id"), "left_anti")
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(scored, k)
  }

  /** Reciprocal-rank fusion (Cormack & Clarke SIGIR'09) — the standard
    * hybrid-retrieval combiner: each input list (id, score) is ranked
    * by (score desc, id), and an id's fused score is
    * Σ_lists 1/(kConst + rank). Ids missing from a list simply don't
    * collect that list's term, so lexical (BM25) and semantic (cosine)
    * candidate lists of different sizes fuse directly.
    *
    * Scale note: inputs are top-k candidate LISTS (bounded by
    * construction — the output of bm25/topK searches), so the
    * unpartitioned ranking window runs over k rows per list, not the
    * corpus. Fusing corpus-sized lists would need a partitioned rank;
    * that is not this operator's contract. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, scoreCol: String,
      kConst: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    val ranked = lists.map { df =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol), row_number().over(w).cast("long").as("__rank"))
    }
    ranked.reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(round(sum(lit(1.0) / (col("__rank") + lit(kConst))), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
  }

  /** Sign-bit LSH signature of a float vector: bit j = sign of
    * dot(v, hyperplane_j), packed into a long (nBits <= 63).
    * Hyperplanes are seeded-deterministic; the codegen'd
    * [[graft.functions.HyperplaneSig]] kernel computes all bits in one
    * pass (the per-bit HOF formulation was interpreted and duplicated
    * by projection collapse). */
  def lshSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column =
    graft.functions.Hyperplane.hyperplaneSig(vec, dim, nBits, seed)

  /** Bucket assignment for the scale path: corpus partitioned by LSH
    * signature bands. Two vectors agreeing on any band land in a
    * shared bucket. Returns (id, band_idx, band_val). */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    val bitsPerBand = nBits / bands
    val mask = (1L << bitsPerBand) - 1
    val sig = lshSignature(col(vecCol), dim, nBits, seed)
    df.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("sig"))
      .select(col("id"), col("v"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)): _*))
          .as(Seq("band_idx", "band_val")))
  }

  /** Train IVF centroids: deterministic (seeded) k-means over a
    * sample of the corpus. Centroids come back to the driver — they
    * are k × dim floats, tiny by construction — and get baked into
    * the assignment expression. */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String, k: Int,
      seed: Long = 42L, sampleFraction: Double = 1.0): Array[Array[Float]] = {
    val sample = if (sampleFraction < 1.0)
      corpus.sample(withReplacement = false, sampleFraction, seed) else corpus
    val feats = sample.select(
      org.apache.spark.ml.functions.array_to_vector(
        col(vecCol).cast("array<double>")).as("features"))
    // maxIter 10: IVF cells only need a stable, roughly balanced
    // partition of the space — k-means convergence past ~10 rounds
    // moves recall by noise while doubling training jobs.
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(10).fit(feats)
    model.clusterCenters.map(_.toArray.map(_.toFloat))
  }

  /** IVF-style ANN top-k: corpus vectors are assigned to their
    * nearest centroid (nprobe=1) map-side; each query probes its
    * `nprobe` nearest cells and scores only vectors in those cells.
    * The inverted index is just a DataFrame keyed by cell id —
    * shuffle-partitioned (or bucketed at rest) by cell, so a query
    * touches nprobe/k of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Float]], k: Int,
      nprobe: Int = 2): DataFrame = {
    val cellOf = graft.functions.Centroids.nearestCentroids(col(vecCol), centroids, 1)
    val probeCells = graft.functions.Centroids.nearestCentroids(col(vecCol), centroids, nprobe)
    val indexed = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v"),
      explode(cellOf).as("cell"))
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"),
      explode(probeCells).as("cell"))
    // each candidate lives in exactly one cell (nprobe=1 assignment),
    // so a (query, cand) pair matches at most once — no dedup needed
    val scored = indexed.join(probed, Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(scored, k)
  }

  /** Train product-quantization codebooks: seeded Lloyd k-means per
    * subspace over a BOUNDED sample of the corpus (default 16384
    * vectors — the faiss convention: codebooks are tiny model
    * parameters and converge on a sample; training never needs the
    * full 100 TB corpus). The sample collects once (≤ 16384 × dim
    * floats, a few MB by construction) and all m subspaces train
    * locally in one pass — m separate distributed KMeans fits were a
    * ~100-job storm that cost 10× the search itself. Returns the
    * codebooks flattened row-major (`[subspace][centroid][dim]`),
    * baked into the encode/score kernels like the IVF centroids.
    * Deterministic: content-hash-ordered sample (layout-independent —
    * a bare limit() takes whatever partitions scan first, so the
    * codebooks would drift across cluster layouts), seeded init,
    * index-order folds. The order-by-hash + limit plans as
    * TakeOrderedAndProject (per-partition top-k, driver merge), not a
    * global sort, so the bounded collect stays scale-safe. */
  def trainPqCodebooks(corpus: DataFrame, vecCol: String, dim: Int,
      m: Int, k: Int, seed: Long = 42L,
      maxTrain: Int = 16384): Array[Double] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val rows = corpus.select(col(vecCol).cast("array<double>").as("v"))
      .withColumn("__key", col("v").cast("string"))
      .orderBy(xxhash64(col("__key"), lit(seed)), col("__key"))
      .limit(maxTrain).select(col("v")).collect()
    val n = rows.length
    require(n > 0, "empty training set")
    val data = Array.tabulate(n) { r =>
      rows(r).getSeq[Double](0).toArray }
    val rnd = new scala.util.Random(seed)
    val out = new Array[Double](m * k * dsub)
    var j = 0
    while (j < m) {
      val off = j * dsub
      // seeded distinct-index init (k-means++ refinement moves recall
      // by noise here; subspaces are low-dim)
      val centers = Array.ofDim[Double](k, dsub)
      val picked = new java.util.HashSet[Int]()
      var c = 0
      while (c < k) {
        var idx = rnd.nextInt(n)
        var tries = 0
        while (picked.contains(idx) && tries < 4 * k) { idx = rnd.nextInt(n); tries += 1 }
        picked.add(idx)
        System.arraycopy(data(idx), off, centers(c), 0, dsub)
        c += 1
      }
      var iter = 0
      while (iter < 10) {
        val sums = Array.ofDim[Double](k, dsub)
        val counts = new Array[Int](k)
        var r = 0
        while (r < n) {
          val v = data(r)
          var best = 0
          var bestD = Double.MaxValue
          var cc = 0
          while (cc < k) {
            var dist = 0.0
            var i = 0
            while (i < dsub) {
              val diff = v(off + i) - centers(cc)(i); dist += diff * diff; i += 1 }
            if (dist < bestD) { bestD = dist; best = cc }
            cc += 1
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += v(off + i); i += 1 }
          r += 1
        }
        var cc = 0
        while (cc < k) {
          if (counts(cc) > 0) {
            var i = 0
            while (i < dsub) { centers(cc)(i) = sums(cc)(i) / counts(cc); i += 1 }
          } // empty cluster keeps its previous center
          cc += 1
        }
        iter += 1
      }
      c = 0
      while (c < k) {
        System.arraycopy(centers(c), 0, out, j * k * dsub + c * dsub, dsub)
        c += 1
      }
      j += 1
    }
    out
  }

  /** PQ-compressed ANN top-k (the memory-bound 100 TB path):
    *
    *  1. corpus encodes map-side to m small ints per vector
    *     ([[graft.functions.PqEncode]]) — the scan that feeds the
    *     search reads 8·4 B codes instead of d·4 B floats, an 8×
    *     (dim 64, m 8) reduction of the data actually streamed;
    *  2. each query precomputes its ADC lookup table once on the
    *     broadcast side ([[graft.functions.PqAdcTable]]), so scoring a
    *     candidate is m table lookups ([[graft.functions.PqTableScore]]),
    *     not an O(d) float loop;
    *  3. the native bounded-heap TopKPerKey keeps `k·oversample`
    *     approximate candidates per query, and only those join back to
    *     the raw vectors for an exact-cosine refine — point lookups,
    *     not a second corpus scan.
    *
    * Approximate (quantization error bounds recall); the gate and spec
    * measure recall against [[bruteForceTopK]]. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, kCentroids: Int,
      codebooks: Array[Double], k: Int, oversample: Int = 4): DataFrame = {
    val dsub = dim / m
    val norm2 = graft.functions.PqKernel.centroidNorm2(codebooks, m, dsub, kCentroids)
    val codes = corpus.select(col(idCol).as("cand_id"),
      graft.functions.Pq.pqEncode(col(vecCol), codebooks, m, dsub, kCentroids).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"),
      graft.functions.Pq.pqAdcTable(col(vecCol), codebooks, m, dsub, kCentroids).as("adc"))
    val scored = codes.join(broadcast(q.select(col("query_id"), col("adc"))),
        col("cand_id") =!= col("query_id"))
      .withColumn("pq_score",
        graft.functions.Pq.pqTableScore(col("adc"), col("codes"), norm2, kCentroids))
    val cands = graft.plans.TopK.topKPerKey(scored,
        Seq(col("query_id")), Seq(col("pq_score").desc, col("cand_id")), k * oversample)
      .select(col("query_id"), col("cand_id"))
    val rescored = cands
      .join(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v")), Seq("cand_id"))
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v")), Seq("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(rescored, k)
  }

  /** IVF-PQ composed ANN (the faiss IVFPQ shape, which is what
    * actually ships at billion-vector scale — IVF bounds WHICH
    * vectors a query touches, PQ bounds the BYTES each touched
    * vector costs):
    *
    *  1. corpus assigns map-side to its nearest centroid cell AND
    *     encodes to m small ints — the resting index is
    *     (cell, id, m codes), bucketable on cell, 8× narrower than
    *     raw floats;
    *  2. each query probes its `nprobe` nearest cells with its
    *     precomputed ADC table; candidates come from the cell
    *     equi-join, scored by m table lookups;
    *  3. the `k·oversample` PQ survivors join back to raw vectors
    *     for the exact-cosine refine (point lookups).
    *
    * This encodes RAW vectors, not per-cell residuals (classic
    * IVFADC subtracts the cell centroid first; that needs per-cell
    * ADC tables — m·k·nprobe entries per query — for a recall gain
    * that is minor at these dims, so the shared [[pqTopK]] kernels
    * are reused unchanged). Both approximations stack, so recall
    * sits below either alone; the gate and spec measure it against
    * [[bruteForceTopK]]. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Float]], dim: Int, m: Int,
      kCentroids: Int, codebooks: Array[Double], k: Int, nprobe: Int = 2,
      oversample: Int = 8): DataFrame = {
    val dsub = dim / m
    val norm2 = graft.functions.PqKernel.centroidNorm2(codebooks, m, dsub, kCentroids)
    val cellOf = graft.functions.Centroids.nearestCentroids(col(vecCol), centroids, 1)
    val probeCells = graft.functions.Centroids.nearestCentroids(col(vecCol), centroids, nprobe)
    val codes = corpus.select(col(idCol).as("cand_id"),
      explode(cellOf).as("cell"),
      graft.functions.Pq.pqEncode(col(vecCol), codebooks, m, dsub, kCentroids).as("codes"))
    val q = queries.select(col(idCol).as("query_id"),
      explode(probeCells).as("cell"),
      graft.functions.Pq.pqAdcTable(col(vecCol), codebooks, m, dsub, kCentroids).as("adc"))
    // candidate lives in exactly one cell, so pairs are already unique
    val scored = codes.join(q, Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("pq_score",
        graft.functions.Pq.pqTableScore(col("adc"), col("codes"), norm2, kCentroids))
    val cands = graft.plans.TopK.topKPerKey(scored,
        Seq(col("query_id")), Seq(col("pq_score").desc, col("cand_id")), k * oversample)
      .select(col("query_id"), col("cand_id"))
    val rescored = cands
      .join(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v")), Seq("cand_id"))
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v")), Seq("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(rescored, k)
  }

  /** ANN top-k via LSH buckets: score only same-bucket candidates,
    * then per-query top-k. Approximate — recall depends on nBits /
    * bands; the ScalaTest suite measures it against brute force.
    *
    * `multiProbe` (Lv et al., "Multi-Probe LSH", VLDB 2007): each
    * QUERY additionally probes every bucket at Hamming distance 1
    * within each band (bit flips of its own band value). Near misses
    * — a vector on the other side of one hyperplane — land in exactly
    * those buckets, so recall rises sharply with zero cost on the
    * corpus side (no extra tables, no bigger index; only the tiny
    * query side fans out ×(bitsPerBand+1)). Measured recall@5 at the
    * default 16-bit/4-band settings: 0.42 → 0.92 (sf0.001),
    * 0.40 → 0.94 (sf0.01). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nBits: Int = 16, bands: Int = 4,
      seed: Long = 42L, multiProbe: Boolean = false): DataFrame = {
    val cB = lshBuckets(corpus, idCol, vecCol, dim, nBits, bands, seed)
      .select(col("id").as("cand_id"), col("v").as("cand_v"),
        col("band_idx"), col("band_val"))
    val qB0 = lshBuckets(queries, idCol, vecCol, dim, nBits, bands, seed)
      .select(col("id").as("query_id"), col("v").as("query_v"),
        col("band_idx"), col("band_val"))
    val qB = if (!multiProbe) qB0 else {
      val bitsPerBand = nBits / bands
      qB0.select(col("query_id"), col("query_v"), col("band_idx"),
        explode(array_union(
          array(col("band_val")),
          array((0 until bitsPerBand).map(j =>
            col("band_val").bitwiseXOR(1L << j)): _*))).as("band_val"))
    }
    // score AT the band join — both vectors are in-flight there, so
    // the cosine is computed map-side in the join's own stage and the
    // pair stream is immediately projected down to (ids, cos) before
    // anything shuffles. Pair dedup (the same pair agrees in up to
    // bands × (1+multiprobe) buckets) is then a max-aggregate over
    // identical cos values — bit-identical to dedup-then-score. The
    // previous shape (distinct on bare ids, then TWO joins re-attaching
    // the embeddings) forced sort-merge sorts of a vector-carrying
    // stream proportional to the band-collision volume: at sf10 that
    // was ~5·10⁸ candidates × ~300 B vectors ≈ 170 GB of sort input —
    // it filled the disk. A wide candidate stream must only ever carry
    // ids + score; vectors stay in the bounded per-band corpus tables.
    val scored = cB.join(qB, Seq("band_idx", "band_val"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6)
          .as("cos"))
      .groupBy(col("query_id"), col("cand_id")).agg(max(col("cos")).as("cos"))
    rankTopK(scored, k)
  }

  /** Embedding-space isotropy diagnostics (Ethayarajh '19 made this
    * the standard health check: contextual embedding spaces collapse
    * into a narrow cone, and anisotropy silently breaks cosine
    * retrieval). Three numbers over the L2-normalized corpus:
    * mean original norm, ‖mean normalized vector‖ (≈0 when
    * isotropic, →1 when cone-collapsed), and the mean pairwise
    * cosine WITHOUT the O(n²) pair join — Σ_{i≠j} v̂ᵢ·v̂ⱼ =
    * ‖Σv̂‖² − Σ‖v̂ᵢ‖², two linear aggregates. Normalized components
    * are rounded to 6 dp and cast DECIMAL(16,6) first, so every sum
    * (per-dimension, per-vector diagonal, norm total) is exact and
    * partition-order-free, and the DECIMAL(16,6)² products stay
    * inside DECIMAL(38,12) — the oracle replays all of it including
    * the sequential-fold norms (q_v1 kernel discipline). One
    * posexplode scan + two grouped aggregates; no shuffle grows with
    * n². Returns one row (n, avg_norm, mean_vec_norm, avg_cos). */
  /** Cluster-purity report — assign every vector to its nearest seed
    * (the [[kmeansAssignRound]] struct-max rule: cosine rounded 6 dp,
    * ties → smaller seed id) and score each cluster by its dominant
    * TRUE label: purity answers "do the geometric clusters mean
    * anything?", the unsupervised mirror of [[centroidEval]]'s
    * supervised confusion. All counts integer; per-cluster dominant
    * label ties break to the smaller label (rank window). Returns
    * (cluster, n, top_label, top_n, purity). */
  def clusterPurity(corpus: DataFrame, seeds: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    val sd = seeds.select(col(idCol).as("__seed"), col(vecCol).as("__sv"))
    val assign = corpus.select(col(idCol).as("__id"),
        col(labelCol).cast("string").as("lab"), col(vecCol).as("__v"))
      .crossJoin(broadcast(sd))
      .select(col("__id"), col("lab"),
        struct(round(VectorFunctions.cosine(col("__v"), col("__sv")), 6)
          .as("cos"), (-col("__seed")).as("negseed")).as("__sc"))
      .groupBy(col("__id"), col("lab"))
      .agg(max(col("__sc")).as("__best"))
      .select(col("__id"), col("lab"), (-col("__best.negseed")).as("cluster"))
    val cells = assign.groupBy(col("cluster"), col("lab"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("c").desc, col("lab"))
    cells
      .withColumn("__n", sum(col("c")).over(Window.partitionBy(col("cluster"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("__n").as("n"),
        col("lab").as("top_label"), col("c").as("top_n"),
        round(col("c").cast("double") / col("__n").cast("double"), 6)
          .as("purity"))
  }

  /** Triplet accuracy — the contrastive-quality eval "is an item
    * closer to its own label than to another label's item?", scored
    * over DETERMINISTIC triplets: anchor i, positive = the next
    * same-label id (per-label lead window), negative = the row at
    * id + `stride` when its label differs (dropped otherwise — a
    * fixed modular-free rule both engines replay). Accuracy =
    * #(cos(a,p) > cos(a,n))/n, strict inequality (a tie is a miss).
    * Complements [[centroidEval]]: centroids test the class MEANS,
    * triplets test the local margins that actually rank retrieval.
    * Returns one row (n_triplets, n_correct, acc). Scale: one
    * window + two id equi-joins, cosines map-side. */
  def tripletEval(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, stride: Long = 17L): DataFrame = {
    val base = emb.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("string").as("lab"), col(vecCol).as("v"))
    val w = Window.partitionBy(col("lab")).orderBy(col("id"))
    base.withColumn("pos_id", lead(col("id"), 1).over(w))
      .filter(col("pos_id").isNotNull)
      .withColumn("neg_id", col("id") + stride)
      .join(base.select(col("id").as("pos_id"), col("v").as("__pv")),
        Seq("pos_id"))
      .join(base.select(col("id").as("neg_id"), col("lab").as("__nlab"),
        col("v").as("__nv")), Seq("neg_id"))
      .filter(col("__nlab") =!= col("lab"))
      .select(round(VectorFunctions.cosine(col("v"), col("__pv")), 6)
          .as("__cp"),
        round(VectorFunctions.cosine(col("v"), col("__nv")), 6).as("__cn"))
      .agg(count(lit(1)).as("n_triplets"),
        sum(when(col("__cp") > col("__cn"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("n_triplets"), col("n_correct"),
        when(col("n_triplets") > 0,
          round(col("n_correct").cast("double") /
            col("n_triplets").cast("double"), 6)).as("acc"))
  }

  /** Pairwise-cosine PROFILE without the O(n²) pair join — the
    * distribution shape behind [[isotropy]]'s single mean-cosine
    * number (a bimodal cosine histogram and a tight unimodal one can
    * share a mean; retrieval behaves completely differently on them).
    * Deterministic linear pair sample: consecutive ids (i, i+1) —
    * id-adjacency is unrelated to embedding geometry here, so the
    * sample is unbiased for the bulk shape and costs one self-join on
    * the id. Cosines round 6 dp, land in ten width-0.2 bins via pure
    * INTEGER µ-unit arithmetic ((c·10⁶ + 10⁶) div 2·10⁵, clamped) —
    * no float binning edge cases. Returns (bin, n_pairs), bin k
    * covering [k/5 − 1, k/5 − 0.8). */
  def cosineProfile(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val a = emb.select(col(idCol).as("__i"), col(vecCol).as("__va"))
    val b = emb.select((col(idCol) - 1).as("__i"), col(vecCol).as("__vb"))
    a.join(b, Seq("__i"))
      .select(round(VectorFunctions.cosine(col("__va"), col("__vb")) *
        1000000, 0).cast("long").as("__c"))
      .select(least(expr("(__c + 1000000) div 200000"), lit(9L)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
  }

  /** Nearest-centroid classification eval — "do the embeddings
    * actually separate the labels?", the cheapest end-to-end quality
    * probe of an embedding column (Rocchio classification): per-label
    * centroids train on one split, the held-out split classifies by
    * max cosine-to-centroid, and the CONFUSION GRID is the report —
    * which labels bleed into which. Centroid components are exact
    * decimal-ladder means (round-6 components summed in
    * DECIMAL(16,6), one closing division); scoring broadcasts the
    * |labels| centroid rows and takes one struct-max per doc (ties →
    * larger label, pinned); cosines fold sequentially (cosineHof) so
    * the oracle replays them. Returns (label, pred, n). Scale: one
    * posexplode aggregation for training + one broadcast
    * cross-score + two hash aggs — nothing grows with n². */
  def centroidEval(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, trainPred: Column): DataFrame = {
    val cent = emb.filter(trainPred)
      .select(col(labelCol).cast("string").as("lab"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("lab"), col("pos"))
      .agg(sum(round(col("x").cast("double"), 6).cast("decimal(16,6)"))
        .as("s"), count(lit(1)).as("n"))
      .select(col("lab"), col("pos"),
        round(col("s").cast("double") / col("n").cast("double"), 6).as("c"))
    val cvec = cent.groupBy(col("lab"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("lab"),
        transform(col("pc"), p => p.getField("c")).as("cv"))
    emb.filter(!trainPred)
      .select(col(idCol).as("__id"), col(labelCol).cast("string").as("label"),
        col(vecCol).as("__v"))
      .crossJoin(broadcast(cvec))
      .select(col("__id"), col("label"),
        struct(round(VectorFunctions.cosineHof(col("__v"), col("cv")), 6)
          .as("cos"), col("lab")).as("__sc"))
      .groupBy(col("__id"), col("label"))
      .agg(max(col("__sc")).as("__best"))
      .groupBy(col("label"), col("__best.lab").as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-dimension component statistics — the dead/dominant-dimension
    * report [[isotropy]]'s whole-space numbers can't localize: a
    * near-zero-variance dimension carries no information (dead), a
    * variance outlier dominates every distance ("rogue dimension",
    * Timkey & van Schijndel '21) — both argue for dropping or
    * whitening BEFORE building ANN indexes. Components round 6 dp
    * into DECIMAL(16,6) (float→double is exact, so the rounding is
    * replayable) and every sum is decimal — partition-order-free;
    * mean/variance close in one fixed double chain (+0.0
    * canonicalizes −0.0, the q_v4 lesson). Returns one row per
    * dimension (pos, n, mean, vr, lo, hi). Scale: one posexplode
    * scan + one hash aggregation keyed by dimension — d groups, never
    * the corpus. */
  def dimStats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("j", "x")))
      .select(col("j"),
        round(col("x").cast("double"), 6).cast("decimal(16,6)").as("r"))
      .groupBy(col("j"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("s"),
        sum(col("r") * col("r")).as("q"),
        min(col("r")).as("__lo"), max(col("r")).as("__hi"))
      .select((col("j") + 1).cast("long").as("pos"), col("n"),
        round(col("s").cast("double") / col("n").cast("double"), 6)
          .as("mean"),
        round(col("q").cast("double") / col("n").cast("double") -
          (col("s").cast("double") / col("n").cast("double")) *
          (col("s").cast("double") / col("n").cast("double")), 6)
          .plus(lit(0.0)).as("vr"),
        col("__lo").cast("double").as("lo"),
        col("__hi").cast("double").as("hi"))

  def isotropy(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val nrmExpr = sqrt(VectorFunctions.dot(col(vecCol), col(vecCol)))
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        nrmExpr.as("nrm"))
      .filter(col("nrm") > 0).localCheckpoint(true)
    val comp = base
      .select(col("id"), col("nrm"), posexplode(col("v")).as(Seq("j", "x")))
      .select(col("id"), col("j"),
        round(col("x").cast("double") * (lit(1.0) / col("nrm")), 6)
          .cast("decimal(16,6)").as("r"))
    val perDim = comp.groupBy(col("j"))
      .agg(sum(col("r")).cast("decimal(16,6)").as("sj"))
    val ss = perDim.agg(sum(col("sj") * col("sj")).as("ss2"))
    val dg = comp.agg(sum(col("r") * col("r")).as("dg"))
    val nr = base.agg(count(lit(1)).as("n"),
      sum(round(col("nrm"), 6).cast("decimal(16,6)")).as("sn"))
    nr.crossJoin(ss).crossJoin(dg)
      .select(col("n"),
        round(col("sn").cast("double") / col("n"), 6).as("avg_norm"),
        round(sqrt(col("ss2").cast("double")) / col("n"), 6)
          .as("mean_vec_norm"),
        // + 0.0 canonicalizes IEEE -0.0 (the q_v4 lesson)
        when(col("n") > 1,
          round((col("ss2") - col("dg")).cast("double") /
            (col("n").cast("double") * (col("n") - 1).cast("double")), 6)
            + lit(0.0)).as("avg_cos"))
  }
}
