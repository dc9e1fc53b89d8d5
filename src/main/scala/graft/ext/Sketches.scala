package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches, expressed relationally.
  *
  * A count-min sketch is usually presented as a custom aggregation
  * buffer; on Spark the same structure falls out of plain operators:
  * explode each row into its `depth` (row, bucket) cells, then one
  * hash aggregation over `depth × width` cells — map-side partial
  * aggregation compresses each partition to ≤ depth·width rows before
  * the shuffle, so the network cost is the sketch size times the
  * partition count, never the data size. No UDAF, no driver state,
  * and the sketch is itself a DataFrame: broadcast-joinable against
  * any key set for estimates.
  *
  * Guarantees (standard CMS): estimates never undercount, and
  * overcount by at most ε·N with probability 1−δ for width ≥ e/ε,
  * depth ≥ ln(1/δ). The gate query checks both bounds as boolean
  * columns (the q_hll bounds-gate pattern — the sketch cells are
  * xxhash64-placed, so cell values are impl-defined; the BOUNDS are
  * deterministic facts).
  */
object Sketches {

  /** Build the `depth × width` count-min sketch of `key`: one row per
    * non-empty cell, `(row, bucket, c)`. */
  def cmsSketch(df: DataFrame, key: String, depth: Int = 4,
      width: Int = 8192): DataFrame = {
    val cells = (0 until depth).map(i => pmod(xxhash64(lit(i), col(key)), lit(width)))
    df.select(posexplode(array(cells: _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** Point-estimate the frequency of each row of `keys` (column
    * `key`) against a sketch from [[cmsSketch]] (same depth/width):
    * est = min over rows of the key's cell. The sketch is tiny
    * (≤ depth·width rows) so Catalyst broadcasts it — estimating any
    * number of keys is one map-side join + a depth-row min. */
  def cmsEstimate(keys: DataFrame, sketch: DataFrame, key: String,
      depth: Int = 4, width: Int = 8192): DataFrame = {
    val cells = (0 until depth).map(i => pmod(xxhash64(lit(i), col(key)), lit(width)))
    keys.select(col(key), posexplode(array(cells: _*)).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col(key)).agg(min(col("c")).as("est"))
  }

  /** KMV ("k minimum values" / bottom-k) distinct sketch per group —
    * the third mergeable sketch family beside CMS and HLL
    * (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07's unbiased
    * estimator (k−1)/U₍k₎), with two properties the others lack:
    * the retained hashes are a DETERMINISTIC function of the key set
    * (so the gate oracle replays the estimate exactly — not a bounds
    * check) and the sketch doubles as a uniform sample of the
    * distinct keys.
    *
    * Hash: the polynomial fingerprint mod 2³¹−1
    * ([[graft.ext.TextAnalysis.fingerprint]]) followed by one
    * Park–Miller MINSTD step (h·48271 + 11 mod 2³¹−1) so DuckDB
    * replays it bit-for-bit. The finalizer matters: the raw poly hash
    * of a short string never wraps the modulus, so its values
    * concentrate near 0 and the kth-minimum estimator diverges
    * (measured 5·10⁴× over-estimate on integer keys); the full-period
    * multiplier is a bijection on [1, M) that scatters that range
    * uniformly. Hash collisions fold two keys into one — the standard
    * KMV caveat, negligible until distinct counts approach the hash
    * space; swap in `xxhash64` when replayability is not required.
    *
    * Scale shape: one hash aggregation deduplicates (grp, h) with
    * map-side partial dedup, then the native bounded-heap
    * [[graft.plans.TopKPerKey]] keeps the k smallest hashes per group
    * — O(groups·k) memory, no per-group sort. The sketch is ≤ k rows
    * per group regardless of data size. */
  /** The KMV hash: poly fingerprint + MINSTD finalizer, in [0, 2³¹−1). */
  def kmvHash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(graft.functions.TextStats.fingerprint(key.cast("string")) *
      lit(48271L) + lit(11L), lit(2147483647L))

  /** [[kmvHash]] + one square-then-affine scramble:
    * h₂ = ((h₁² mod M)·48271 + 11) mod M. The affine-only finalizer is
    * enough for kth-minimum ESTIMATES (only the coarse magnitude of
    * the kth value matters) but NOT for sketch-overlap estimators:
    * affine maps send consecutive integer keys to a lattice, and two
    * contiguous key ranges can land their entire bottom-k sets in
    * DISJOINT hash intervals (measured: keys 1–1000 vs 501–1500 under
    * [[kmvHash]] share ZERO bottom-256 hashes despite 500 common
    * keys). Squaring mod a prime breaks the linearity; the 2:1
    * quadratic-residue fold is the standard negligible-collision
    * trade. Still one integer chain — DuckDB replays it. */
  def kmvHashStrong(key: Column): Column = {
    val h1 = kmvHash(key)
    pmod(pmod(h1 * h1, lit(2147483647L)) * lit(48271L) + lit(11L),
      lit(2147483647L))
  }

  def kmvSketch(df: DataFrame, grpCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    graft.plans.TopK.topKPerKey(
      df.select(col(grpCol).as("grp"), kmvHash(col(keyCol)).as("h")).distinct(),
      Seq(col("grp")), Seq(col("h").asc), k)
  }

  /** Merge per-group KMV sketches into one "ALL" sketch: the k
    * smallest hashes of the union of bottom-k sets equal the k
    * smallest of the full distinct-hash set (any globally-bottom-k
    * hash is bottom-k within every group that contains it), so the
    * merged estimate is exactly the single-sketch estimate over the
    * union — the property that lets 1000 executors sketch
    * independently and combine. */
  def kmvMerge(sketches: DataFrame, k: Int): DataFrame =
    graft.plans.TopK.topKPerKey(
      sketches.select(lit("ALL").as("grp"), col("h")).distinct(),
      Seq(col("grp")), Seq(col("h").asc), k)

  /** Distinct-count estimate from a [[kmvSketch]]: exact when the
    * sketch is not full (fewer than k distinct hashes seen),
    * otherwise (k−1)·M / h₍k₎ with M = 2³¹−1 — the Beyer et al.
    * unbiased estimator on the normalized kth minimum. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("kth"))
      .select(col("grp"),
        when(col("n_sk") < k, col("n_sk").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(2147483647.0) /
            col("kth"), 4)).as("est"))

  /** Join-cardinality estimation via the CMS inner product (Cormode–
    * Muthukrishnan '05 §4.2) — what a cost-based planner wants BEFORE
    * committing to a join strategy: |R ⋈ S| = Σ_k f_R(k)·f_S(k),
    * estimated as min over sketch rows of Σ_b cR[b]·cS[b]. Each side
    * sketches independently in one pass (depth·width cells, mergeable
    * across partitions), the dot product joins two tiny sketches —
    * the full join never runs. Collisions only ADD mass, so the
    * estimate NEVER undercounts (deterministic guarantee, emitted as
    * a boolean the oracle asserts); expected overcount is
    * n_R·n_S/width per row, checked at 3× slack. Cell values are
    * xxhash-placed (impl-defined), so the gate hashes the exact
    * counts + the two bound booleans, q_a13-style. Returns
    * (n_r, n_s, true_card, never_under, bound_ok). */
  def cmsJoinCardinality(r: DataFrame, s: DataFrame, key: String,
      depth: Int = 4, width: Int = 8192): DataFrame = {
    val est = cmsSketch(r, key, depth, width).as("a")
      .join(cmsSketch(s, key, depth, width).as("b"), Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("a.c") * col("b.c")).as("ip"))
      .agg(min(col("ip")).as("est"))
    val nR = r.agg(count(lit(1)).as("n_r"))
    val nS = s.agg(count(lit(1)).as("n_s"))
    val truth = r.select(col(key).as("__k"))
      .join(s.select(col(key).as("__k")), Seq("__k"))
      .agg(count(lit(1)).as("true_card"))
    nR.crossJoin(broadcast(nS)).crossJoin(broadcast(truth))
      .crossJoin(broadcast(est))
      .select(col("n_r"), col("n_s"), col("true_card"),
        (col("est") >= col("true_card")).as("never_under"),
        (col("est") - col("true_card") <=
          col("n_r") * col("n_s") * 3L / width).as("bound_ok"))
  }

  /** EXACT distinct count per group via 64-bit bucket bitmaps — the
    * shuffle-light alternative to count(DISTINCT) for dense integer
    * keys (the roaring-bitmap idea reduced to plain longs). Each key
    * becomes one set bit: bucket = key / 64, mask = 1L << (key % 64);
    * `bit_or` collapses (group, bucket) to a single long — and being
    * commutative/associative it partial-aggregates map-side, so the
    * shuffle carries ≤ one long per (group, occupied bucket) per
    * partition instead of one row per key occurrence (count(DISTINCT)
    * in the same shape shuffles every distinct pair). `bit_count` then
    * pops each bitmap and a plain sum yields the exact count. Two
    * hash aggregates, no sort, no expansion — at 100 TB the bucket
    * axis is |key space|/64, independent of row count. Keys must be
    * non-negative (id columns are). Returns (group, n_distinct). */
  def bitmapDistinct(df: DataFrame, grpCol: String,
      keyCol: String): DataFrame =
    df.select(col(grpCol).as("grp"),
        // `div` not `/`: long/int is double division in Spark, and a
        // double round-trip corrupts ids past 2^53
        expr(s"CAST($keyCol AS BIGINT) div 64").as("__bucket"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod($keyCol, 64) AS INT))")
          .as("__mask"))
      .groupBy(col("grp"), col("__bucket"))
      .agg(bit_or(col("__mask")).as("__bm"))
      .groupBy(col("grp"))
      .agg(sum(bit_count(col("__bm")).cast("long")).as("n_distinct"))

  /** HDR-style log-linear quantile sketch (Tene's HdrHistogram /
    * DDSketch family): bucket positive integer values by (bit-length,
    * top `subBits` mantissa bits) — a MERGEABLE fixed-error quantile
    * structure whose every step is INTEGER arithmetic, so unlike
    * DDSketch's `ceil(ln x / ln γ)` (one libm call from a knife-edge
    * bucket flip between engines) the sketch AND its quantiles replay
    * bit-for-bit in any engine:
    *   m     = bit_length(v)            (length of the base-2 digits)
    *   shift = max(m − subBits, 0)
    *   sub   = v >> shift               (bucket id within the decade)
    *   [low, high) = [sub << shift, (sub+1) << shift)
    * Values with m ≤ subBits get singleton buckets (exact); wider
    * values land in buckets of relative width 1/sub ≤ 2^(1−subBits)
    * (sub ≥ 2^(subBits−1) once m > subBits) — the DDSketch guarantee
    * with γ = 1 + 2^(1−subBits). Bucket count per group is bounded by
    * 63·2^subBits regardless of data size; `(grp, m, sub)` counts are
    * one map-side-combined hash aggregation, and two sketches merge
    * by adding counts. Requires v ≥ 1. Returns (grp, m, sub, c). */
  def hdrSketch(df: DataFrame, grpCol: String, valueCol: Column,
      subBits: Int = 6): DataFrame = {
    require(subBits >= 1 && subBits <= 20, s"subBits in [1,20]: $subBits")
    df.select(col(grpCol).as("grp"), valueCol.cast("long").as("__v"))
      // enforce the v ≥ 1 contract at runtime: v ≤ 0 would silently
      // corrupt buckets (conv treats negatives as huge unsigned) —
      // fail fast instead of returning wrong quantiles
      .withColumn("__v", when(col("__v") >= 1, col("__v"))
        .otherwise(raise_error(concat(
          lit("hdrSketch requires v >= 1, got "), col("__v")))))
      .withColumn("__m", length(conv(col("__v"), 10, 2)).cast("int"))
      .withColumn("__sh", greatest(col("__m") - lit(subBits), lit(0)))
      .select(col("grp"), col("__m").as("m"),
        expr("shiftright(__v, __sh)").as("sub"))
      .groupBy(col("grp"), col("m"), col("sub"))
      .agg(count(lit(1)).as("c"))
  }

  /** Per-mille quantile estimates from a [[hdrSketch]]: cumulative
    * counts over the bucket axis (ascending (m, sub) IS value order
    * for v ≥ 1), then for each q the FIRST bucket whose cumulative
    * count reaches ⌈n·q/1000⌉ — the same type-1 selection rule as
    * [[Profiling.exactQuantiles]], applied to buckets. The window is
    * partitioned by group over ≤ 63·2^subBits bucket rows (bounded by
    * the sketch geometry, never the data — the legal window shape).
    * Estimate = bucket midpoint (low+high) >> 1, still integer-exact;
    * the true quantile provably lies in [low, high). Returns
    * (grp, q_permille, n, est, low, high). */
  def hdrQuantiles(sketch: DataFrame, qsPermille: Seq[Int],
      subBits: Int = 6): DataFrame = {
    require(qsPermille.nonEmpty &&
      qsPermille.forall(q => q >= 1 && q <= 1000),
      s"per-mille points must be in [1,1000]: $qsPermille")
    import org.apache.spark.sql.expressions.Window
    val cum = sketch
      .withColumn("__cum", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("m"), col("sub"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .withColumn("__sh",
        greatest(col("m") - lit(subBits), lit(0)))
      .withColumn("__low", expr("shiftleft(sub, __sh)"))
      .withColumn("__high", expr("shiftleft(sub + 1, __sh)"))
    val qdf = cum.sparkSession.createDataFrame(
      qsPermille.distinct.sorted.map(q => Tuple1(q.toLong)))
      .toDF("q_permille")
    cum.crossJoin(broadcast(qdf))
      .filter(col("__cum") * 1000 >= col("__n") * col("q_permille"))
      .groupBy(col("grp"), col("q_permille"))
      .agg(max(col("__n")).as("n"),
        min(expr("shiftright(__low + __high, 1)")).as("est"),
        min(col("__low")).as("low"),
        min(col("__high")).as("high"))
  }

  /** KMV set-operation estimates — intersection and Jaccard of two
    * key sets from their bottom-k sketches alone (Beyer et al.
    * SIGMOD'07 §4; the sketch-union trick in [[kmvMerge]] gives the
    * union estimate, and the fraction ρ of the union sketch's hashes
    * present in BOTH input sketches is an unbiased estimate of
    * J = |A∩B| / |A∪B|, so |A∩B| ≈ ρ · est(|A∪B|)). When the merged
    * sketch is not full every distinct hash is retained and the
    * "estimates" are exact — one formula covers both regimes because
    * [[kmvEstimate]] already switches on sketch fullness and ρ's
    * denominator is the retained-hash count. Everything downstream of
    * the two bottom-k scans touches ≤ 3k rows (broadcast-sized); the
    * exact intersection for the audit column is one distinct
    * semi-join. Deterministic via [[kmvHash]], so an oracle replays
    * every number. Returns one row: (est_a, est_b, est_union,
    * k_used, m_overlap, est_inter, est_jaccard, exact_inter,
    * rel_err). */
  def kmvIntersect(dfA: DataFrame, keyA: String, dfB: DataFrame,
      keyB: String, k: Int): DataFrame = {
    // sketches hash with [[kmvHashStrong]] — the overlap estimator
    // needs the lattice-free finalizer (see its scaladoc)
    val a = dfA.select(lit("A").as("grp"), kmvHashStrong(col(keyA)).as("h"))
    val b = dfB.select(lit("B").as("grp"), kmvHashStrong(col(keyB)).as("h"))
    val sk = graft.plans.TopK.topKPerKey(
        a.unionByName(b).distinct(), Seq(col("grp")), Seq(col("h").asc), k)
      .localCheckpoint(true)
    val merged = kmvMerge(sk, k).localCheckpoint(true)
    val estAB = kmvEstimate(sk, k)
    val estU = kmvEstimate(merged, k)
    val inBoth = merged.select(col("h"))
      .join(sk.filter(col("grp") === "A").select(col("h")), Seq("h"))
      .join(sk.filter(col("grp") === "B").select(col("h")), Seq("h"))
      .agg(count(lit(1)).as("m_overlap"))
    val kUsed = merged.agg(count(lit(1)).as("k_used"))
    val exact = dfA.select(col(keyA).as("__k")).distinct()
      .join(dfB.select(col(keyB).as("__k")).distinct(), Seq("__k"))
      .agg(count(lit(1)).as("exact_inter"))
    val estA = estAB.filter(col("grp") === "A").select(col("est").as("est_a"))
    val estB = estAB.filter(col("grp") === "B").select(col("est").as("est_b"))
    estA.crossJoin(broadcast(estB))
      .crossJoin(broadcast(estU.select(col("est").as("est_union"))))
      .crossJoin(broadcast(kUsed)).crossJoin(broadcast(inBoth))
      .crossJoin(broadcast(exact))
      .select(col("est_a"), col("est_b"), col("est_union"), col("k_used"),
        col("m_overlap"),
        round(col("m_overlap").cast("double") / col("k_used") *
          col("est_union"), 4).as("est_inter"),
        round(col("m_overlap").cast("double") / col("k_used"), 4)
          .as("est_jaccard"),
        col("exact_inter"),
        when(col("exact_inter") > 0,
          round(abs(col("m_overlap") / col("k_used").cast("double") *
            col("est_union") - col("exact_inter")) /
            col("exact_inter"), 4)).as("rel_err"))
  }
}
