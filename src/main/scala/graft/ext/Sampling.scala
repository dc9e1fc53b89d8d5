package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipeline construction (driver
  * extension, SURVEY §7 module 6): stratified sampling and weighted
  * source-mixture selection — the two selection primitives a corpus
  * build runs before tokenization (reference O5 is the plain-sample
  * ancestor; these are its per-stratum generalizations).
  *
  * Two faces per operator, same split as reference O5 / q_o5:
  *  - *deterministic*: selection is a pure function of the row key
  *    (modulo hashing), so runs are reproducible, incremental re-runs
  *    select the same rows, and a SQL oracle can replay the choice.
  *  - *seeded-random*: Spark's own sampling machinery
  *    (`df.stat.sampleBy`) for when statistical guarantees matter more
  *    than replay; Bernoulli-sampled per stratum, spec-covered (the
  *    sample RNG is impl-defined, like `df.sample` in q_o5's doc).
  *
  * Everything is a narrow filter or one window per stratum — no
  * shuffle beyond the window's own partitioning, no driver loop; at
  * 100 TB the deterministic face is a map-side filter.
  */
object Sampling {

  /** Deterministic stratified sample: keep a row of stratum `s` iff
    * `pmod(idCol, grain) < fractions(s) * grain`. With ids dense or
    * hashed this hits the target fraction to within 1/grain per
    * stratum. Strata absent from `fractions` are dropped (fraction 0).
    *
    * The selection predicate is a single CASE expression — fully
    * codegen'd, pushed to the scan where the format allows. */
  def stratifiedDeterministic(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], grain: Int = 10000): DataFrame = {
    require(fractions.nonEmpty, "fractions must not be empty")
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    val keep = fractions.foldLeft(lit(-1.0)) { case (acc, (s, f)) =>
      when(col(strataCol) === s, lit(f)).otherwise(acc)
    }
    df.filter(pmod(col(idCol), lit(grain)) < keep * grain)
  }

  /** Seeded-random stratified sample via Spark's per-stratum Bernoulli
    * sampler. Exact-fraction guarantees and RNG are Spark's
    * (impl-defined bits — spec-covered, not oracle-gated). */
  def stratifiedSeeded(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Per-row weighted sample: keep a row iff
    * `pmod(idCol, grain) < weight * grain`, where `weight` is any
    * [0,1] Column (e.g. a quality score) — the quality-weighted
    * downsampling stage of a corpus build ("keep high-quality docs
    * with high probability, junk with low"), reproducible and
    * oracle-checkable because the acceptance test is modular
    * arithmetic on the id, not an RNG. Map-side filter: no shuffle,
    * pushes past column pruning like any predicate. */
  def weightedDeterministic(df: DataFrame, idCol: String, weight: Column,
      grain: Int = 100): DataFrame =
    df.filter(pmod(col(idCol), lit(grain)) < floor(weight * grain))

  /** Weighted source-mixture selection: take the first
    * `round(weights(s) * total)` rows of each source `s` in
    * deterministic `orderCol` order — how a corpus build hits a target
    * mixture ("50% web, 30% wiki, ...") while staying reproducible.
    * Sources absent from `weights` contribute nothing.
    *
    * One `row_number` window partitioned by source; per-source quota
    * comparison is a broadcast-free CASE. At scale the window is the
    * standard top-n-per-key shape (or swap in
    * [[graft.plans.TopK.topKPerKey]] when quotas are small enough for
    * bounded heaps). */
  def mixture(df: DataFrame, sourceCol: String, orderCol: String,
      weights: Map[String, Double], total: Long): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    val quota = weights.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, round(lit(w) * total).cast("long")).otherwise(acc)
    }
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** TOKEN-budget mixture: like [[mixture]], but quotas are measured
    * in tokens, not rows — real curricula say "40% of 2B tokens from
    * web", and documents are not equal-sized, so row quotas miss the
    * target by the size skew. Per source `s`, keep the maximal
    * deterministic-order prefix of documents whose running token total
    * BEFORE each doc is under `round(weights(s) * totalTokens)` —
    * greedy prefix packing: at least one doc per positive quota,
    * overshoot bounded by one document (the q_x8 packing convention),
    * and the selection replays exactly from (order, token counts).
    * Sources absent from `weights` contribute nothing.
    *
    * Same scale shape as [[mixture]]: one cumulative-sum window
    * partitioned by source — the exclusive-prefix sum the packing
    * manifest (q_x8) already pays, no extra exchange. */
  def tokenMixture(df: DataFrame, sourceCol: String, orderCol: String,
      tokenCol: String, weights: Map[String, Double],
      totalTokens: Long): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    val quota = weights.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, round(lit(w) * totalTokens).cast("long")).otherwise(acc)
    }
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .filter(col("__cum") < quota)
      .drop("__cum")
  }

  /** Leakage-safe train/val/test split: assignment is by NEAR-DUP
    * COMPONENT, not by document — the split-contamination guard every
    * careful corpus build needs (a near-duplicate pair straddling
    * train and test silently inflates eval; per-doc hashing cannot
    * prevent it). Each document inherits its component
    * representative's draw: fingerprint(rep:seed) mod 100 against
    * cumulative percentage thresholds, so singletons behave exactly
    * like a per-doc seeded split and whole dup-clusters move
    * together. One resolveDupGroups pass + a broadcast-scale map-side
    * assignment; deterministic and SQL-replayable. `splits` maps name
    * → percentage (must sum to 100). */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Int)], seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percentages must sum to 100: $splits")
    val comp = Dedup.resolveDupGroups(pairs)
      .select(col("id").as("__cid"), col("rep").as("__rep"))
    val rep = coalesce(col("__rep"), col(idCol))
    val draw = pmod(graft.functions.TextStats.fingerprint(
      concat(rep.cast("string"), lit(s":$seed"))), lit(100L))
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assign = splits.zip(cuts).foldRight(lit(splits.last._1)) {
      case (((name, _), hi), acc) => when(draw < hi, lit(name)).otherwise(acc)
    }
    docs.join(comp, col(idCol) === col("__cid"), "left")
      .withColumn("split", assign)
      .drop("__cid", "__rep")
  }

  /** Temperature-weighted mixture (Conneau & Lample 2019 / mT5's
    * `p_s ∝ n_s^α`): the source weights are DERIVED from corpus
    * composition rather than hand-set — each source's share of the
    * `total`-row budget is its document count raised to `alpha`,
    * normalized. α = 1 reproduces natural proportions; α → 0
    * flattens toward uniform, up-sampling tail sources — the standard
    * low-resource re-balancing rule. Selection within a source is the
    * deterministic [[mixture]] prefix (quota per source, `orderCol`
    * order), so the whole operator replays exactly in SQL.
    *
    * Scale shape: one count aggregation over sources (tiny result,
    * collected — source cardinality is small by construction), then
    * the same single window as [[mixture]]. */
  def temperatureMixture(df: DataFrame, sourceCol: String, orderCol: String,
      alpha: Double, total: Long): DataFrame = {
    require(alpha >= 0.0, s"alpha must be >= 0: $alpha")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val weights = counts.map { case (s, n) =>
      s -> math.pow(n.toDouble, alpha) / z
    }
    mixture(df, sourceCol, orderCol, weights, total)
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"), hashed-n-gram
    * variant: score every raw-corpus document by how target-like its
    * token distribution is.
    *
    * Unigrams + bigrams hash into `buckets` cells (polynomial
    * fingerprint — SQL-replayable, same kernel as q_x13); the target
    * and raw sides each induce an add-α-smoothed bucket distribution;
    * a document's log-importance is Σ_grams log(p_target(b)/p_raw(b)).
    * Deterministic — selection is top-N by weight, not the paper's
    * Gumbel draw, so runs replay exactly (the seeded-noise variant is
    * one extra fingerprint column if ever needed).
    *
    * Scale shape: one gram explode (map-side), one `buckets`-row
    * aggregation, then a broadcast join of the tiny bucket-ratio table
    * back onto the gram stream and a per-doc sum — no shuffle touches
    * anything wider than (doc, gram), and the ratio table is O(buckets).
    * Returns (id, w) for every raw doc with ≥ 1 gram. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 64, alpha: Double = 0.5): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val grams = docs.select(col(idCol).as("id"), isTarget.as("tgt"),
        explode(concat(TextAnalysis.tokens(col(textCol)),
          TextAnalysis.shingles(col(textCol), 2))).as("g"))
      .withColumn("b",
        pmod(graft.functions.TextStats.fingerprint(col("g")), lit(buckets.toLong)))
    val counts = grams.groupBy(col("b")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("tgt"), 1L).otherwise(0L)).as("cr"))
    val tot = counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val ratios = counts.crossJoin(tot).select(col("b"),
      round(log((col("ct") + alpha) / (col("tt") + alpha * buckets)) -
        log((col("cr") + alpha) / (col("tr") + alpha * buckets)), 6).as("logr"))
    grams.filter(!col("tgt"))
      .join(broadcast(ratios), Seq("b"))
      .groupBy(col("id")).agg(round(sum(col("logr")), 4).as("w"))
  }

  /** Competence-based curriculum schedule (Platanios et al.
    * NAACL'19 shape): assign every row a difficulty STAGE (which
    * training phase first sees it) by exact corpus quantiles of
    * `difficultyCol`, and a seeded pseudo-random ORDER within the
    * stage (the fingerprint permutation — the q_o10 shuffle-shards
    * kernel), so the dataloader reads easy→hard but unbiased within
    * each band. stage ∈ [0, nStages): the count of stage quantile
    * thresholds strictly below the row's difficulty (thresholds
    * rounded 4 dp on both engines so boundary rows agree).
    *
    * Scale shape: one aggregation computes the nStages−1 thresholds
    * (a 1-row broadcast), then a map-side projection — no window, no
    * sort here; the writer sorts by (stage, ord) exactly like
    * [[graft.etl.Staging.writeShuffledShards]] orders by fingerprint.
    * At 100 TB swap the exact `percentile` for `approx_percentile`;
    * the exact form is the oracle-checkable face. */
  def curriculumSchedule(df: DataFrame, idCol: String, difficultyCol: String,
      nStages: Int, seed: String): DataFrame = {
    require(nStages >= 2, s"nStages must be >= 2: $nStages")
    val ps = (1 until nStages).map(_.toDouble / nStages)
    val th = df.agg(transform(
      percentile(col(difficultyCol), array(ps.map(lit): _*)),
      x => round(x, 4)).as("__th"))
    val stage = (1 until nStages).map(i =>
        when(col(difficultyCol) > element_at(col("__th"), i), 1L).otherwise(0L))
      .reduce(_ + _)
    df.crossJoin(broadcast(th))
      .select(col(idCol), stage.as("stage"),
        graft.functions.TextStats.fingerprint(
          concat(col(idCol).cast("string"), lit(":" + seed))).as("ord"))
  }

  /** Per-domain document cap — the over-represented-host guard every
    * web-corpus build runs (keep at most `cap` documents per
    * registrable domain). Selection is deterministic but unbiased:
    * rows are ranked by the polynomial fingerprint of (id, domain) —
    * a seeded pseudo-random permutation a SQL oracle replays exactly —
    * not by raw id, which would systematically prefer early crawl
    * order.
    *
    * Scale shape: routed through the native [[graft.plans.TopKPerKey]]
    * operator — one hash-partition shuffle on domain, bounded
    * O(domains·cap) memory per partition, no sort. The window
    * formulation (`row_number` ≤ cap) would fully sort every domain's
    * rows; at 100 TB the head domains hold billions of rows, and the
    * heap discards them in one streaming pass instead. */
  def capPerDomain(df: DataFrame, domainCol: String, idCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val fp = graft.functions.TextStats.fingerprint(
      concat(col(idCol).cast("string"), lit(":"), col(domainCol)))
    graft.plans.TopK.topKPerKey(df.withColumn("__fp", fp),
        Seq(col(domainCol)), Seq(col("__fp").asc, col(idCol).asc), cap)
      .drop("__fp")
  }

  /** Largest-remainder (Hamilton) apportionment of a global token
    * budget across sources — the mixing-recipe calculator: each
    * source's quota is budget·wᵢ/W, floors are granted outright, and
    * the leftover seats go to the largest fractional remainders
    * (ties to the lexicographically first source). EVERYTHING is
    * integer arithmetic — the remainder comparison uses
    * (budget·wᵢ) mod W directly, so no float ever enters and both
    * engines agree exactly; Σ alloc == budget by construction. The
    * ranking window runs over one row per source (the q_a17
    * documented-small convention). */
  def apportionBudget(df: DataFrame, keyCol: String, weight: Column,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, s"budget must be >= 1: $budget")
    val w = df.groupBy(col(keyCol)).agg(sum(weight).as("w"))
    val tot = w.agg(sum(col("w")).as("tw"))
    val q = w.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(${budget}L * w) div tw"))
      .withColumn("rem", (lit(budget) * col("w")) % col("tw"))
    val sb = q.agg(sum(col("base")).as("sb"))
    q.crossJoin(broadcast(sb))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col(keyCol))))
      .select(col(keyCol), col("w"), col("base"), col("rem"),
        (col("base") + when(col("rk") <= lit(budget) - col("sb"), 1L)
          .otherwise(0L)).as("alloc"))
  }

  /** 2-D Pareto skyline (the multi-objective data-selection
    * operator: "no other document is at least as good on BOTH axes
    * and strictly better on one"). Spark has no skyline operator;
    * the naive formulation is an O(n²) dominance anti-join, but in
    * two dimensions the skyline is a MONOTONE chain, so it reduces
    * to: per-x the best y (one hash aggregate), then one window pass
    * down x-descending keeping rows whose y strictly exceeds the
    * running max of all better-x rows — one shuffle + one sort. The
    * global window runs over DISTINCT-x rows only, so pick the
    * bounded-cardinality axis as x (a 4-dp score has ≤ 10⁴ distinct
    * values at any corpus size — the q_a17 documented-small
    * convention). The oracle deliberately uses the
    * INDEPENDENT NOT-EXISTS dominance definition, so the gate proves
    * the chain rewrite is equivalent to the spec, not just replayed.
    * Returns the skyline rows (xCol, yCol alias columns kept). */
  def skyline2d(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(xCol.as("x"), yCol.as("y"))
    val bestPerX = pts.groupBy(col("x")).agg(max(col("y")).as("y"))
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bestPerX
      .withColumn("__my", max(col("y")).over(w))
      .filter(col("__my").isNull || col("y") > col("__my"))
      .select(col("x"), col("y"))
  }

  /** Preference-pair construction (the DPO / RLHF-reward data shape):
    * per group, the best-scored item becomes `chosen` and the
    * worst-scored `rejected`, with the score margin attached. Ties
    * break to the smallest id on both ends, so an all-tied group
    * collapses to chosen == rejected and is dropped with the
    * singletons (a zero-margin pair teaches a preference model
    * nothing). Scores round to 4 dp before ranking so both engines
    * rank identically.
    *
    * ONE hash aggregate per group, no windows: best/worst are
    * `max_by`/`min_by` over zero-padded "(score, id)" string
    * composites (lexicographic = (score, tie) order — the OHLC
    * convention; the best key inverts the id so the max still
    * tie-breaks to the SMALLEST id). At 100 TB a window formulation
    * would sort every group's rows; the map-side partial aggregate
    * sends one candidate pair per group per task instead. Scores are
    * assumed in [0, 10) (zero-padded width 7). */
  def preferencePairs(df: DataFrame, idCol: String, groupCols: Seq[String],
      score: Column): DataFrame = {
    val q = round(score, 4)
    val qs = format_string("%07.4f", q)
    val bestKey = concat(qs, format_string("%012d",
      lit(999999999999L) - col(idCol)))
    val worstKey = concat(qs, format_string("%012d", col(idCol)))
    df.select(groupCols.map(col) ++
        Seq(col(idCol).as("__id"), q.as("__q"), bestKey.as("__bk"),
          worstKey.as("__wk")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(max_by(col("__id"), col("__bk")).as("chosen_id"),
        max(col("__q")).as("chosen_q"),
        min_by(col("__id"), col("__wk")).as("rejected_id"),
        min(col("__q")).as("rejected_q"))
      .filter(col("chosen_id") =!= col("rejected_id"))
      .withColumn("margin", round(col("chosen_q") - col("rejected_q"), 4))
  }

  /** Rendezvous (highest-random-weight) sharding: a row goes to the
    * shard s ∈ [0, nShards) maximizing fingerprint(id ":" s) — the
    * consistent-hash assignment whose defining property is minimal
    * movement: growing nShards by one relocates only ~1/(n+1) of the
    * keys (modulo hashing moves almost all of them). Weights come
    * from the oracle-replayable char-poly fingerprint pushed through
    * TWO SQUARINGS mod p — the fingerprint alone is AFFINE in the
    * shard suffix (fp_s = fp_0 + s mod p, so the argmax would always
    * pick the largest shard id; the q_v4/JL weak-hash lesson), and
    * squaring twice scrambles that order while every intermediate
    * stays < 2⁶² in int64. The argmax is ONE max aggregate over the
    * key·shard fan-out by packing (w, shard) into w·16+shard
    * (w < 2³¹, so the packed key fits int64 and orders
    * lexicographically — ties, if the mix ever collides within a
    * row's candidate set, still resolve identically in both
    * engines). Map-side fan-out ×nShards, one combine-enabled
    * aggregate: no data-size shuffle at any scale. Requires
    * nShards ≤ 16 (the packing base). Returns (id, shard). */
  def rendezvousShard(df: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 16, "packing base caps shards at 16")
    val spark = df.sparkSession
    val p = lit(2147483647L)
    val ss = spark.range(0, nShards).select(col("id").as("__s"))
    df.select(col(idCol)).crossJoin(broadcast(ss))
      .withColumn("__fp", graft.functions.TextStats.fingerprint(
        concat(col(idCol).cast("string"), lit(":"), col("__s").cast("string"))))
      .withColumn("__w1", pmod(col("__fp") * col("__fp"), p))
      .withColumn("__w2", pmod(col("__w1") * col("__w1"), p))
      .groupBy(col(idCol))
      .agg(max(col("__w2") * 16 + col("__s")).as("__k"))
      .select(col(idCol), pmod(col("__k"), lit(16L)).as("shard"))
  }

  /** Weighted sampling WITHOUT replacement, deterministic and
    * transcendental-free: the Efraimidis–Spirakis A-ES scheme keeps
    * the k items with the largest priority u_i^(1/w_i) — and the max
    * of w iid uniforms has exactly that distribution, so an item's
    * priority is computed as the MAX over w_i integer fingerprints
    * (no ln/pow whose last-ulp behavior could differ between
    * engines; the same beta trick replays exactly in SQL). Each
    * replica hashes (id, replica, seed) through the char-poly
    * fingerprint and the [[rendezvousShard]] double-squaring mix;
    * integer weights are clamped to [1, maxW] so the fan-out is
    * bounded map-side work. One combine-enabled max aggregate plus a
    * TakeOrderedAndProject top-k — no full sort, no shuffle of the
    * text payload. Returns (id, w, prio) for the k winners, ordered
    * (prio desc, id). */
  def prioritySample(df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: Long, maxW: Int = 16): DataFrame = {
    require(k >= 1 && maxW >= 1)
    val p = lit(2147483647L)
    val w = least(greatest(weight.cast("long"), lit(1L)), lit(maxW.toLong))
    df.select(col(idCol), w.as("w"))
      .select(col(idCol), col("w"),
        explode(sequence(lit(1L), col("w"))).as("__rep"))
      .withColumn("__fp", graft.functions.TextStats.fingerprint(
        concat(col(idCol).cast("string"), lit(":"), col("__rep").cast("string"),
          lit(s":$seed"))))
      .withColumn("__u", pmod(pmod(col("__fp") * col("__fp"), p) *
        pmod(col("__fp") * col("__fp"), p), p))
      .groupBy(col(idCol), col("w"))
      .agg(max(col("__u")).as("prio"))
      .orderBy(col("prio").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic class rebalancing: downsample every label to the
    * MINORITY label's count — the "balanced sampling" pass a
    * classifier-training pipeline runs when 90/10 skew would swamp
    * the loss. Selection is top-m per label by the replayable
    * (fingerprint(id), id) order — a seeded-but-deterministic uniform
    * draw, not head()'s layout accident; m broadcasts as a 1-row
    * aggregate. One window over the label partition. Returns the
    * kept rows (label, id). */
  def balanceLabels(df: DataFrame, labelCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(labelCol).as("label"), col(idCol).as("id"),
      graft.functions.TextStats.fingerprint(col(idCol).cast("string"))
        .as("__fp"))
    val m = base.groupBy(col("label")).agg(count(lit(1)).as("__c"))
      .agg(min(col("__c")).as("__m"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("__fp"), col("id"))
    base.withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(m))
      .filter(col("__rk") <= col("__m"))
      .select(col("label"), col("id"))
  }

  /** Greedy maximum-coverage document selection (the k-center idea in
    * token space; 1−1/e-approximate, Nemhauser '78): each round picks
    * the document adding the MOST not-yet-covered distinct tokens —
    * the coverage-based data-selection pass that buys vocabulary
    * breadth where similarity-based picks buy redundancy. Each of the
    * k rounds is one anti-join against the covered-token set, one
    * count aggregate, one 1-row argmax (gain desc, id) — no driver
    * tokens, no quadratic pass. Returns (pick_rank, id, gain);
    * documents whose tokens are fully covered can no longer win. */
  def maxCoverSelect(docs: DataFrame, idCol: String, textCol: String,
      k: Int, shingleN: Int = 2): DataFrame = {
    require(k >= 1 && k <= 8, s"unrolled rounds cap: $k")
    require(shingleN >= 1 && shingleN <= 5)
    // coverage units: word n-gram shingles (n=1 → plain tokens). The
    // gate uses bigrams — the synthetic corpus has a 31-word vocab
    // one document covers whole, while its ~900 bigrams keep every
    // greedy round discriminative.
    val unit = if (shingleN == 1) TextAnalysis.tokens(col(textCol))
      else graft.functions.TextStats.shingles(col(textCol), shingleN)
    val tok = docs.select(col(idCol).cast("long").as("id"),
        explode(unit).as("tok")).distinct()
      .localCheckpoint(true)
    var covered = tok.select(col("tok")).limit(0)
    var remaining = tok
    var selected: DataFrame = null
    for (i <- 1 to k) {
      val gains = remaining.join(covered, Seq("tok"), "left_anti")
        .groupBy(col("id")).agg(count(lit(1)).as("gain"))
      // pin the (single-row) pick: it feeds `selected`, `covered` AND
      // `remaining`, and the lazy form re-ran the whole gains
      // aggregation once per consumer per round (identity transform).
      // The FINAL round's pick stays lazy and covered/remaining are
      // not updated — both are dead after the loop, and the bounded
      // top-k machinery stays visible in the gate's final plan.
      val pick0 = gains.orderBy(col("gain").desc, col("id").asc).limit(1)
        .select(lit(i.toLong).as("pick_rank"), col("id"), col("gain"))
      val pick = if (i < k) pick0.localCheckpoint(true) else pick0
      selected = if (selected == null) pick else selected.unionByName(pick)
      if (i < k) {
        covered = covered.unionByName(
          remaining.join(pick.select(col("id")), Seq("id")).select(col("tok")))
          .distinct().localCheckpoint(true)
        remaining = remaining.join(pick.select(col("id")), Seq("id"),
          "left_anti")
      }
    }
    selected
  }

  /** The unrolled DuckDB oracle for [[maxCoverSelect]] over the
    * documents table (word bigram shingles, the q_d4 replay) — one
    * gains/argmax/covered CTE trio per greedy round, MATERIALIZED. */
  def maxCoverOracleSql(k: Int): String = {
    val sb = new StringBuilder(
      s"""WITH tw AS (SELECT doc_id AS id,
            list_filter(string_split_regex(trim(text), '\\s+'),
              x -> x <> '') AS t
          FROM documents),
          tok AS MATERIALIZED (SELECT DISTINCT id,
            unnest(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i + 1])) AS tok
          FROM tw WHERE len(t) >= 2),
          r1 AS MATERIALIZED (SELECT id, tok FROM tok)""")
    for (i <- 1 to k) {
      val gainSrc = if (i == 1) s"SELECT id, count(*) AS gain FROM r$i GROUP BY id"
        else s"""SELECT r.id, count(*) AS gain FROM r$i r
          LEFT JOIN c${i - 1} c ON r.tok = c.tok
          WHERE c.tok IS NULL GROUP BY r.id"""
      sb.append(s""", g$i AS MATERIALIZED ($gainSrc)""")
      sb.append(s""", p$i AS MATERIALIZED (SELECT CAST($i AS BIGINT)
          AS pick_rank, id, gain FROM (
          SELECT *, row_number() OVER (ORDER BY gain DESC, id) AS rn
          FROM g$i) WHERE rn = 1)""")
      val prevCov = if (i == 1) "" else s"SELECT tok FROM c${i - 1} UNION "
      sb.append(s""", c$i AS MATERIALIZED ($prevCov
          SELECT r.tok FROM r$i r JOIN p$i USING (id))""")
      sb.append(s""", r${i + 1} AS MATERIALIZED (SELECT r.id, r.tok
          FROM r$i r LEFT JOIN p$i ON r.id = p$i.id
          WHERE p$i.id IS NULL)""")
    }
    sb.append((1 to k).map(i =>
      s"\nSELECT pick_rank, id, gain FROM p$i").mkString("", " UNION ALL", ""))
    sb.append(" ORDER BY pick_rank")
    sb.toString
  }

  /** Systematic PPS sampling (probability proportional to size,
    * Madow '49) — the inclusion-exact weighted draw: lay the k ticks
    * tick_j = ⌊j·W/k⌋ over the cumulative-weight axis and take every
    * item an interval of which contains a tick (a heavy item can earn
    * multiplicity > 1 — that IS pps-with-replacement's honest
    * answer). Everything is integer: ticks-below(x) = min(k,
    * ⌈x·k/W⌉) via (x·k + W − 1) div W, multiplicity the difference
    * at the interval ends — no randomness, no floats, bit-exact
    * replay. The cumulative pass is [[OrderedPrefix.withPrefixSum]]
    * (two-level distributed scan — the input is corpus-sized by
    * definition, so a global ordered window would single-task the
    * whole corpus) + a 1-row total. Returns selected items only:
    * (id, w, n_ticks). */
  def ppsSystematic(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1)
    val base = df.select(col(idCol).as("id"), weight.cast("long").as("w"))
      .filter(col("w") > 0)
    val tot = base.agg(sum(col("w")).as("tw"))
    OrderedPrefix.withPrefixSum(base, Seq(col("id")), col("w"), "ce")
      .crossJoin(broadcast(tot))
      .withColumn("__b_end",
        least(lit(k.toLong), expr(s"(ce * $k + tw - 1) div tw")))
      .withColumn("__b_start",
        least(lit(k.toLong), expr(s"((ce - w) * $k + tw - 1) div tw")))
      .withColumn("n_ticks", col("__b_end") - col("__b_start"))
      .filter(col("n_ticks") >= 1)
      .select(col("id"), col("w"), col("n_ticks"))
  }

  /** Neyman optimal allocation (Neyman '34) — how to split a sample
    * budget across strata when they differ in size AND spread:
    * quota_h ∝ n_h·s_h (a high-variance stratum earns more budget
    * than proportional allocation would give it; the design that
    * minimizes the stratified-mean variance). Stratum sd comes from
    * exact integer sums, weights round 9 dp, and integerization is
    * largest-remainder (floor + biggest fractional parts win the
    * leftovers, tie → first stratum name) — quotas sum to exactly
    * `budget`. Two aggregates + one weight window. Returns
    * (grp, n_h, w, quota). */
  def neymanAllocation(df: DataFrame, grpCol: String, valueCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1)
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val per = df.groupBy(col(grpCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n_h"), sum(col(valueCol).cast("long")).as("s"),
        sum(d0(col(valueCol)) * d0(col(valueCol))).as("q"))
      .withColumn("w", when(col("n_h") > 1,
        round(col("n_h").cast("double") *
          sqrt((d0(col("n_h")) * col("q") - d0(col("s")) * d0(col("s")))
            .cast("double") /
            (col("n_h") * (col("n_h") - 1)).cast("double")), 9))
        .otherwise(lit(0.0)))
    val tot = per.agg(sum(col("w").cast("decimal(38,12)"))
      .cast("double").as("wtot"))
    val based = per.crossJoin(broadcast(tot))
      .withColumn("__exact", when(col("wtot") > 0,
        lit(budget.toDouble) * col("w") / col("wtot")).otherwise(lit(0.0)))
      .withColumn("__base", floor(col("__exact")).cast("long"))
      .withColumn("__rem", col("__exact") - col("__base").cast("double"))
    val leftover = based.agg((lit(budget.toLong) - sum(col("__base")))
      .as("__left"))
    val wRank = Window.orderBy(col("__rem").desc, col("grp"))
    based.crossJoin(broadcast(leftover))
      .withColumn("__rk", row_number().over(wRank))
      .select(col("grp"), col("n_h"), col("w"),
        (col("__base") + when(col("__rk") <= col("__left"), 1L)
          .otherwise(0L)).as("quota"))
  }

  /** Chronological train/test split with an EMBARGO gap — the
    * temporal leakage guard (de Prado's purged split, the time-series
    * sibling of [[leakageSafeSplit]]'s component split): train is
    * everything up to the `trainPct` row-mass cutoff DATE, the next
    * `embargoDays` are quarantined (rows whose features/labels
    * straddle the boundary poison both sides), test is the rest. The
    * cutoff is exact element selection on the cumulative day axis
    * (cum·100 ≥ n·pct, all integers — the weightedMedian trick, no
    * percentile approximation), so the split replays bit-for-bit.
    * One day-axis window + one labeling pass. Returns per split
    * (split, n_rows, min_dt, max_dt). */
  def chronoSplit(df: DataFrame, tsCol: String, trainPct: Int,
      embargoDays: Int): DataFrame = {
    require(trainPct >= 1 && trainPct <= 99 && embargoDays >= 0)
    val daily = df.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("c"))
    val cum = Window.orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(sum(col("c")).as("n"))
    val cutoff = daily.withColumn("cum", sum(col("c")).over(cum))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 100 >= col("n") * trainPct)
      .agg(min(col("dt")).as("cutoff"))
    df.select(to_date(col(tsCol)).as("dt")).crossJoin(broadcast(cutoff))
      .select(col("dt"),
        when(col("dt") <= col("cutoff"), "train")
          .when(col("dt") <= date_add(col("cutoff"), embargoDays), "embargo")
          .otherwise("test").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"), min(col("dt")).as("min_dt"),
        max(col("dt")).as("max_dt"))
  }

  /** Sample-ratio-mismatch check (the SRM guard every experiment
    * platform runs before trusting an A/B readout — Fabijan et al.
    * KDD'19): one-sample χ² goodness-of-fit of the observed split
    * counts against the DECLARED percentage weights,
    *   χ² = Σ (O_b − n·w_b)² / (n·w_b).
    * Driven off the declared weight list (a missing bucket still owes
    * its full n·w term — the q_p24 structural-zero lesson), expected
    * counts are the exactly-rounded double n·pct/100, per-bucket
    * terms round 6 dp, and the TOTAL row's χ² sums them in
    * DECIMAL(38,12). One count aggregate + broadcast-size combines.
    * Returns (split, n_obs, expected, term) per declared bucket +
    * ('TOTAL', n, n, χ²). */
  def srmCheck(assign: DataFrame, splitCol: String,
      weightsPct: Seq[(String, Int)]): DataFrame = {
    require(weightsPct.map(_._2).sum == 100,
      s"declared weights must total 100: $weightsPct")
    val spark = assign.sparkSession
    import spark.implicits._
    val wdf = weightsPct.toDF("split", "pct")
    val obs = assign.groupBy(col(splitCol).as("split"))
      .agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum(col("n_obs")).as("n"))
    val per = broadcast(wdf).join(obs, Seq("split"), "left")
      .crossJoin(broadcast(tot))
      .select(col("split"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        ((col("n") * col("pct")).cast("double") / 100).as("e"))
      .select(col("split"), col("n_obs"), col("e"),
        round((col("n_obs") - col("e")) * (col("n_obs") - col("e")) /
          col("e"), 6).as("term"))
    per.select(col("split"), col("n_obs"), round(col("e"), 4).as("expected"),
        col("term"))
      .unionByName(per
        .agg(sum(col("n_obs")).as("n_obs"),
          round(sum(col("term").cast("decimal(38,12)")).cast("double"), 6)
            .as("term"))
        .select(lit("TOTAL").as("split"), col("n_obs"),
          col("n_obs").cast("double").as("expected"), col("term")))
  }

  /** Split-leakage audit — the check run AFTER any train/eval split
    * of a deduplicated-but-not-perfectly corpus: given split
    * assignments and the near-dup pair graph, count pairs by the
    * (canonical) split-pair they land in. Any row with two different
    * split names is LEAKED eval signal (the documented failure mode
    * [[leakageSafeSplit]] exists to prevent — this is its
    * verification mirror, usable on ANY split including ones made
    * elsewhere). Two broadcast-or-shuffle joins of the pair list
    * against the assignment + one hash aggregation; pair volume is
    * candidates-only (never n²). Returns (split_a, split_b, n_pairs,
    * is_cross) with split_a ≤ split_b. */
  def splitLeakAudit(assign: DataFrame, idCol: String, splitCol: String,
      pairs: DataFrame): DataFrame = {
    val a = assign.select(col(idCol).as("id1"), col(splitCol).as("__sa"))
    val b = assign.select(col(idCol).as("id2"), col(splitCol).as("__sb"))
    pairs.join(a, Seq("id1")).join(b, Seq("id2"))
      .groupBy(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_cross", col("split_a") =!= col("split_b"))
  }

  /** Deterministic k-fold cross-validation assignment + balance
    * report: fold = fingerprint(id) mod k (the [[chronoSplit]]/q_o11
    * replayable-hash discipline — no rand(), no layout dependence,
    * any worker re-derives any row's fold), reported as the
    * fold × label count grid a CV harness checks BEFORE training k
    * models: a label missing from a fold invalidates that fold's
    * eval split. Returns (fold, label, n). Scale: one map-side hash
    * projection + one hash aggregation over k·|labels| cells. */
  def kfoldReport(df: DataFrame, idCol: String, labelCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    df.select(
        pmod(graft.ext.TextAnalysis.fingerprint(col(idCol).cast("string")),
          lit(k.toLong)).as("fold"),
        col(labelCol).cast("string").as("label"))
      .groupBy(col("fold"), col("label"))
      .agg(count(lit(1)).as("n"))
  }

  /** Waterfill quota allocation — weighted mixture quotas with CAP
    * AND REDISTRIBUTION: [[mixture]]'s proportional quotas silently
    * under-deliver when a source has fewer rows than its share; here
    * a capped source keeps everything it has and its unused budget
    * redistributes proportionally among the others (one extra round —
    * the standard two-pass waterfill; any residue after it is
    * reported, not silently lost). ALL-INTEGER: floor quotas via
    * `div`, exact leftovers, deterministic. Returns per-source
    * (source, avail, w, take) plus a ("__rest", 0, 0, residue) row.
    * Scale: two scalar aggregates broadcast back over the source
    * dim — nothing corpus-scale beyond computing `avail`. */
  def waterfillQuotas(avail: DataFrame, weights: Seq[(String, Long)],
      budget: Long): DataFrame = {
    require(budget >= 0)
    val spark = avail.sparkSession
    import spark.implicits._
    val wdf = weights.toDF("source", "w")
    val base = avail.select(col("source"), col("avail").cast("long")
        .as("avail"))
      .join(broadcast(wdf), Seq("source"), "left")
      .select(col("source"), col("avail"),
        coalesce(col("w"), lit(1L)).as("w"))
      .localCheckpoint(true)
    val sw = base.agg(sum(col("w")).as("sw"))
    val r1 = base.crossJoin(broadcast(sw))
      .select(col("source"), col("avail"), col("w"),
        least(col("avail"), expr(s"($budget * w) div sw")).as("take1"))
      .localCheckpoint(true)
    val left = r1.agg((lit(budget) - sum(col("take1"))).as("leftover"),
      sum(when(col("avail") > col("take1"), col("w"))
        .otherwise(lit(0L))).as("sw2"))
    val r2 = r1.crossJoin(broadcast(left))
      .select(col("source"), col("avail"), col("w"),
        when(col("avail") > col("take1") && col("sw2") > 0,
          least(col("avail"),
            col("take1") + expr("(leftover * w) div sw2")))
          .otherwise(col("take1")).as("take"))
      .localCheckpoint(true)
    r2.unionByName(
      r2.agg((lit(budget) - sum(col("take"))).as("take"))
        .select(lit("__rest").as("source"), lit(0L).as("avail"),
          lit(0L).as("w"), col("take")))
  }

  /** Shard-rebalance audit for [[rendezvousShard]] — the consistent-
    * hashing CONTRACT made measurable: going from `fromShards` to
    * `toShards` (one added shard), a key moves iff the NEW shard wins
    * its rendezvous — so expected movement is ~n/toShards, versus
    * ~(1−1/toShards)·n for mod-hashing. Both assignments replay the
    * exact fingerprint+double-squaring mix, the comparison is one
    * equi-join on the id. Returns one row
    * (n, moved, moved_frac). Scale: two map-side shard argmaxes +
    * one join on the id key. */
  def rendezvousRebalance(df: DataFrame, idCol: String,
      fromShards: Int, toShards: Int): DataFrame = {
    val a = rendezvousShard(df, idCol, fromShards)
      .withColumnRenamed("shard", "s_from")
    val b = rendezvousShard(df, idCol, toShards)
      .withColumnRenamed("shard", "s_to")
    a.join(b, Seq(idCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("s_from") =!= col("s_to"), 1L).otherwise(0L))
          .as("moved"))
      .select(col("n"), col("moved"),
        round(col("moved").cast("double") / col("n").cast("double"), 6)
          .as("moved_frac"))
  }

  /** Iterative proportional fitting ("raking", Deming & Stephan '40)
    * over two categorical dimensions: per-cell weights that pull BOTH
    * marginals toward uniform targets — the survey-statistics move a
    * corpus build uses to balance languages AND sources
    * simultaneously when per-cell quotas ([[Sampling.apportion]]-
    * style) can't hit two marginals at once. Each iteration scales
    * every cell weight by (target_A / current_A-marginal), then the
    * same for B; the fixpoint matches both marginals exactly when one
    * exists (classical IPF convergence).
    *
    * Scale shape: ONE data-sized aggregation (the (a, b) cell
    * counts); every iteration then runs on the cell table — bounded
    * by |A|·|B|, never the data — with broadcast marginal joins.
    * Determinism: weights live on the integer ladder as nano-unit
    * BIGINTs (w9 = w·10⁹), so marginal sums are exact integer sums
    * (order-independent, ≈10¹⁸ headroom at the tested scales — swap
    * to DECIMAL(38,0) beyond ~10² cells × 10⁷ rows/cell), and each
    * update is ONE fixed double chain — w9/1e9 · (N/k) / (s9/1e9) ·
    * 1e9, rounded half-up to the next integer weight — mirrored
    * token-for-token in [[rakeOracleSql]]. Returns one row per cell:
    * (a, b, n, w, wn) with w the 9-dp weight and wn = round(n·w, 4)
    * the reweighted mass. */
  def rake(df: DataFrame, dimA: String, dimB: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1,8]: $iters")
    val cells = df.groupBy(col(dimA).cast("string").as("a"),
        col(dimB).cast("string").as("b"))
      .agg(count(lit(1)).as("n")).localCheckpoint(true)
    val tot = cells.agg(sum(col("n")).as("Ntot"),
      count_distinct(col("a")).as("ka"),
      count_distinct(col("b")).as("kb"))
    var w = cells.crossJoin(broadcast(tot))
      .withColumn("w9", lit(1000000000L))
    def step(dim: String, kCol: String): Unit = {
      val s9 = s"s9_$dim"
      val marg = w.groupBy(col(dim)).agg(sum(col("n") * col("w9")).as(s9))
      w = w.join(broadcast(marg), Seq(dim))
        .withColumn("w9",
          round(col("w9") / lit(1e9) * (col("Ntot") / col(kCol)) /
            (col(s9) / lit(1e9)) * lit(1e9), 0).cast("long"))
        .drop(s9)
    }
    for (_ <- 1 to iters) {
      step("a", "ka")
      step("b", "kb")
      w = w.localCheckpoint(true)
    }
    w.select(col("a"), col("b"), col("n"),
      round(col("w9") / lit(1e9), 9).as("w"),
      round((col("n") * col("w9")) / lit(1e9), 4).as("wn"))
  }

  /** DuckDB replay of [[rake]]: the same cell counts, the same
    * nano-unit integer weights, the same per-iteration A-then-B
    * double chain, unrolled into one CTE per half-step. */
  def rakeOracleSql(table: String, dimA: String, dimB: String,
      iters: Int): String = {
    val sb = new StringBuilder(
      s"""WITH c0 AS (SELECT CAST($dimA AS VARCHAR) AS a,
             CAST($dimB AS VARCHAR) AS b, count(*) AS n
           FROM $table GROUP BY 1, 2),
         t AS (SELECT sum(n) AS N, count(DISTINCT a) AS ka,
                      count(DISTINCT b) AS kb FROM c0),
         w0 AS (SELECT a, b, n, CAST(1000000000 AS BIGINT) AS w9 FROM c0)""")
    for (i <- 1 to iters) {
      sb.append(s""",
         ma$i AS (SELECT a, sum(n * w9) AS s9 FROM w${i - 1} GROUP BY a),
         wa$i AS (SELECT w.a, w.b, w.n,
             CAST(round(w.w9 / 1e9 * (t.N / t.ka) / (m.s9 / 1e9) * 1e9, 0)
               AS BIGINT) AS w9
           FROM w${i - 1} w, t, ma$i m WHERE m.a = w.a),
         mb$i AS (SELECT b, sum(n * w9) AS s9 FROM wa$i GROUP BY b),
         w$i AS (SELECT w.a, w.b, w.n,
             CAST(round(w.w9 / 1e9 * (t.N / t.kb) / (m.s9 / 1e9) * 1e9, 0)
               AS BIGINT) AS w9
           FROM wa$i w, t, mb$i m WHERE m.b = w.b)""")
    }
    sb.append(s"""
         SELECT a, b, n, round(w9 / 1e9, 9) AS w,
                round((n * w9) / 1e9, 4) AS wn
         FROM w$iters ORDER BY a, b""")
    sb.toString
  }

  /** DuckDB replay of the [[rendezvousShard]] packed-argmax for one
    * id expression: same char-poly fold, same double squaring mod p,
    * same w·16+s packing. */
  def rendezvousShardOracleExpr(idSql: String, nShards: Int): String =
    s"""(SELECT max(((f.w * f.w % 2147483647) * (f.w * f.w % 2147483647)
             % 2147483647) * 16 + f.s)
        FROM (SELECT t.s, list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split($idSql || ':' || CAST(t.s AS VARCHAR), ''),
               c -> CAST(ord(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 2147483647) AS w
           FROM (SELECT unnest(generate_series(0, ${nShards - 1})) AS s) t) f)
        % 16"""
}
