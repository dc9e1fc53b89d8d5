package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators (driver extension, SURVEY §7 module 6):
  * the health checks a pipeline runs before/after every stage —
  * per-column null/distinct/min/max profile and a physical partition
  * balance report for skew diagnosis.
  */
object Profiling {

  /** Column profile: one output row per profiled column with total
    * rows, null count, exact distinct count, and min/max rendered as
    * strings (schema-stable across column types). ONE aggregation job
    * for all columns — Spark plans the multi-distinct via Expand, so
    * the input is read once regardless of how many columns are
    * profiled; the single-row result is then unpivoted with an
    * explode (no driver loop, no per-column scan). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__${c}__nonnull"),
      countDistinct(col(c)).as(s"__${c}__distinct"),
      min(col(c)).cast("string").as(s"__${c}__min"),
      max(col(c)).cast("string").as(s"__${c}__max")))
    val all = count(lit(1)).as("__n") +: aggs
    val row = df.agg(all.head, all.tail: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}__nonnull")).as("n_nulls"),
        col(s"__${c}__distinct").as("n_distinct"),
        col(s"__${c}__min").as("min_val"),
        col(s"__${c}__max").as("max_val"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Declarative data-quality expectations (the Deequ-style contract
    * check a pipeline runs before promoting a batch). All ROW-LEVEL
    * rules evaluate in ONE aggregation pass — each rule contributes a
    * conditional violation counter to the same agg, so checking 20
    * rules costs the same scan as checking one. The single stat row
    * is then unpivoted to (check, n_rows, n_violations, pass).
    *
    * Dataset-level checks (key uniqueness, referential integrity)
    * need their own shuffles by nature; [[uniquenessViolations]] and
    * [[orphanCount]] return scalar frames unioned onto the report. */
  def checkRowRules(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    // NULL rule results count as violations (a row that can't prove
    // the contract doesn't satisfy it)
    val aggs = rules.map { case (name, ok) =>
      count(when(!coalesce(ok, lit(false)), lit(1))).as(s"__v__$name") }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row.select(explode(array(rules.map { case (name, _) => struct(
        lit(name).as("check_name"),
        col("__n").as("n_rows"),
        col(s"__v__$name").as("n_violations"),
        (col(s"__v__$name") === 0).as("pass")) }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Duplicate-key count for a uniqueness expectation: rows beyond
    * the first per key (0 = unique). One hash agg on the key. */
  def uniquenessViolations(df: DataFrame, keys: Seq[String], name: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("__k"), sum(col("__c")).as("__n"))
      .select(lit(name).as("check_name"), col("__n").as("n_rows"),
        (col("__n") - col("__k")).as("n_violations"),
        (col("__n") === col("__k")).as("pass"))

  /** Referential-integrity expectation: child rows whose key has no
    * parent (anti-join count; Catalyst broadcasts the parent side
    * when it fits, AQE handles the rest). */
  def orphanCount(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val orphans = child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
    child.agg(count(lit(1)).as("__n"))
      .crossJoin(orphans.agg(count(lit(1)).as("__v")))
      .select(lit(name).as("check_name"), col("__n").as("n_rows"),
        col("__v").as("n_violations"), (col("__v") === 0).as("pass"))
  }

  /** Physical partition balance: rows per partition id plus the
    * max/mean ratio (the number a skew diagnosis starts from; 1.0 is
    * perfectly balanced). Partition ids are a property of the current
    * physical distribution — use the report to DECIDE on salting /
    * repartitioning, not as stable output (spec-covered, not
    * oracle-gated). */
  def partitionStats(df: DataFrame): DataFrame = {
    val per = df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_rows"))
    per.crossJoin(per.agg(
        max(col("n_rows")).cast("double").as("__mx"),
        avg(col("n_rows")).as("__mean")))
      .select(col("partition_id"), col("n_rows"),
        round(col("__mx") / col("__mean"), 4).as("max_over_mean"))
  }

  /** Group-mean imputation: nulls in `valueCol` filled with the mean
    * of the row's group (a group with no non-null values stays null).
    * One window over the group key — a single shuffle, no driver
    * statistics pass; the standard numeric-feature repair step before
    * training-data export. */
  def imputeGroupMean(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.withColumn(valueCol, coalesce(col(valueCol), avg(col(valueCol)).over(w)))
  }

  /** Per-group winsorization — the robust-statistics companion to
    * [[outliersZ]]: instead of flagging extremes, clip them to the
    * group's exact [pLo, pHi] percentile band (the standard
    * heavy-tail repair for quality scores / lengths before they feed
    * sampling weights, where one viral outlier would otherwise own
    * the budget).
    *
    * Percentiles are EXACT (`percentile`, linear interpolation at
    * rank p·(n−1) — the same definition DuckDB's `quantile_cont`
    * uses, so the gate oracle is exact), rounded to 4 dp before
    * comparing so both engines make identical clip decisions at the
    * boundary. Scale shape: one partial-aggregating groupBy builds
    * the per-group bounds table (|groups| rows — broadcast), then a
    * map-side join + clip; no window, no per-group sort of the data
    * rows. Appends `lo`, `hi`, `v_wins`. */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band [$pLo, $pHi]")
    val bounds = df.groupBy(col(groupCol)).agg(
      round(percentile(col(valueCol), lit(pLo)), 4).as("lo"),
      round(percentile(col(valueCol), lit(pHi)), 4).as("hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("v_wins",
        least(greatest(col(valueCol).cast("double"), col("lo")), col("hi")))
  }

  /** Per-group quantile normalization onto the POOLED distribution —
    * the cross-source feature equalizer (microarray lineage): a row's
    * within-group rank quantile is mapped to the pooled corpus value
    * at that same quantile, so every group ends up with an identical
    * value distribution and per-source scoring biases cancel. The
    * map goes through an `nBins`-point grid of exact pooled
    * percentiles (rounded 4 dp so both engines agree bit-for-bit);
    * the within-group quantile is cume_dist, so ties share a bucket
    * and tie order is irrelevant.
    *
    * Scale shape: one aggregation builds the K-value grid (broadcast
    * as a single array row), one window pass partitioned on the
    * group key ranks the rows — no per-row join against a
    * corpus-sized reference table, which is what makes this form
    * survive a 100× scale-up where the naive as-of join against the
    * full sorted pool would not. */
  def quantileNormalize(df: DataFrame, valueCol: String, groupCol: String,
      nBins: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val ps = (1 to nBins).map(_.toDouble / nBins)
    val grid = df.agg(transform(
      percentile(col(valueCol), array(ps.map(lit): _*)),
      x => round(x, 4)).as("__g"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    df.withColumn("__cd", cume_dist().over(w))
      .crossJoin(broadcast(grid))
      .withColumn("v_qnorm",
        element_at(col("__g"), ceil(col("__cd") * nBins).cast("int")))
      .drop("__cd", "__g")
  }

  /** Population-stability-index drift report — the standard
    * production monitor for "did this week's corpus shift against the
    * reference?" (credit-scoring lineage; PSI = Σ (p−q)·ln(p/q) over
    * reference-quantile bins; rule of thumb: < 0.1 stable, > 0.25
    * investigate). Bin edges are the REFERENCE corpus's exact
    * quantiles (rounded 4 dp so both engines bin identically);
    * both sides get +1/bin Laplace smoothing so empty bins
    * contribute a finite, deterministic penalty instead of ±∞.
    *
    * Returns one row per bin: (bin, n_ref, n_cur, psi_contrib,
    * psi_total) — the total repeated per row via a 1-row broadcast
    * (the scalar-combine convention).
    *
    * Scale shape: one aggregation for the edges (broadcast), one
    * map-side bin projection + hash count per corpus — two scans,
    * no window over data rows, no driver loop. */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val cuts = ref.agg(transform(
      percentile(col(valueCol), array(ps.map(lit): _*)),
      x => round(x, 4)).as("__t"))
    val bin = (1 until nBins).map(i =>
        when(col(valueCol) > element_at(col("__t"), i), 1L).otherwise(0L))
      .reduce(_ + _)
    def binCounts(df: DataFrame, out: String): DataFrame =
      df.crossJoin(broadcast(cuts)).select(bin.as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(out))
    val allBins = cuts.select(explode(sequence(lit(0L), lit((nBins - 1).toLong)))
      .as("bin"))
    val joined = allBins
      .join(binCounts(ref, "n_ref"), Seq("bin"), "left")
      .join(binCounts(cur, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    val contrib = joined.crossJoin(broadcast(tot))
      .withColumn("__p", (col("n_ref") + 1).cast("double") /
        (col("__tr") + nBins))
      .withColumn("__q", (col("n_cur") + 1).cast("double") /
        (col("__tc") + nBins))
      .withColumn("psi_contrib",
        round((col("__p") - col("__q")) * log(col("__p") / col("__q")), 6))
    val total = contrib.agg(round(sum(col("psi_contrib")), 6).as("psi_total"))
    contrib.crossJoin(broadcast(total))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("psi_contrib"),
        col("psi_total"))
  }

  /** Gini concentration of a weight across groups — the corpus-
    * balance diagnostic (is 90% of the token mass in 2 domains?):
    * G = (2·Σ rank·wᵣ − (n+1)·W) / (n·W) over ascending-weight
    * ranks, the exact rank formulation of the Lorenz-curve area.
    * Numerator and denominator stay in DECIMAL(38,0)/HUGEINT
    * integers until ONE final double division (rank·w products at
    * 10⁶ domains × 10¹⁴ tokens overflow int64 — hence decimal), so
    * both engines agree exactly. The ranking window runs over one
    * row per group (q_a17 documented-small). */
  def giniConcentration(df: DataFrame, keyCol: String,
      weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = df.groupBy(col(keyCol)).agg(sum(weight).as("w"))
    val ranked = w.withColumn("rk",
      row_number().over(Window.orderBy(col("w").asc, col(keyCol).asc))
        .cast("long"))
    ranked.agg(count(lit(1)).as("n"),
        sum(col("w").cast("decimal(38,0)")).as("tw"),
        sum((col("rk") * col("w")).cast("decimal(38,0)")).as("rw"))
      .select(col("n").as("n_groups"),
        col("tw").cast("long").as("total_w"),
        round((col("rw") * 2 - (col("n") + 1) * col("tw")).cast("double")
          / (col("n") * col("tw")).cast("double"), 6).as("gini"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the distribution-drift
    * test PSI (q_p16) approximates with bins, computed EXACTLY:
    * D = max over values of |F₁(v) − F₂(v)|. The comparison runs on
    * cross-multiplied integer counts (|c₁·n₂ − c₂·n₁|, DECIMAL(38,0)
    * so 10¹³-row samples cannot overflow), so the max is found on
    * exact integers and only the final D divides — both engines agree
    * bit-for-bit. One hash aggregate to per-value counts, then BOTH
    * cumulative CDFs ride one [[OrderedPrefix.withPrefixSums]] pass —
    * distinct values of a continuous column are data-sized at corpus
    * scale, so the cumulative counts must never funnel through a
    * single unpartitioned window task — and one scalar combine. */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val pv = a.select(col(valueCol).cast("double").as("v"))
      .withColumn("g", lit(1))
      .unionByName(b.select(col(valueCol).cast("double").as("v"))
        .withColumn("g", lit(2)))
    val perV = pv.groupBy(col("v")).agg(
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("k1"),
      sum(when(col("g") === 2, 1L).otherwise(0L)).as("k2"))
    val tot = perV.agg(sum(col("k1")).as("n1"), sum(col("k2")).as("n2"))
    val cum = OrderedPrefix.withPrefixSums(perV, Seq(col("v")),
      Seq(col("k1") -> "c1", col("k2") -> "c2"))
    val dn = cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("c1").cast("decimal(38,0)") * col("n2") -
          col("c2").cast("decimal(38,0)") * col("n1")).as("dnum"))
      .agg(min(col("n1")).as("n1"), min(col("n2")).as("n2"),
        max(col("dnum")).as("dn"))
    dn.select(col("n1"), col("n2"),
      round(col("dn").cast("double") /
        (col("n1").cast("double") * col("n2").cast("double")), 6).as("ks_d"))
  }

  /** Bayesian-bootstrap confidence interval for the corpus mean
    * (Rubin '81) — the bootstrap that actually distributes: instead
    * of materializing B resamples, every row carries B deterministic
    * exponential weights (w = −ln u, the Dirichlet-weights limit) and
    * each replicate is a weighted mean — one map-side explode ×B and
    * one B-row aggregate, no sampling shuffle, which is why Poisson/
    * Bayesian bootstrap is the standard form at corpus scale. The
    * uniform u comes from the char-poly fingerprint of "id:b:seed"
    * pushed through TWO MINSTD steps (the KMV lesson: short-string
    * fingerprints never wrap the modulus, so raw values are tiny and
    * the weights would all be huge without the finalizer). Weighted
    * sums accumulate in DECIMAL(30,10), so partition order never
    * perturbs a replicate mean and the oracle replays it exactly;
    * the CI is exact percentiles over the B replicate means. */
  def bayesianBootstrapCi(df: DataFrame, idCol: String, valueCol: String,
      b: Int = 40, seed: Int = 17): DataFrame = {
    require(b >= 4, s"need b >= 4 replicates: $b")
    val M = 2147483647L
    val reps = df.select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("double").as("__x"))
      .select(col("__id"), col("__x"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
    val fp = graft.functions.TextStats.fingerprint(
      concat_ws(":", col("__id"), col("b"), lit(seed)))
    val h2 = ((fp * lit(48271L)) % lit(M) * lit(48271L)) % lit(M)
    val u = (h2 + 1).cast("double") / lit(2147483648.0)
    val w = -log(u)
    val means = reps
      .select(col("b"), w.as("__w"), (w * col("__x")).as("__wx"))
      .groupBy(col("b"))
      .agg(sum(col("__wx").cast("decimal(30,10)")).as("__swx"),
        sum(col("__w").cast("decimal(30,10)")).as("__sw"))
      .select(col("b"),
        (col("__swx").cast("double") / col("__sw").cast("double")).as("m"))
    means.agg(count(lit(1)).as("n_reps"),
      round(percentile(col("m"), lit(0.025)), 4).as("ci_lo"),
      round(percentile(col("m"), lit(0.5)), 4).as("ci_mid"),
      round(percentile(col("m"), lit(0.975)), 4).as("ci_hi"))
  }

  /** Benford first-significant-digit conformance report — the
    * data-forensics screen (fabricated or truncated numeric columns
    * drift off the log distribution; Nigrini's audit standard): per
    * digit 1–9 the observed count, the Benford-expected count
    * N·log10(1+1/d), and the χ² contribution, plus the total χ²
    * repeated per row (the 1-row-broadcast scalar-combine
    * convention). The first digit is extracted through integer cents
    * and the decimal-string length — never floating log10, whose
    * boundary ulps (log10(1000) vs 2.999…) would bin differently per
    * engine. One hash aggregate over a map-side digit projection; the
    * 9-row tail is constant-sized at any corpus scale. */
  def benfordReport(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val fd = floor(cents.cast("double") /
      pow(lit(10.0), (length(cents.cast("string")) - 1).cast("double")))
      .cast("int")
    val counts = df.filter(col(valueCol) > 0)
      .select(fd.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val grid = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val n9 = grid.join(counts, Seq("digit"), "left")
      .select(col("digit").cast("long").as("digit"),
        coalesce(col("n"), lit(0L)).as("n"))
    val tot = n9.agg(sum(col("n")).as("__t"))
    val contrib = n9.crossJoin(broadcast(tot))
      .withColumn("__e", col("__t") *
        (log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))))
      .withColumn("chi2_contrib",
        round((col("n") - col("__e")) * (col("n") - col("__e")) / col("__e"), 4))
    val total = contrib.agg(round(sum(col("chi2_contrib")), 4).as("chi2_total"))
    contrib.crossJoin(broadcast(total))
      .select(col("digit"), col("n"), round(col("__e"), 4).as("expected"),
        col("chi2_contrib"), col("chi2_total"))
  }

  /** Per-group MAD outliers — the ROBUST sibling of [[outliersZ]]
    * (Iglewicz & Hoaglin's modified z-score, 0.6745·(v−med)/MAD,
    * cutoff 3.5): mean/stddev move with the outliers they're hunting,
    * the median and median-absolute-deviation don't, which is why
    * heavy-tailed telemetry and quality scores are screened this way.
    * Medians are exact rank order statistics (value at position
    * ceil(n/2) ascending — the deterministic convention the oracle
    * replays; ties share the value so tie order is irrelevant), not
    * interpolated, so even-sized groups agree across engines.
    * Zero-MAD groups (over half the values identical) yield no
    * outliers, same guard shape as [[outliersZ]].
    *
    * Scale shape: two window passes partitioned on the group key
    * (value median, then deviation median) + broadcast joins back —
    * no driver statistics, no sort beyond the windows' own. */
  def outliersMad(df: DataFrame, valueCol: String, groupCol: String,
      cutoff: Double = 3.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def rankMedian(in: DataFrame, vCol: String, out: String): DataFrame =
      in.select(col(groupCol), col(vCol),
          row_number().over(Window.partitionBy(col(groupCol))
            .orderBy(col(vCol))).as("__rn"),
          count(lit(1)).over(Window.partitionBy(col(groupCol))).as("__n"))
        .filter(col("__rn") === floor((col("__n") + 1) / lit(2.0)))
        .select(col(groupCol), col(vCol).as(out))
    val med = rankMedian(df, valueCol, "med")
    val withMed = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mad = rankMedian(withMed, "__dev", "mad")
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("mad_z",
        round(lit(0.6745) * (col(valueCol) - col("med")) / col("mad"), 4))
      .filter(col("mad") > 0 && abs(col("mad_z")) > cutoff)
      .drop("__dev")
  }

  /** Per-group z-score outliers: rows whose value deviates from the
    * group mean by more than `z` sample standard deviations, with the
    * score attached. Same single-shuffle window shape as
    * [[imputeGroupMean]]; groups with zero variance yield no outliers
    * (sd guard) rather than dividing by zero. */
  def outliersZ(df: DataFrame, valueCol: String, groupCol: String,
      z: Double = 3.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.withColumn("__mu", avg(col(valueCol)).over(w))
      .withColumn("__sd", stddev_samp(col(valueCol)).over(w))
      .withColumn("zscore", (col(valueCol) - col("__mu")) / col("__sd"))
      .filter(col("__sd") > 0 && abs(col("zscore")) > z)
      .drop("__mu", "__sd")
  }

  /** Discrete power-law exponent by the Clauset–Shalizi–Newman MLE:
    * α = 1 + n / Σ ln(x_i / (xmin − ½)) over the tail x ≥ xmin — the
    * heavy-tail diagnostic for degree/frequency/length distributions
    * (is this corpus Zipf-shaped, and how steep?). A plain double sum
    * of logs is partition-order-dependent, so each ln is rounded to
    * 9 dp and accumulated in DECIMAL(38,12) — exact, order-free, and
    * replayed digit-for-digit by the oracle (the q_p19 decimal-sum
    * discipline). One filter + one aggregate; scales as a scan.
    * Returns (n_tail, alpha, xmin). */
  def powerlawFit(df: DataFrame, valueCol: String, xmin: Long): DataFrame = {
    require(xmin >= 1)
    val v = df.select(col(valueCol).cast("double").as("x"))
      .filter(col("x") >= xmin)
    v.agg(count(lit(1)).as("n_tail"),
        sum(round(log(col("x") / (lit(xmin.toDouble) - 0.5)), 9)
          .cast("decimal(38,12)")).as("__s"))
      .select(col("n_tail"),
        when(col("__s") > 0,
          round(lit(1.0) + col("n_tail").cast("double") /
            col("__s").cast("double"), 6)).as("alpha"),
        lit(xmin).as("xmin"))
  }

  /** ROC-AUC of a score column against a boolean label, computed as
    * the tie-corrected Mann-Whitney U — the ranking-quality number a
    * quality-classifier gate reports. Everything stays integer until
    * the final division: per distinct score keep (k_pos, k_tot), a
    * cumulative-count window gives each tie-group's doubled average
    * rank 2·r̄ = 2·cum_before + k_tot + 1, and 2U = Σ k_pos·2r̄ −
    * n_pos·(n_pos+1) accumulates in DECIMAL(38,0) — AUC = 2U / (2·
    * n_pos·n_neg) is one exact-integer division. One groupBy, then
    * the cumulative count over DISTINCT SCORES runs through
    * [[OrderedPrefix.withPrefixSum]] — a continuous score column has
    * data-sized distinct cardinality, so the rank pass must never be
    * one unpartitioned window task. Returns (n_pos, n_neg, auc). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: Column): DataFrame = {
    val perS = df.select(col(scoreCol).cast("double").as("s"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("s")).agg(count(lit(1)).as("kt"), sum(col("y")).as("kp"))
    val ranked = OrderedPrefix
      .withPrefixSum(perS, Seq(col("s")), col("kt"), "cum")
      .select(col("kt"), col("kp"),
        (lit(2) * (col("cum") - col("kt")) + col("kt") + 1)
          .cast("decimal(38,0)").as("r2"))
    ranked.agg(
        sum(col("kp")).as("np"),
        sum(col("kt") - col("kp")).as("nn"),
        sum(col("kp").cast("decimal(38,0)") * col("r2")).as("sr2"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        when(col("np") > 0 && col("nn") > 0,
          round((col("sr2").cast("double") -
              col("np").cast("double") * (col("np").cast("double") + 1)) /
            (lit(2.0) * col("np").cast("double") * col("nn").cast("double")),
            6)).as("auc"))
  }

  /** Pearson χ² test of independence between two categorical columns
    * — the "did the label distribution shift across sources?" gate.
    * Each cell's contribution (N·obs − rt·ct)² / (rt·ct·N) is
    * computed per cell (integer numerator in DECIMAL(38,0), one
    * division), rounded to 9 dp, and summed in DECIMAL(38,12) so the
    * total is partition-order-free and oracle-exact. Contingency
    * cells via one groupBy, then expanded to the FULL r×c grid
    * (a structural zero still owes its (0−E)²/E = E term); margins
    * via two broadcast-size re-aggregations of the cells (no second
    * scan of the input). Returns (n, n_rows_cat, n_cols_cat, dof,
    * chi2). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("obs")).localCheckpoint(true)
    val rt = cells.groupBy(col("a")).agg(sum(col("obs")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("obs")).as("ct"))
    val n = cells.agg(sum(col("obs")).as("n"),
      countDistinct(col("a")).as("nr"), countDistinct(col("b")).as("nc"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // expand to the FULL r×c grid: a structural zero still contributes
    // its (0−E)²/E = E term — summing observed cells only undercounts
    // χ² whenever the table has empty cells
    val full = rt.select(col("a")).crossJoin(broadcast(ct.select(col("b"))))
      .join(cells, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("obs"), lit(0L)).as("obs"))
    val terms = full.join(broadcast(rt), Seq("a")).join(broadcast(ct), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("n"), col("nr"), col("nc"),
        round(((dec(col("n")) * dec(col("obs")) - dec(col("rt")) * dec(col("ct"))) *
            (dec(col("n")) * dec(col("obs")) - dec(col("rt")) * dec(col("ct"))))
            .cast("double") /
          (dec(col("rt")) * dec(col("ct")) * dec(col("n"))).cast("double"), 9)
          .cast("decimal(38,12)").as("term"))
    terms.groupBy(col("n"), col("nr"), col("nc"))
      .agg(round(sum(col("term")).cast("double"), 6).as("chi2"))
      .select(col("n"), col("nr").as("n_rows_cat"), col("nc").as("n_cols_cat"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"), col("chi2"))
  }

  /** Spearman rank correlation ρ between two numeric columns with
    * tie-averaged ranks — the monotone-association screen that
    * ignores outliers Pearson would chase. Doubled average ranks
    * (2·cum_before + k + 1, integers even at half-rank ties) come
    * from one [[OrderedPrefix.withPrefixSum]] pass per column over
    * DISTINCT VALUES (data-sized for a continuous column — never a
    * single unpartitioned window task) and join back to rows; ρ is
    * then Pearson on integer doubled ranks with the
    * [[graft.query.GraphQueries.degreeAssortativity]]
    * DECIMAL(38,0) five-sum discipline — exact until the final
    * sqrt/divide. Returns (n, rho). */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def ranks(c: String) = {
      val perV = df.select(col(c).cast("double").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("k"))
      OrderedPrefix.withPrefixSum(perV, Seq(col("v")), col("k"), "cum")
        .select(col("v"), (lit(2) * (col("cum") - col("k")) + col("k") + 1).as("r2"))
    }
    val rows = df.select(col(xCol).cast("double").as("vx"),
        col(yCol).cast("double").as("vy"))
      .join(ranks(xCol).select(col("v").as("vx"), col("r2").as("rx")), Seq("vx"))
      .join(ranks(yCol).select(col("v").as("vy"), col("r2").as("ry")), Seq("vy"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val s = rows.agg(count(lit(1)).as("m"),
      sum(dec(col("rx"))).as("sx"), sum(dec(col("ry"))).as("sy"),
      sum(dec(col("rx")) * dec(col("ry"))).as("sxy"),
      sum(dec(col("rx")) * dec(col("rx"))).as("sxx"),
      sum(dec(col("ry")) * dec(col("ry"))).as("syy"))
    val varx = (col("m") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vary = (col("m") * col("syy") - col("sy") * col("sy")).cast("double")
    val num = (col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
    s.select(col("m").as("n"),
      when(varx > 0 && vary > 0,
        round(num / (sqrt(varx) * sqrt(vary)), 6)).as("rho"))
  }

  /** Per-group simple OLS y = a + b·x with exact integer-scaled sums:
    * x and y are multiplied by 10^xScale / 10^yScale, rounded to
    * DECIMAL(38,0), and the five Pearson sums accumulate exactly (the
    * [[spearman]] / assortativity discipline) — slope, intercept and
    * R² are then a handful of IEEE-deterministic double operations on
    * exact integers, so the oracle replays them bit-for-bit. ONE
    * groupBy over the input; no window, no join. The workhorse trend
    * fit for per-segment drift dashboards. Returns (group, n, slope,
    * intercept, r2), all rounded to 6 dp. */
  def olsTrend(df: DataFrame, groupCol: String, xCol: Column, yCol: Column,
      xScale: Int = 0, yScale: Int = 2): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val xi = dec(round(xCol.cast("double") * math.pow(10, xScale).toLong, 0))
    val yi = dec(round(yCol.cast("double") * math.pow(10, yScale).toLong, 0))
    val s = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(xi).as("sx"), sum(yi).as("sy"),
        sum(xi * yi).as("sxy"), sum(xi * xi).as("sxx"),
        sum(yi * yi).as("syy"))
    val n = dec(col("n"))
    val varx = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val vary = (n * col("syy") - col("sy") * col("sy")).cast("double")
    val num = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    // unit conversion back from the integer scales: slope carries
    // 10^(xScale-yScale), intercept divides the raw sums by 10^scale
    val slope = num / varx * math.pow(10, xScale - yScale)
    val intercept = (col("sy").cast("double") / math.pow(10, yScale) -
      slope * col("sx").cast("double") / math.pow(10, xScale)) /
      col("n").cast("double")
    s.select(col("g").as(groupCol), col("n"),
      when(varx > 0, round(slope, 6)).as("slope"),
      when(varx > 0, round(intercept, 6)).as("intercept"),
      when(varx > 0 && vary > 0, round(num * num / (varx * vary), 6)).as("r2"))
  }

  /** Kruskal–Wallis H across ALL groups at once — the multi-group
    * generalization of the rank tests ([[rocAuc]] is the two-group
    * face): global tie-averaged doubled ranks from one
    * [[OrderedPrefix.withPrefixSum]] pass over DISTINCT VALUES
    * (data-sized for a continuous column — never one unpartitioned
    * window task), per-group rank sums, then
    *   H = [ 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1) ] / C,
    * with the tie divisor C = 1 − Σ(t³−t)/(n³−n). Per-group terms
    * R_g²/(4·n_g) are rounded to 9 dp and summed in DECIMAL(38,12)
    * (the chiSquare partition-order-free discipline); everything else
    * is exact integers until the closing divisions. Returns
    * (n, n_groups, dof, h) rounded to 6 dp. */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val rows = df.select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
    val perV = rows.groupBy(col("v")).agg(count(lit(1)).as("k"))
    val ranked = OrderedPrefix
      .withPrefixSum(perV, Seq(col("v")), col("k"), "cum")
      .select(col("v"),
        (lit(2) * (col("cum") - col("k")) + col("k") + 1).as("r2"),
        col("k"))
    val ties = ranked.agg(sum(dec(col("k")) * dec(col("k")) * dec(col("k"))
      - dec(col("k"))).as("tsum"))
    val perG = rows.join(ranked.select(col("v"), col("r2")), Seq("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(dec(col("r2"))).as("rg2"))
    val terms = perG.agg(count(lit(1)).as("n_groups"),
      sum(col("ng")).as("n"),
      sum(round((col("rg2") * col("rg2")).cast("double") /
          (lit(4.0) * col("ng").cast("double")), 9).cast("decimal(38,12)"))
        .as("srr"))
    val nD = col("n").cast("double")
    val hUnc = lit(12.0) / (nD * (nD + 1)) * col("srr").cast("double") -
      lit(3.0) * (nD + 1)
    val corr = lit(1.0) - col("tsum").cast("double") / (nD * nD * nD - nD)
    terms.crossJoin(broadcast(ties))
      .select(col("n"), col("n_groups"), (col("n_groups") - 1).as("dof"),
        when(corr > 0, round(hUnc / corr, 6)).as("h"))
  }

  /** Theil–Sen robust slope: the LOWER MEDIAN of all pairwise slopes
    * (y_j−y_i)/(x_j−x_i) over an indexed series, plus the matching
    * median intercept y_i − slope·x_i. Pair slopes are single IEEE
    * divisions of exact integers (bit-identical across engines), and
    * both medians are ELEMENT SELECTIONS via the [[weightedMedian]]
    * doubled-cumulative-count trick — no averaging, so the oracle
    * replays the exact doubles. The O(n²) pair join is bounded by the
    * SERIES length (a pre-aggregated daily/hourly axis — the
    * documented-small class; ~2.4k days → ~2.9M pairs), never raw
    * rows. Returns one row (n_points, n_pairs, slope, intercept). */
  def theilSen(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y")).localCheckpoint(true)
    val slopes = pts.as("a").join(pts.as("b"), col("b.x") > col("a.x"))
      .select(((col("b.y") - col("a.y")).cast("double") /
        (col("b.x") - col("a.x")).cast("double")).as("slope"))
    def lowerMedian(in: DataFrame, c: String): DataFrame = {
      val perV = in.groupBy(col(c).as("v")).agg(count(lit(1)).as("k"))
      val tot = perV.agg(sum(col("k")).as("tot"))
      val wc = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perV.withColumn("cum", sum(col("k")).over(wc))
        .crossJoin(broadcast(tot))
        .filter(col("cum") * 2 >= col("tot"))
        .agg(min(col("v")).as(c), min(col("tot")).as("__n"))
    }
    val med = lowerMedian(slopes, "slope")
    val resid = pts.crossJoin(broadcast(med.select(col("slope"))))
      .select((col("y").cast("double") -
        col("slope") * col("x").cast("double")).as("r"))
    val medB = lowerMedian(resid, "r")
    pts.agg(count(lit(1)).as("n_points"))
      .crossJoin(broadcast(med))
      .crossJoin(broadcast(medB.select(col("r").as("intercept"))))
      .select(col("n_points"), col("__n").as("n_pairs"), col("slope"),
        col("intercept"))
  }

  /** Calibration / reliability bins for any [0,1] confidence score
    * against a binary label — the "is the quality classifier's 0.9
    * actually right 90% of the time?" report every scored-corpus
    * pipeline needs before thresholding. Equal-width bins via
    * floor(s·nBins) (clamped to the top bin); per bin the mean
    * confidence accumulates 9-dp-rounded score terms in
    * DECIMAL(38,12) (the chiSquare partition-order-free discipline)
    * while the observed positive rate is exact integers — one
    * division each at the end, and the |conf − obs| gap is computed
    * on the ROUNDED pair so the oracle replays it verbatim. ONE
    * groupBy, no window/join. Returns (bin, n, conf, obs, gap). */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 2)
    val s = score.cast("double")
    val b = least(floor(s * nBins).cast("long"), lit(nBins - 1L))
    val agg = df.select(b.as("bin"),
        round(s, 9).cast("decimal(38,12)").as("sterm"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("sterm")).as("ssum"),
        sum(col("y")).as("ypos"))
    agg.select(col("bin"), col("n"),
        round(col("ssum").cast("double") / col("n").cast("double"), 6)
          .as("conf"),
        round(col("ypos").cast("double") / col("n").cast("double"), 6)
          .as("obs"))
      .withColumn("gap", round(abs(col("conf") - col("obs")), 6))
  }

  /** Per-group weighted median: the smallest value whose cumulative
    * weight reaches half the group total (2·cumw ≥ totw, all-integer
    * once weights are cast to DECIMAL — no interpolation, so the
    * answer is always an observed value and the oracle replays it
    * exactly). One groupBy collapse per (group, value), one
    * per-group cumulative window, one min — the robust center for
    * skewed weighted data (token-weighted doc length, spend-weighted
    * price). Returns (group, tot_w, w_median). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perV = df.select(col(groupCol).as("g"),
        col(valueCol).cast("double").as("v"),
        col(weightCol).cast("decimal(38,6)").as("w"))
      .groupBy(col("g"), col("v")).agg(sum(col("w")).as("kw"))
    // Per-group cumulative weight WITHOUT a per-group window: a window
    // partitioned by a low-cardinality group column puts each group's
    // ENTIRE value set through one task (3 tasks carried this gate's
    // whole cost at sf0.1, and at 100 TB a group is data-sized). Use
    // the global two-level prefix scan ordered by (g, v) — parallel
    // across range partitions — and subtract each group's start
    // offset, computed from the per-group totals (bounded by the
    // group-key cardinality, tiny window). Decimal sums are exact, so
    // regrouping the additions cannot change any value.
    val pre = OrderedPrefix.withPrefixSum(perV,
      Seq(col("g"), col("v")), col("kw"), "__gcum")
    val gtot = perV.groupBy(col("g")).agg(sum(col("kw")).as("totw"))
    val goff = gtot.withColumn("__goff",
      coalesce(sum(col("totw")).over(Window.orderBy(col("g"))
        .rowsBetween(Window.unboundedPreceding, -1)),
        lit(BigDecimal(0)).cast(gtot.schema("totw").dataType)))
    pre.join(broadcast(goff), Seq("g"))
      .filter((col("__gcum") - col("__goff")) * 2 >= col("totw"))
      .groupBy(col("g").as(groupCol))
      .agg(min(col("totw")).cast("double").as("tot_w"),
        min(col("v")).as("w_median"))
  }

  /** One-way ANOVA F across groups — the parametric sibling of
    * [[kruskalWallis]] (use this when the level differences matter,
    * ranks when outliers do):
    *   SSB = Σ_g S_g²/n_g − S²/n,  SSW = Q − Σ_g S_g²/n_g,
    *   F = (SSB/(k−1)) / (SSW/(n−k)).
    * Group sums S_g, S, Q are exact integers (pass an integer-valued
    * column); each S²/n term is one deterministic double division
    * rounded 6 dp and re-summed in DECIMAL(38,12), so both engines
    * replay the partition-order-free total. Two hash aggregates.
    * Returns (n, k, ssb, ssw, f); f NULL when dof or SSW degenerate. */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,12)")
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val per = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("ng"), sum(col(valueCol).cast("long")).as("sg"),
        // x² in DECIMAL(38,0): overflows BIGINT past |x| ~ 3·10⁹
        sum(d0(col(valueCol)) * d0(col(valueCol))).as("qg"))
    val agg = per.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
      sum(col("sg")).as("s"), sum(col("qg")).as("q"),
      sum(dec(round(col("sg").cast("double") * col("sg").cast("double") /
        col("ng").cast("double"), 6))).as("a"))
    agg.select(col("n"), col("k"),
        (col("a") - dec(round(col("s").cast("double") * col("s").cast("double")
          / col("n").cast("double"), 6))).as("__ssb"),
        (dec(col("q")) - col("a")).as("__ssw"))
      .select(col("n"), col("k"),
        round(col("__ssb").cast("double"), 4).as("ssb"),
        round(col("__ssw").cast("double"), 4).as("ssw"),
        when(col("k") > 1 && col("n") > col("k") && col("__ssw") > 0,
          round((col("__ssb").cast("double") / (col("k") - 1).cast("double")) /
            (col("__ssw").cast("double") / (col("n") - col("k")).cast("double")),
            6)).as("f"))
  }

  /** Brown–Forsythe test (the robust Levene variant) — "are the
    * group VARIANCES equal?", the assumption [[anovaF]] itself quietly
    * makes and the scale-difference detector when means are equal:
    * transform each value to its absolute deviation from the GROUP
    * MEDIAN (median, not mean — that's what makes it robust to heavy
    * tails), then run the standard one-way F on the deviations.
    * The median is the exact lower order statistic (first element
    * with 2i ≥ n — integer, no interpolation), so the deviations are
    * integers and the F chain is [[anovaF]]'s exact-sum machinery
    * verbatim. Returns anovaF's (n, k, ssb, ssw, f) over |x − med|.
    * Scale: one per-group window for the median + one broadcast-dim
    * join back + the single-pass F aggregation. */
  def brownForsythe(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"),
      round(col(valueCol), 0).cast("long").as("v"))
    val wOrd = Window.partitionBy(col("g")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("g"))
    val med = base
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__i") * 2 >= col("__n"))
      .groupBy(col("g")).agg(min(col("v")).as("__med"))
    base.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") - col("__med")).as("y"))
      .transform(anovaF(_, "g", "y"))
  }

  /** Per-group mode — the most frequent value with a DETERMINISTIC
    * tie-break (highest count, then smallest value), the core SQL
    * aggregate engines ship with unspecified tie order (DuckDB's
    * mode(), Spark's mode() both document "any"): that looseness is
    * exactly what a replayable pipeline can't use, so this pins it.
    * One hash aggregation to (group, value) counts + a per-group
    * top-1 window over the distinct-value grid (bounded by the value
    * domain, not the corpus). Returns (grp, mode, n_mode). */
  def modePerGroup(df: DataFrame, grpCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(grpCol).cast("string").as("grp"),
        round(col(valueCol), 0).cast("long").as("v"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("n").desc, col("v"))
    counts.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("grp"), col("v").as("mode"), col("n").as("n_mode"))
  }

  /** Two-way ANOVA with interaction (Type-I sequential sums on the
    * cell means) — [[anovaF]] answers "does factor A matter?"; this
    * answers the question one-way tests CANNOT: "do A and B
    * INTERACT?" (an interaction F ≫ 1 means per-A reports are
    * misleading without conditioning on B). Cell/marginal sums are
    * exact integers; every S²/n correction term rounds 6 dp into
    * DECIMAL(38,12) (the anovaF discipline), and
    *   SSA = Σ_a S_a²/n_a − C,   SSB = Σ_b S_b²/n_b − C,
    *   SSAB = Σ_ab S_ab²/n_ab − SSA − SSB − C,  C = S²/n,
    *   SSW = Σx² − Σ_ab S_ab²/n_ab.
    * F ratios close in one double chain (dfA = a−1, dfB = b−1,
    * dfAB = (a−1)(b−1), dfW = n − ab). Unbalanced designs make these
    * the sequential (not marginal) sums — documented, deterministic.
    * Returns one row (n, a, b, ssa, ssb, ssab, ssw, f_a, f_b, f_ab).
    * Scale: ONE hash aggregation to the ab cell grid; everything
    * after runs on ≤ a·b rows. */
  def twoWayAnova(df: DataFrame, aCol: String, bCol: String,
      valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,12)")
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("long")).as("s"),
        sum(d0(col(valueCol)) * d0(col(valueCol))).as("q"))
      .localCheckpoint(true)
    def corr(s: Column, n: Column) =
      dec(round(s.cast("double") * s.cast("double") / n.cast("double"), 6))
    val aMarg = cells.groupBy(col("a"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      .agg(count(lit(1)).as("ka"), sum(corr(col("s"), col("n"))).as("ta"))
    val bMarg = cells.groupBy(col("b"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      .agg(count(lit(1)).as("kb"), sum(corr(col("s"), col("n"))).as("tb"))
    val cell = cells.agg(count(lit(1)).as("kab"),
      sum(corr(col("s"), col("n"))).as("tab"),
      sum(col("n")).as("n"), sum(col("s")).as("s"), sum(dec(col("q"))).as("q"))
    val j = cell.crossJoin(broadcast(aMarg)).crossJoin(broadcast(bMarg))
      .withColumn("c0", corr(col("s"), col("n")))
      .withColumn("ssa", col("ta") - col("c0"))
      .withColumn("ssb", col("tb") - col("c0"))
      .withColumn("ssab",
        col("tab") - col("ta") - col("tb") + col("c0"))
      .withColumn("ssw", col("q") - col("tab"))
    val dd = (c: Column) => c.cast("double")
    def f(ss: Column, dfx: Column) =
      when(dfx > 0 && col("ssw") > 0 && col("n") > col("kab"),
        round((dd(ss) / dd(dfx)) /
          (dd(col("ssw")) / dd(col("n") - col("kab"))), 6))
    j.select(col("n"), col("ka").as("a"), col("kb").as("b"),
      round(dd(col("ssa")), 4).as("ssa"),
      round(dd(col("ssb")), 4).as("ssb"),
      round(dd(col("ssab")), 4).as("ssab"),
      round(dd(col("ssw")), 4).as("ssw"),
      f(col("ssa"), col("ka") - 1).as("f_a"),
      f(col("ssb"), col("kb") - 1).as("f_b"),
      f(col("ssab"), (col("ka") - 1) * (col("kb") - 1)).as("f_ab"))
  }

  /** Welch's unequal-variance t-test — the two-sample comparison that
    * does NOT assume equal spreads (q_p34's z assumes big-n, q_p40's
    * d is an effect size, pooled-variance t silently assumes
    * homoskedasticity — exactly what [[brownForsythe]] is there to
    * refute):
    *   t = (m_a − m_b)/√(v_a/n_a + v_b/n_b),
    *   df = (v_a/n_a + v_b/n_b)² / ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))
    * (Welch–Satterthwaite). Exact integer sums (x² in DECIMAL(38,0)),
    * one fixed double chain, both rounded 6 dp; NULL on degenerate
    * groups. Returns (n_a, n_b, mean_a, mean_b, t, df). */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val per = df.filter(col(groupCol).isin(a, b))
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("long")).as("s"),
        sum(d0(col(valueCol)) * d0(col(valueCol))).as("q"))
    def pick(g: String, c: String) = max(when(col("g") === g, col(c)))
    val w = per.agg(pick(a, "n").as("n_a"), pick(a, "s").as("s_a"),
      pick(a, "q").as("q_a"), pick(b, "n").as("n_b"),
      pick(b, "s").as("s_b"), pick(b, "q").as("q_b"))
    def variance(n: Column, s: Column, q: Column) =
      dd(d0(n) * q - d0(s) * d0(s)) / dd(n * (n - 1))
    val va = variance(col("n_a"), col("s_a"), col("q_a"))
    val vb = variance(col("n_b"), col("s_b"), col("q_b"))
    val ua = va / dd(col("n_a"))
    val ub = vb / dd(col("n_b"))
    val ma = dd(col("s_a")) / dd(col("n_a"))
    val mb = dd(col("s_b")) / dd(col("n_b"))
    val ok = col("n_a") > 1 && col("n_b") > 1 && (ua + ub) > 0
    w.select(col("n_a"), col("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      when(ok, round((ma - mb) / sqrt(ua + ub), 6)).as("t"),
      when(ok, round((ua + ub) * (ua + ub) /
        (ua * ua / dd(col("n_a") - 1) + ub * ub / dd(col("n_b") - 1)), 6))
        .as("df"))
  }

  /** Fisher-z confidence intervals for a set of correlations — the
    * error bars [[corrMatrix]]'s point estimates ship without (two
    * r = 0.3's mean different things at n = 50 vs n = 5M):
    *   z = atanh(r),  z ± 1.96/√(n−3),  back through tanh.
    * atanh/tanh expand to ln/exp with every transcendental result
    * rounded 9 dp before reuse (the powerlaw ln discipline), so both
    * engines replay the chain; endpoints round 6 dp, NULL at |r| = 1
    * or n ≤ 3. Input: rows (x, y, r) + the sample size. Returns
    * (x, y, r, lo, hi). */
  def fisherCi(corr: DataFrame, n: Column): DataFrame = {
    val ok = abs(col("r")) < 1 && n > 3
    val z = round(lit(0.5) * log((lit(1.0) + col("r")) /
      (lit(1.0) - col("r"))), 9)
    val se = round(lit(1.96) / sqrt((n - 3).cast("double")), 9)
    def back(zz: Column) = {
      val e = round(exp(lit(2.0) * zz), 9)
      round((e - 1) / (e + 1), 6)
    }
    corr.select(col("x"), col("y"), col("r"),
      when(ok, back(z - se)).as("lo"),
      when(ok, back(z + se)).as("hi"))
  }

  /** Cochran–Armitage trend test — "does the success proportion RISE
    * (or fall) with the ordered dose?": the categorical test
    * [[chiSquare]] can't be — chi-square treats groups as unordered
    * and throws the ordering away, exactly the information a
    * dose-response question is about. Integer scores w (the group
    * order), exact integer sums; with p̄ = X/N:
    *   T = Σ wᵢxᵢ − p̄ Σ wᵢnᵢ,
    *   V = p̄(1−p̄)(Σ nᵢwᵢ² − (Σ nᵢwᵢ)²/N),   z = T/√V.
    * One hash aggregation to the score grid, one closing double
    * chain, NULL on degenerate variance. Returns
    * (n, n_success, k, t, z). */
  def cochranArmitage(df: DataFrame, scoreCol: Column,
      successCol: Column): DataFrame = {
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val per = df.select(scoreCol.cast("long").as("w"),
        when(successCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("x"))
    val agg = per.agg(sum(col("n")).as("nn"), sum(col("x")).as("xx"),
      count(lit(1)).as("k"),
      sum(d0(col("w")) * d0(col("x"))).as("swx"),
      sum(d0(col("w")) * d0(col("n"))).as("swn"),
      sum(d0(col("w")) * d0(col("w")) * d0(col("n"))).as("swwn"))
    val p = dd(col("xx")) / dd(col("nn"))
    val t = dd(col("swx")) - p * dd(col("swn"))
    val v = p * (lit(1.0) - p) *
      (dd(col("swwn")) - dd(col("swn")) * dd(col("swn")) / dd(col("nn")))
    agg.select(col("nn").as("n"), col("xx").as("n_success"), col("k"),
      round(t, 6).as("t"),
      when(v > 0, round(t / sqrt(v), 6)).as("z"))
  }

  /** Exact per-group percentiles — the ⌈n·q⌉-th order statistics
    * (q_t36's selection rule: integer, no interpolation, bit-exact)
    * for p25/p50/p75/p90 per group, the grouped face the global
    * [[profile]]/approx-percentile pair doesn't give exactly. One
    * rank window per group + one conditional-min aggregate. Returns
    * (grp, n, p25, p50, p75, p90). Scale: the window shuffles on the
    * group key only; the aggregate is map-side combined. */
  def groupPercentiles(df: DataFrame, grpCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("g")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("g"))
    df.select(col(grpCol).cast("string").as("g"),
        round(col(valueCol), 0).cast("long").as("v"))
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .groupBy(col("g").as("grp"))
      .agg(max(col("__n")).as("n"),
        min(when(col("__i") * 4 >= col("__n"), col("v"))).as("p25"),
        min(when(col("__i") * 2 >= col("__n"), col("v"))).as("p50"),
        min(when(col("__i") * 4 >= col("__n") * 3, col("v"))).as("p75"),
        min(when(col("__i") * 10 >= col("__n") * 9, col("v"))).as("p90"))
  }

  /** All-pairs Pearson correlation matrix over integer-scaled numeric
    * columns in ONE aggregation pass — where calling corr() per pair
    * scans the table C(m,2) times, this computes every five-sum
    * (m singles, m squares, C(m,2) crosses, all DECIMAL(38,0) on
    * exact integer units) in a single hash aggregate and unpivots the
    * pair grid from the 1-row result. The
    * [[graft.query.GraphQueries.degreeAssortativity]] discipline per
    * pair: exact until the final sqrt/divide, rounded 6 dp, NULL on
    * zero variance. Returns C(m,2) rows (x, y, r), pair order
    * following the input sequence. */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      cols.map { case (nm, c) => sum(dec(c)).as(s"s_$nm") } ++
      cols.map { case (nm, c) => sum(dec(c) * dec(c)).as(s"q_$nm") } ++
      cols.combinations(2).map { case Seq((na, ca), (nb, cb)) =>
        sum(dec(ca) * dec(cb)).as(s"x_${na}_$nb") }.toSeq
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairRows = cols.combinations(2).map { case Seq((na, _), (nb, _)) =>
      val varA = dec(col("n")) * col(s"q_$na") - col(s"s_$na") * col(s"s_$na")
      val varB = dec(col("n")) * col(s"q_$nb") - col(s"s_$nb") * col(s"s_$nb")
      val cov = dec(col("n")) * col(s"x_${na}_$nb") -
        col(s"s_$na") * col(s"s_$nb")
      struct(lit(na).as("x"), lit(nb).as("y"),
        when(varA > 0 && varB > 0,
          round(cov.cast("double") /
            (sqrt(varA.cast("double")) * sqrt(varB.cast("double"))), 6))
          .as("r"))
    }.toSeq
    one.select(explode(array(pairRows: _*)).as("p"))
      .select(col("p.x"), col("p.y"), col("p.r"))
  }

  /** Wilson score interval per group — the proportion CI that stays
    * sane at small n and extreme rates (where the naive Wald interval
    * leaves [0,1]; Wilson '27, the interval every experiment dashboard
    * should draw):
    *   center = p̂ + z²/2n,  half = z·sqrt(p̂(1−p̂)/n + z²/4n²),
    *   [lo, hi] = (center ∓ half) / (1 + z²/n).
    * Counts are exact integers from one aggregation pass; the
    * interval is a fixed chain of IEEE double ops on them (mirrored
    * token-for-token in the oracle), rounded 6 dp. Returns per group
    * (grp, n, x, p, lo, hi); NULLs for empty groups never arise (a
    * group exists only if it has rows). */
  def wilsonInterval(units: DataFrame, grpCol: String, success: Column,
      z: Double = 1.96): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val zz = lit(z) * lit(z)
    val nD = d(col("n"))
    val ph = d(col("x")) / nD
    val denom = lit(1.0) + zz / nD
    val center = ph + zz / (nD * 2)
    val half = lit(z) * sqrt(ph * (lit(1.0) - ph) / nD +
      zz / (nD * nD * 4))
    units.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("x"))
      .select(col("grp"), col("n"), col("x"),
        round(ph, 6).as("p"),
        round((center - half) / denom, 6).as("lo"),
        round((center + half) / denom, 6).as("hi"))
  }

  /** Order-free table checksum — the "did the copy/migration corrupt
    * anything" audit that works ACROSS engines: per row the
    * replayable poly fingerprint of the '|'-joined column values,
    * folded two ways (XOR — overflow-free and order-free — and a
    * plain sum for the second opinion: XOR misses a value appearing
    * an even number of times, the sum doesn't; a row-hash built on
    * xxhash would be faster but NOT replayable outside Spark, which
    * defeats the cross-engine purpose). The sum is emitted as BIGINT:
    * per-row fp < 2^31, so a signed 64-bit sum is exact up to ~4.3
    * billion rows — beyond that shard the checksum and combine the
    * per-shard rows (a DECIMAL(38,0) would survive but renders
    * differently across engines, breaking the cross-engine compare
    * this operator exists for). One aggregation pass, map-side
    * combinable. Pass integer-castable / string columns only — float
    * formatting differs across engines. Returns one row
    * (n_rows, xor_fp, sum_fp). */
  def tableChecksum(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(graft.functions.TextStats.fingerprint(
        concat_ws("|", cols: _*)).as("__fp"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__fp)").as("xor_fp"),
        sum(col("__fp")).as("sum_fp"))

  /** Top-decile concentration per group — "what share of the value
    * sits in the top p% of items?", the Pareto readout next to
    * [[giniConcentration]]'s scalar: rank items by value (ties →
    * smaller id), top_n = ⌈n·pct/100⌉ as exact integer arithmetic,
    * share one division of exact integer-cents sums. One partitioned
    * window + one aggregate. Returns
    * (grp, n, top_n, top_cents, total_cents, share). */
  def topShare(df: DataFrame, grpCol: String, valueCents: Column,
      tieCol: Column, pct: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pct >= 1 && pct <= 99)
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("cents").desc, col("tie"))
    val wn = Window.partitionBy(col("grp"))
    df.select(col(grpCol).as("grp"), valueCents.cast("long").as("cents"),
        tieCol.as("tie"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .groupBy(col("grp"))
      .agg(max(col("__n")).as("n"),
        max(expr(s"(__n * $pct + 99) div 100")).as("top_n"),
        sum(when(expr(s"__rk <= (__n * $pct + 99) div 100"), col("cents"))
          .otherwise(0L)).as("top_cents"),
        sum(col("cents")).as("total_cents"))
      .select(col("grp"), col("n"), col("top_n"), col("top_cents"),
        col("total_cents"),
        when(col("total_cents") > 0,
          round(col("top_cents").cast("double") /
            col("total_cents").cast("double"), 6)).as("share"))
  }

  /** EXACT distributed quantiles by order-statistic selection — the
    * first-class face of [[OrderedPrefix]]'s two-level rank: for each
    * requested per-mille point q, the ⌈n·q/1000⌉-th smallest VALUE
    * (type-1 quantile — an actual observed element, no interpolation,
    * so integer inputs replay bit-for-bit in any engine; the q_t36
    * selection rule promoted from a gate-internal trick to an
    * operator). `approx_percentile` trades exactness for one pass;
    * Spark's exact `percentile` buffers per-group value maps in
    * memory; this face is exact AND distributed: global rank via
    * range-repartitioned partitioned windows + a cluster-bounded
    * offsets table, selection via one tie-invariant aggregate, output
    * unpivoted from the single wide row (the stack runs over |qs|
    * columns, never data). Returns (q_permille, n, value), NULL value
    * on empty input. */
  def exactQuantiles(df: DataFrame, valueCol: Column,
      qsPermille: Seq[Int]): DataFrame = {
    require(qsPermille.nonEmpty &&
      qsPermille.forall(q => q >= 1 && q <= 1000),
      s"per-mille points must be in [1,1000]: $qsPermille")
    val qs = qsPermille.distinct.sorted
    val idx = OrderedPrefix.withRowIndex(
      df.select(valueCol.cast("long").as("v")), Seq(col("v")), "__i", "__n")
    val wide = idx.agg(
      max(col("__n")).as("n"),
      qs.map(q => min(when(col("__i") * 1000 >= col("__n") * q, col("v")))
        .as(s"__q$q")): _*)
    val stacked = qs.map(q => s"$q, __q$q").mkString(", ")
    wide.select(col("n"),
        expr(s"stack(${qs.size}, $stacked) AS (q_permille, value)"))
      .select(col("q_permille").cast("long").as("q_permille"), col("n"),
        col("value"))
  }

  /** [[exactQuantiles]] per group WITHOUT per-group windows: a window
    * partitioned by a low-cardinality group column still funnels each
    * group — potentially corpus-sized — through one task. Instead the
    * GLOBAL [[OrderedPrefix]] rank over the composite order
    * (grp, value) is computed once (every partition stays
    * range-balanced regardless of group skew), and each group's
    * internal rank is recovered by subtracting the group's starting
    * offset — a groups-sized aggregate, broadcast back. Selection is
    * then the same tie-invariant ⌈n_g·q/1000⌉ rule per (group, q).
    * Returns (grp, q_permille, n, value), integer-exact. */
  def exactQuantilesPerGroup(df: DataFrame, grpCol: Column,
      valueCol: Column, qsPermille: Seq[Int]): DataFrame = {
    require(qsPermille.nonEmpty &&
      qsPermille.forall(q => q >= 1 && q <= 1000),
      s"per-mille points must be in [1,1000]: $qsPermille")
    val qs = qsPermille.distinct.sorted
    val idx = OrderedPrefix.withRowIndex(
      df.select(grpCol.cast("string").as("grp"),
        valueCol.cast("long").as("v")),
      Seq(col("grp"), col("v")), "__i", "__n")
    val offsets = idx.groupBy(col("grp"))
      .agg(min(col("__i")).as("__start"), count(lit(1)).as("__ng"))
      .withColumnRenamed("grp", "__g")
    // null-safe join: a NULL group is a real group (groupBy keeps it;
    // a plain equi-join would silently drop all its rows)
    val ranked = idx.join(broadcast(offsets), col("grp") <=> col("__g"))
      .drop("__g")
      .select(col("grp"), col("v"),
        (col("__i") - col("__start") + 1).as("__r"), col("__ng"))
    val wide = ranked.groupBy(col("grp")).agg(
      max(col("__ng")).as("n"),
      qs.map(q => min(when(col("__r") * 1000 >= col("__ng") * q, col("v")))
        .as(s"__q$q")): _*)
    val stacked = qs.map(q => s"$q, __q$q").mkString(", ")
    wide.select(col("grp"), col("n"),
        expr(s"stack(${qs.size}, $stacked) AS (q_permille, value)"))
      .select(col("grp"), col("q_permille").cast("long").as("q_permille"),
        col("n"), col("value"))
  }

  /** Exact higher moments per group — skewness and excess kurtosis
    * from the four integer power sums (x² through x⁴ in
    * DECIMAL(38,0); Spark's built-in skewness/kurtosis stream floats
    * and are partition-order wobbly — these replay bit-for-bit):
    *   m2 = r1 − μ², m3 = r2 − 3μr1 + 2μ³,
    *   m4 = r3 − 4μr2 + 6μ²r1 − 3μ⁴  (r_k the raw k+1 moments),
    *   skew = m3/(m2·√m2), kurt = m4/m2² − 3,
    * one fixed double chain mirrored token-for-token in the oracle
    * (√ not pow — smaller libm surface), rounded 6 dp; NULL when m2
    * degenerates. The tail-shape profile of any numeric column.
    * Returns (grp, n, mean, m2, skew, kurt). */
  def moments(df: DataFrame, grpCol: String, valueCol: String): DataFrame = {
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val v = d0(col(valueCol))
    val per = df.groupBy(col(grpCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
    val n = dd(col("n"))
    val mean = dd(col("s1")) / n
    val r1 = dd(col("s2")) / n
    val r2 = dd(col("s3")) / n
    val r3 = dd(col("s4")) / n
    val m2 = r1 - mean * mean
    val m3 = r2 - mean * r1 * 3 + mean * mean * mean * 2
    val m4 = r3 - mean * r2 * 4 + mean * mean * r1 * 6 -
      mean * mean * mean * mean * 3
    per.select(col("grp"), col("n"), round(mean, 6).as("mean"),
      round(m2, 6).as("m2"),
      when(m2 > 0, round(m3 / (m2 * sqrt(m2)), 6)).as("skew"),
      when(m2 > 0, round(m4 / (m2 * m2) - 3, 6)).as("kurt"))
  }

  /** Jarque–Bera normality statistic per group — the one-number
    * answer to "can I use z-tests on this column at all?" that the
    * whole q_p34/q_p35 parametric family quietly assumes:
    *   JB = n/6 · (S² + K²/4)
    * with S the skewness and K the EXCESS kurtosis, both from the
    * same exact integer power sums as [[moments]] (four DECIMAL(38,0)
    * aggregates, one fixed double chain — the q_p42 gate already
    * proves that chain replays bit-exactly). JB ~ χ²(2) under
    * normality, so JB ≫ 6 says the tails are lying. NULL on zero
    * variance. Returns (grp, n, skew, kurt, jb). Scale: one hash
    * aggregation pass, no window, no second scan. */
  def jarqueBera(df: DataFrame, grpCol: String,
      valueCol: String): DataFrame = {
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val v = d0(col(valueCol))
    val per = df.groupBy(col(grpCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
    val n = dd(col("n"))
    val mean = dd(col("s1")) / n
    val r1 = dd(col("s2")) / n
    val r2 = dd(col("s3")) / n
    val r3 = dd(col("s4")) / n
    val m2 = r1 - mean * mean
    val m3 = r2 - mean * r1 * 3 + mean * mean * mean * 2
    val m4 = r3 - mean * r2 * 4 + mean * mean * r1 * 6 -
      mean * mean * mean * mean * 3
    val skew = m3 / (m2 * sqrt(m2))
    val kurt = m4 / (m2 * m2) - 3
    per.select(col("grp"), col("n"),
      when(m2 > 0, round(skew, 6)).as("skew"),
      when(m2 > 0, round(kurt, 6)).as("kurt"),
      when(m2 > 0,
        round(n / 6 * (skew * skew + kurt * kurt / 4), 6)).as("jb"))
  }

  /** Cohen's d between two groups — the effect SIZE companion to the
    * significance tests (a z of 40 on 10M rows can mean a difference
    * nobody would notice; d says how many pooled standard deviations
    * apart the means actually are):
    *   d = (m_a − m_b) / s_p,  s_p² = ((n_a−1)s_a² + (n_b−1)s_b²)
    *                                   / (n_a+n_b−2).
    * Exact integer sums (x² in DECIMAL(38,0)) off one filtered
    * aggregate pass, pivoted with conditional aggregates; the means,
    * variances and d are one fixed double chain on those integers,
    * rounded 6 dp, NULL on degenerate n or zero pooled variance.
    * Returns (n_a, n_b, mean_a, mean_b, d). */
  def cohensD(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val per = df.filter(col(groupCol).isin(a, b))
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("long")).as("s"),
        sum(d0(col(valueCol)) * d0(col(valueCol))).as("q"))
    def pick(g: String, c: String) = max(when(col("g") === g, col(c)))
    val w = per.agg(pick(a, "n").as("n_a"), pick(a, "s").as("s_a"),
      pick(a, "q").as("q_a"), pick(b, "n").as("n_b"),
      pick(b, "s").as("s_b"), pick(b, "q").as("q_b"))
    def variance(n: Column, s: Column, q: Column) =
      dd(d0(n) * q - d0(s) * d0(s)) / dd(n * (n - 1))
    val va = variance(col("n_a"), col("s_a"), col("q_a"))
    val vb = variance(col("n_b"), col("s_b"), col("q_b"))
    val sp2 = (dd(col("n_a") - 1) * va + dd(col("n_b") - 1) * vb) /
      dd(col("n_a") + col("n_b") - 2)
    val ma = dd(col("s_a")) / dd(col("n_a"))
    val mb = dd(col("s_b")) / dd(col("n_b"))
    w.select(col("n_a"), col("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      when(col("n_a") > 1 && col("n_b") > 1 && sp2 > 0,
        round((ma - mb) / sqrt(sp2), 6)).as("d"))
  }

  /** First-order partial correlation — "does x still track y once z
    * is held fixed?", the confound screen run before believing any
    * pairwise correlation:
    *   r_xy·z = (r_xy − r_xz·r_yz) / sqrt((1 − r_xz²)(1 − r_yz²)).
    * Built ON [[corrMatrix]]'s single-pass rounded-6-dp pairwise rs
    * (pivoted from its three rows with conditional aggregates — no
    * second scan), so determinism is inherited; NULL when either
    * control correlation is ±1 (zero residual variance). Returns one
    * row (r_xy, r_xz, r_yz, r_xy_given_z). */
  def partialCorr(df: DataFrame, x: (String, Column), y: (String, Column),
      z: (String, Column)): DataFrame = {
    def pick(a: String, b: String) =
      max(when(col("x") === a && col("y") === b, col("r")))
    val m = corrMatrix(df, Seq(x, y, z))
      .agg(pick(x._1, y._1).as("r_xy"), pick(x._1, z._1).as("r_xz"),
        pick(y._1, z._1).as("r_yz"))
    val den = (lit(1.0) - col("r_xz") * col("r_xz")) *
      (lit(1.0) - col("r_yz") * col("r_yz"))
    m.select(col("r_xy"), col("r_xz"), col("r_yz"),
      when(den > 0, round((col("r_xy") - col("r_xz") * col("r_yz")) /
        sqrt(den), 6)).as("r_xy_given_z"))
  }

  /** Two-proportion pooled z-test — the A/B conversion readout run
    * AFTER [[graft.ext.Sampling.srmCheck]] clears the split:
    *   z = (p̂_A − p̂_B) / sqrt( p̂(1−p̂)(1/n_A + 1/n_B) ),
    * p̂ pooled. Input: one row per UNIT (dedupe before calling — a
    * per-event call would double-count returning users) with a
    * boolean arm and a boolean success. Every count is an exact
    * integer off one aggregation pass; the three reported rates and
    * z are divisions/sqrt of those integers rounded 6 dp; z NULL
    * when either arm is empty or the pooled rate is degenerate (0 or
    * 1 — no variance). Returns
    * (n_a, x_a, n_b, x_b, p_a, p_b, z). */
  def twoProportionZ(units: DataFrame, armA: Column,
      success: Column): DataFrame = {
    def cnt(arm: Boolean, onlySuccess: Boolean) =
      sum(when(armA === lit(arm) && (lit(!onlySuccess) || success),
        1L).otherwise(0L))
    val d = (c: Column) => c.cast("double")
    units.agg(cnt(arm = true, onlySuccess = false).as("n_a"),
        cnt(arm = true, onlySuccess = true).as("x_a"),
        cnt(arm = false, onlySuccess = false).as("n_b"),
        cnt(arm = false, onlySuccess = true).as("x_b"))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        when(col("n_a") > 0, round(d(col("x_a")) / d(col("n_a")), 6)).as("p_a"),
        when(col("n_b") > 0, round(d(col("x_b")) / d(col("n_b")), 6)).as("p_b"),
        when(col("n_a") > 0 && col("n_b") > 0 &&
            col("x_a") + col("x_b") > 0 &&
            col("x_a") + col("x_b") < col("n_a") + col("n_b"),
          round((d(col("x_a")) / d(col("n_a")) - d(col("x_b")) / d(col("n_b")))
            / sqrt((d(col("x_a") + col("x_b")) / d(col("n_a") + col("n_b")))
              * (lit(1.0) - d(col("x_a") + col("x_b")) / d(col("n_a") + col("n_b")))
              * (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))), 6))
          .as("z"))
  }

  /** Mutual information + entropies of two categorical columns — the
    * information-theoretic association the χ²/V pair can't give (MI
    * is the feature-selection currency: "how many bits does knowing
    * the source tell you about the language?"). Observed cells
    * suffice here — unlike χ², an empty cell's p·log term is exactly
    * 0. Each term p·log2(obs·n/(rt·ct)) has only exact-integer
    * arguments, rounds 9 dp, and sums in DECIMAL(38,12); the two
    * marginal entropies ride the same ladder, and
    * NMI = MI/sqrt(H_a·H_b) closes it. One cells aggregate + two
    * broadcast margins (the [[chiSquare]] shape). Returns
    * (n, h_a, h_b, mi, nmi); NMI NULL when either margin is
    * deterministic (zero entropy). */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,12)")
    val cells = df.groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("obs")).localCheckpoint(true)
    val rt = cells.groupBy(col("a")).agg(sum(col("obs")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("obs")).as("ct"))
    val n = cells.agg(sum(col("obs")).as("n"))
    def hTerm(cnt: Column) = dec(round(cnt.cast("double") / col("n").cast("double")
      * log2(col("n").cast("double") / cnt.cast("double")), 9))
    val ha = rt.crossJoin(broadcast(n))
      .agg(sum(hTerm(col("rt"))).as("ha"))
    val hb = ct.crossJoin(broadcast(n))
      .agg(sum(hTerm(col("ct"))).as("hb"))
    val mi = cells.join(broadcast(rt), Seq("a")).join(broadcast(ct), Seq("b"))
      .crossJoin(broadcast(n))
      .select(dec(round(col("obs").cast("double") / col("n").cast("double") *
        log2(col("obs").cast("double") * col("n").cast("double") /
          (col("rt").cast("double") * col("ct").cast("double"))), 9)).as("t"))
      .agg(sum(col("t")).as("mi"))
    n.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .crossJoin(broadcast(mi))
      .select(col("n"),
        round(col("ha").cast("double"), 6).as("h_a"),
        round(col("hb").cast("double"), 6).as("h_b"),
        round(col("mi").cast("double"), 6).as("mi"),
        when(col("ha") > 0 && col("hb") > 0,
          round(col("mi").cast("double") /
            sqrt(col("ha").cast("double") * col("hb").cast("double")), 6))
          .as("nmi"))
  }

  /** Cramér's V atop [[chiSquare]] — the effect SIZE the chi-square
    * significance screen doesn't give (a huge n makes any trivial
    * association "significant"; V ∈ [0,1] says whether it matters):
    *   V = sqrt(χ² / (n · min(r−1, c−1))).
    * Computed from the already-deterministic rounded χ², one sqrt +
    * division rounded 6 dp; NULL for a degenerate 1×c / r×1 table.
    * Returns the chiSquare row plus (min_dof, v). */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame =
    chiSquare(df, aCol, bCol)
      .withColumn("min_dof",
        least(col("n_rows_cat") - 1, col("n_cols_cat") - 1))
      .withColumn("v", when(col("min_dof") > 0,
        round(sqrt(col("chi2") /
          (col("n") * col("min_dof")).cast("double")), 6)))

  /** McNemar's test on the DISCORDANT cells of two boolean raters
    * (McNemar '47) — where [[cohensKappa]] asks "do they agree?",
    * this asks "is one systematically stricter?": only the b = (A,¬B)
    * and c = (¬A,B) disagreements carry signal, and
    *   χ² = (|b−c|−1)² / (b+c)  (continuity-corrected)
    * is large when the disagreements run one way. Exact integers off
    * one pass; NULL when the raters never disagree. Returns
    * (n, b, c, chi2_mcnemar). */
  def mcnemar(df: DataFrame, raterA: Column, raterB: Column): DataFrame =
    df.agg(count(lit(1)).as("n"),
        sum(when(raterA && !raterB, 1L).otherwise(0L)).as("b"),
        sum(when(!raterA && raterB, 1L).otherwise(0L)).as("c"))
      .select(col("n"), col("b"), col("c"),
        when(col("b") + col("c") > 0,
          round((abs(col("b") - col("c")) - 1).cast("double") *
            (abs(col("b") - col("c")) - 1).cast("double") /
            (col("b") + col("c")).cast("double"), 6)).as("chi2_mcnemar"))

  /** Cohen's kappa between two boolean raters — the chance-corrected
    * agreement score a weak-supervision pipeline runs before trusting
    * two heuristic labelers (Cohen 1960). The whole statistic reduces
    * to the 2×2 confusion counts, and the chance correction cancels
    * into one exact integer ratio:
    *   kappa = (n·(n00+n11) − E) / (n² − E),
    *   E = (n00+n01)(n00+n10) + (n10+n11)(n01+n11)
    * — so besides the three reported doubles (po, pe, kappa, each one
    * division of exact BIGINTs rounded 6 dp) nothing floats. ONE
    * aggregation pass; raters are arbitrary boolean Columns evaluated
    * map-side. Returns (n, n00, n01, n10, n11, po, pe, kappa); kappa
    * NULL when chance agreement is total (n² = E). */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    def cnt(a: Boolean, b: Boolean) =
      sum(when(raterA === lit(a) && raterB === lit(b), 1L).otherwise(0L))
    val e = ((col("n00") + col("n01")) * (col("n00") + col("n10"))
      + (col("n10") + col("n11")) * (col("n01") + col("n11")))
    df.agg(count(lit(1)).as("n"), cnt(false, false).as("n00"),
        cnt(false, true).as("n01"), cnt(true, false).as("n10"),
        cnt(true, true).as("n11"))
      .select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
        round((col("n00") + col("n11")).cast("double") /
          col("n").cast("double"), 6).as("po"),
        round(e.cast("double") /
          (col("n") * col("n")).cast("double"), 6).as("pe"),
        when(col("n") * col("n") =!= e,
          round((col("n") * (col("n00") + col("n11")) - e).cast("double") /
            (col("n") * col("n") - e).cast("double"), 6)).as("kappa"))
  }

  /** Calibration / reliability report (the ECE decomposition of
    * Naeini '15 / Guo '17): bin a confidence column into `bins`
    * equal-width buckets and compare each bucket's MEAN CONFIDENCE
    * to its EMPIRICAL ACCURACY — the audit run on every learned
    * scorer (a quality classifier whose 0.9-confidence slice is
    * right 60% of the time poisons every threshold set from it).
    * Confidence is pre-rounded to 4 dp and summed in DECIMAL(38,12)
    * (exact, order-free); counts are integers; each row carries its
    * |acc − conf| gap and the n-weighted total is the expected
    * calibration error, repeated per row via the 1-row broadcast
    * crossJoin convention. One hash aggregation over the corpus.
    * Returns (bin, n, n_pos, mean_conf, acc, gap, ece) per non-empty
    * bin, bin = ⌊conf·bins⌋ clamped into [0, bins−1] (a confidence
    * outside [0,1] — a buggy scorer — lands in the edge bin instead
    * of minting phantom negative/overflow bins that would skew the
    * n-weighted ECE). */
  def calibrationReport(df: DataFrame, confCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins must be in [2,100]: $bins")
    val conf = round(confCol, 4)
    val per = df.select(
        greatest(lit(0L),
          least(floor(conf * bins).cast("long"), lit(bins - 1L))).as("bin"),
        conf.cast("decimal(38,12)").as("__c"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__c")).as("__sc"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__sc").cast("double") / col("n").cast("double"), 6)
          .as("mean_conf"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("acc"))
      .withColumn("gap", round(abs(col("acc") - col("mean_conf")), 6))
    // exact decimal numerator, then ONE double division — a decimal
    // divide would hit engine-specific result-scale rules
    val tot = per.agg(
      round(sum(col("gap").cast("decimal(38,12)") * col("n")).cast("double") /
        sum(col("n")).cast("double"), 6).as("ece"))
    per.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"), col("mean_conf"),
        col("acc"), col("gap"), col("ece"))
  }

  /** SIMULATED differentially-private category counts — the Laplace
    * mechanism's SHAPE (Dwork et al. '06: n + Lap(Δ/ε), sensitivity
    * Δ = 1), with the noise drawn by inverse-CDF from a SEEDED
    * deterministic uniform (the [[Sketches.kmvHash]] of `seed:cell`
    * mapped to u ∈ (0,1)) so a release replays bit-for-bit and an
    * oracle can verify it.
    *
    * NOT a privacy guarantee as shipped: because the noise is a
    * deterministic public function of (seed, cell), anyone who knows
    * the seed recomputes the noise exactly and recovers the true
    * counts — for a FIXED KNOWN seed, neighboring datasets produce
    * outputs that differ deterministically by exactly 1, so no finite
    * ε holds. This operator is the replayable MECHANICS demo (the
    * pipeline plumbing, sensitivity accounting and inverse-CDF math
    * are real); a production release needs `seed` to be a
    * caller-supplied SECRET high-entropy value that is never
    * published — then the guarantee is computational DP under the
    * assumption that the seeded hash is a PRF — and each published
    * release must use a fresh secret seed (sequential composition:
    * k releases cost k·ε on the caller's ledger). The gate oracle
    * (q_s13) intentionally pins a public demo seed; do NOT reuse it
    * with real data. One data-sized hash aggregation; the noise math
    * is a pure Column over the cell table. Returns
    * (grp, n_noisy, eps). */
  def dpNoisyCounts(df: DataFrame, dimCol: String, eps: Double,
      seed: String = "dp1"): DataFrame = {
    require(eps > 0, s"eps must be positive: $eps")
    val cells = df.groupBy(col(dimCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n"))
    val u = (Sketches.kmvHash(concat(lit(seed + ":"), col("grp"))) +
      lit(0.5)) / lit(2147483647.0)
    val z = u - lit(0.5)
    val noise = lit(-1.0 / eps) * signum(z) * log(lit(1.0) - lit(2.0) * abs(z))
    cells.select(col("grp"), round(col("n") + noise, 4).as("n_noisy"),
      lit(eps).as("eps"))
  }
}
