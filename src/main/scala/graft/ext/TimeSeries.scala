package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling faces beyond forward-fill (which lives in
  * the q_t7 gate): linear gap interpolation and OHLC bar
  * downsampling. Reference scope: the reference keeps raw event rows
  * only (dockerapp/app/main.py:229 ingest); these are the
  * map-forward operators a feature/training pipeline derives from
  * that same event stream.
  *
  * Scale design: everything here is one shuffle on the resample key
  * (user, bucket) — grids are generated with `sequence`+`explode`
  * (distributed, no driver loop), fills/interpolation are window
  * functions over the per-user partition, and bars are a single
  * hash aggregate. Per-user cardinality is bounded by the time span,
  * so partitions stay balanced even when event counts skew.
  */
object TimeSeries {

  /** Per-key hourly grid spanning each key's [min(ts), max(ts)],
    * left-joined with the hourly aggregate `agg(valueCol)`; gap
    * buckets carry NULL. Columns: (key, h, v). */
  def hourlyGrid(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val ev = events.select(col(keyCol), col(tsCol).as("__ts"), col(valueCol).as("__v"))
    val hourly = ev.groupBy(col(keyCol), date_trunc("hour", col("__ts")).as("h"))
      .agg(round(sum(col("__v")), 2).as("v"))
    val span = ev.groupBy(col(keyCol))
      .agg(date_trunc("hour", min(col("__ts"))).as("h0"),
        date_trunc("hour", max(col("__ts"))).as("h1"))
    span.select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .join(hourly, Seq(keyCol, "h"), "left")
  }

  /** Linear interpolation over grid gaps: each NULL bucket gets
    * prev + (next - prev) * (steps since prev / steps prev→next);
    * leading gaps back-fill from the first value, trailing gaps
    * forward-fill from the last. The fraction is built from the SAME
    * integer hour indexes on both engine and oracle, so the double
    * arithmetic is bit-identical (IEEE ops in the same order) — the
    * result is emitted RAW, not rounded: interpolated values land on
    * grids like .xxx25/.xxx75 where a fixed round() would tie at the
    * rounding digit and Spark's BigDecimal half-up and DuckDB's
    * round disagree by one ulp (measured at sf0.001). Bit-identical
    * inputs + identical op order means raw doubles hash-match.
    *
    * Input: (key, h, v) from [[hourlyGrid]]. Output adds `v_li`.
    */
  def interpolate(grid: DataFrame, keyCol: String): DataFrame = {
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(0, Window.unboundedFollowing)
    // integral hour index: epoch-micros div 3600e6 (exact on longs)
    val hi = expr("unix_micros(h) div 3600000000")
    val prevV = last(col("v"), ignoreNulls = true).over(wPrev)
    val nextV = first(col("v"), ignoreNulls = true).over(wNext)
    val prevH = last(when(col("v").isNotNull, hi), ignoreNulls = true).over(wPrev)
    val nextH = first(when(col("v").isNotNull, hi), ignoreNulls = true).over(wNext)
    grid
      .withColumn("__pv", prevV).withColumn("__nv", nextV)
      .withColumn("__ph", prevH).withColumn("__nh", nextH)
      .withColumn("v_li",
        when(col("__pv").isNull, col("__nv"))
          .when(col("__nv").isNull, col("__pv"))
          .when(col("__nh") === col("__ph"), col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((hi - col("__ph")).cast("double") /
             (col("__nh") - col("__ph")).cast("double"))))
      .drop("__pv", "__nv", "__ph", "__nh")
  }

  /** OHLC bar downsampling: per (key, hour bucket) the first / max /
    * min / last raw value, ordering ties on (ts, tieCol) so open and
    * close are deterministic. No arithmetic touches the values (they
    * are picked, not computed), so raw doubles compare exactly.
    *
    * ONE aggregate (partial + final around a single hash exchange) —
    * open and close are `min_by`/`max_by` over a zero-padded
    * "(µs, tie)" string key (lexicographic = numeric order; the
    * oracle's arg_min/arg_max take only scalar keys, and a string
    * composite keeps both engines on the same total order). The
    * string buffer makes Spark pick SortAggregate over HashAggregate
    * (partition-local sorts, no extra exchange); the earlier
    * window-plus-distinct formulation sorted every (key, hour)
    * partition AND shuffled again to dedup — at 100 TB the map-side
    * partial agg sends one row per (key, hour) per task instead.
    */
  def ohlcHourly(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val ord = format_string("%020d%011d",
      unix_micros(col(tsCol)), col(tieCol))
    events
      .select(col(keyCol), date_trunc("hour", col(tsCol)).as("h"),
        ord.as("__ord"), col(valueCol).as("__v"))
      .groupBy(col(keyCol), col("h"))
      .agg(min_by(col("__v"), col("__ord")).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max_by(col("__v"), col("__ord")).as("close"),
        count(lit(1)).as("n"))
  }

  /** One-sided CUSUM changepoint screen over each key's hourly series
    * (Page '54 — the classic drift detector): s_i = max(0, s_{i−1} +
    * (v_i − μ)) accumulates only sustained upward departure from the
    * key's own mean, so a level shift ramps the statistic linearly
    * while stationary noise keeps resetting it. The recurrence is
    * NOT folded — it is rewritten through the prefix-sum identity
    * s_i = P_i − min(0, min_{j≤i} P_j) (P = running sum of v − μ), so
    * the whole operator is three window passes over the sorted
    * per-key partition: no collect_list, no per-key array in memory,
    * and no struct-accumulator fold (DuckDB 1.0's list_reduce
    * evaluates struct fields in-place — the accumulator's `s` is
    * already overwritten when a second field reads it, measured on
    * the 68-hour series — so a (s, max) fold pair is unreplayable
    * there). Every window runs in ROWS order by hour, so both
    * engines add the same doubles in the same order. Returns per
    * key: hours, μ, max CUSUM, and the 1-based index of the first
    * hour the statistic crossed `threshold` (null if never). */
  def cusum(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, threshold: Double): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(round(sum(col(valueCol)), 2).as("v"))
    val wAll = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("h"))
    val withS = hourly
      .withColumn("mu", sum(col("v")).over(wAll) / count(lit(1)).over(wAll))
      .withColumn("p", sum(col("v") - col("mu")).over(wRun))
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("s",
        col("p") - least(min(col("p")).over(wRun), lit(0.0)))
    withS.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_hours"),
      round(min(col("mu")), 4).as("mu"),
      round(max(col("s")), 4).as("max_cusum"),
      min(when(col("s") > lit(threshold), col("i"))).as("breach_idx"))
  }

  /** Inter-event burstiness per key (Goh & Barabási 2008,
    * B = (σ−μ)/(σ+μ) over inter-arrival gaps: −1 periodic, 0
    * Poisson, →1 bursty — the temporal fingerprint bot/organic
    * classification uses): gaps in exact epoch-µs via lag, and the
    * variance assembled from INTEGER Σd and Σd² held in
    * DECIMAL(38,0) (Σd² overflows int64 at day-scale gaps), so both
    * engines reach identical doubles before the one sqrt. Keys with
    * fewer than 3 events (2 gaps) are dropped — a sample variance
    * needs n ≥ 2. */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("us"), col(tieCol))
    val gaps = events
      .select(col(keyCol), unix_micros(col(tsCol)).as("us"), col(tieCol))
      .withColumn("d", col("us") - lag(col("us"), 1).over(w))
      .filter(col("d").isNotNull)
    gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("d").cast("decimal(38,0)")).as("sd"),
        // square AFTER the decimal cast: a day-scale gap squared
        // (~1e22) already overflows int64
        sum(col("d").cast("decimal(38,0)") * col("d").cast("decimal(38,0)"))
          .as("sd2"))
      .filter(col("n_gaps") >= 2)
      .withColumn("mu", col("sd").cast("double") / col("n_gaps"))
      .withColumn("sigma",
        sqrt((col("n_gaps") * col("sd2") - col("sd") * col("sd"))
          .cast("double") /
          (col("n_gaps").cast("double") * (col("n_gaps") - 1))))
      .select(col(keyCol), col("n_gaps"),
        round(col("mu"), 2).as("mean_gap_us"),
        round((col("sigma") - col("mu")) / (col("sigma") + col("mu")), 4)
          .as("burstiness"))
  }

  /** Seasonal-naive decomposition of the corpus-wide hourly series:
    * value = trend (centered 24-hour moving average) + seasonal
    * (per hour-of-day mean of the detrended series) + residual — the
    * pre-model seasonality screen. The sliding-frame sum runs over
    * INTEGER CENTS, deliberately: engines disagree on float window
    * aggregation order (DuckDB segment-trees sliding frames, Spark
    * rescans them), but integer addition is associative so the trend
    * is exact; the seasonal means accumulate in DECIMAL(30,10) (the
    * bootstrap convention), and every remaining op is elementwise.
    * Only hours with a complete 24-row frame decompose. Windows run
    * over the GLOBAL hourly series — one row per hour, bounded by
    * the time span, the q_a17 documented-small class. */
  def seasonalDecompose(events: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).as("h"))
      .agg(round(sum(col(valueCol)), 2).as("v0"))
      .select(col("h"), round(col("v0") * 100).cast("long").as("vc"))
    val wFrame = Window.orderBy(col("h")).rowsBetween(-11, 12)
    val framed = hourly
      .withColumn("fs", sum(col("vc")).over(wFrame))
      .withColumn("fn", count(lit(1)).over(wFrame))
      .filter(col("fn") === 24)
      .withColumn("v", col("vc").cast("double") / 100.0)
      .withColumn("trend", col("fs").cast("double") / (100.0 * 24))
      .withColumn("detr", col("v") - col("trend"))
      .withColumn("hod", hour(col("h")).cast("long"))
    val seasonal = framed.groupBy(col("hod"))
      .agg((sum(col("detr").cast("decimal(30,10)")).cast("double")
        / count(lit(1))).as("seasonal"))
    framed.join(broadcast(seasonal), Seq("hod"))
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("hod"), col("v"),
        // trend = fs/2400 lands EXACTLY on .00005 grid points
        // (integer numerator, smooth denominator), where Spark's
        // decimal HALF_UP and DuckDB's binary round() disagree —
        // so round it in integers: (fs·10⁴ + 1200) div 2400
        (expr("(fs * 10000 + 1200) div 2400").cast("double") / 10000.0)
          .as("trend"),
        // seasonal/residual are cent-grid differences that can land
        // EXACTLY on .00005 — where Spark's decimal HALF_UP and
        // DuckDB's binary round() disagree; both engines hold
        // bit-identical doubles here, so a shared 1e-9 bump resolves
        // every tie the same way and moves nothing else
        round(col("seasonal") + lit(1e-9), 4).as("seasonal"),
        round(col("detr") - col("seasonal") + lit(1e-9), 4).as("residual"))
  }

  /** Interval-union length per key (gaps-and-islands): each event
    * opens a fixed-duration interval; overlapping/touching intervals
    * merge into islands and the key's total covered time is the sum
    * of island lengths — the "true active time" metric a naive
    * count·duration overstates wherever events overlap. Islands are
    * detected with the classic running-max-end window (an interval
    * starts a new island iff its start exceeds every prior end), so
    * the whole operator is two window passes + two hash aggregates in
    * EXACT epoch-microsecond integers — no floats, no fold, and
    * shuffles only on the key. */
  def intervalUnion(events: DataFrame, keyCol: String, tsCol: String,
      durUs: Long): DataFrame = {
    require(durUs >= 1, s"duration must be >= 1 us: $durUs")
    val iv = events.select(col(keyCol), unix_micros(col(tsCol)).as("s"))
      .withColumn("e", col("s") + durUs)
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val isl = iv
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("nw",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("isl", sum(col("nw")).over(wRun))
    isl.groupBy(col(keyCol), col("isl"))
      .agg(count(lit(1)).as("n_iv"), min(col("s")).as("i_s"),
        max(col("e")).as("i_e"))
      .groupBy(col(keyCol))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("i_e") - col("i_s")).as("union_us"))
  }

  /** Weekly cohort retention matrix: each user's cohort is the Monday
    * of their first event week; a cell (cohort_week, weeks_since)
    * counts the distinct cohort users active in that later week.
    * Cohort weeks format as dates so both engines emit the same
    * string.
    *
    * Two hash aggregates and one equi-join on the user key — the
    * (user, week) activity table is deduped BEFORE the join, so the
    * join input is bounded by users × active-weeks, not raw events,
    * and the final matrix aggregate sees at most one row per (user,
    * week). No window over the raw stream anywhere; every shuffle key
    * (user, then cohort×week) is high-cardinality or tiny. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val wk = events.select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).cast("date").as("__w"))
      .distinct()
    val cohort = wk.groupBy(col("__u")).agg(min(col("__w")).as("__c"))
    wk.join(cohort, "__u")
      .groupBy(date_format(col("__c"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("__w"), col("__c")) / lit(7)).cast("long").as("weeks_since"))
      .agg(count(lit(1)).as("users"))
  }

  /** First- and last-touch conversion attribution: every `convType`
    * event is credited (a) to the user's earliest preceding
    * non-conversion touch type and (b) to the most recent one, with
    * `(none)` when no touch precedes it. Output per touch type:
    * (touch_type, first_touch, last_touch) conversion counts.
    *
    * One window pass over the per-user stream (ties broken on the
    * event id, same order contract as the transition matrix), then
    * two tiny aggregates full-outer-joined on the touch type — the
    * per-type credit tables are bounded by the event-type vocabulary,
    * so the tail of the plan is broadcast-sized regardless of corpus
    * scale. */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val touch = when(col(typeCol) =!= convType, col(typeCol))
    val conv = events
      .select(col(typeCol).as("__t"),
        first(touch, ignoreNulls = true).over(w).as("__ft"),
        last(touch, ignoreNulls = true).over(w).as("__lt"))
      .filter(col("__t") === convType)
      .select(coalesce(col("__ft"), lit("(none)")).as("__ft"),
        coalesce(col("__lt"), lit("(none)")).as("__lt"))
    val byFirst = conv.groupBy(col("__ft").as("touch_type"))
      .agg(count(lit(1)).as("first_touch"))
    val byLast = conv.groupBy(col("__lt").as("touch_type"))
      .agg(count(lit(1)).as("last_touch"))
    byFirst.join(byLast, Seq("touch_type"), "full_outer")
      .select(col("touch_type"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"))
  }

  /** Sample autocorrelation of the daily event-count series at lags
    * 1..maxLag — the seasonality/memory screen run before any
    * forecasting or drift model. The textbook estimator subtracts
    * the series mean, which would drag every sum through
    * order-dependent doubles; multiplying through by n² instead
    * keeps ALL of it integer:
    *   r_k = (n²·Σx_t·x_{t+k} − n·S·(A_k+B_k) + m_k·S²)
    *         / (n·(n·Q − S²))
    * with S=Σx, Q=Σx², m_k pairs at lag k, A_k/B_k the pair-wise
    * endpoint sums — five DECIMAL(38,0) aggregates per lag, one
    * double division at the end (the assortativity discipline). The
    * lag sweep is a broadcast of maxLag rows joined against the
    * indexed series (bounded by the day span — the documented-small
    * series class). Returns (lag, n_pairs, r). */
  def autocorrelation(events: DataFrame, tsCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    val spark = events.sparkSession
    val daily = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
    val idx = daily
      .withColumn("i", row_number().over(Window.orderBy(col("dt"))))
      .select(col("i"), col("x")).localCheckpoint(true)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val tot = idx.agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("s"),
      sum(dec(col("x")) * dec(col("x"))).as("q"))
    val ks = spark.range(1, maxLag + 1).select(col("id").as("k"))
    val pairs = idx.as("a").crossJoin(broadcast(ks))
      .join(idx.as("b"), col("b.i") === col("a.i") + col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("m"),
        sum(dec(col("a.x")) * dec(col("b.x"))).as("sxy"),
        sum(dec(col("a.x"))).as("sa"),
        sum(dec(col("b.x"))).as("sb"))
    val num = (dec(col("n")) * dec(col("n")) * col("sxy")
      - dec(col("n")) * col("s") * (col("sa") + col("sb"))
      + dec(col("m")) * col("s") * col("s")).cast("double")
    val den = (dec(col("n")) * (dec(col("n")) * col("q") - col("s") * col("s")))
      .cast("double")
    pairs.crossJoin(broadcast(tot))
      .select(col("k").as("lag"), col("m").as("n_pairs"),
        when(den > 0, round(num / den, 6)).as("r"))
  }

  /** Lagged cross-correlation between two daily event-count series —
    * "does series A lead series B, and by how many days?": for each
    * lag k ∈ [−maxLag, maxLag], Pearson r over the calendar-aligned
    * pairs (x on day d, y on day d+k). Pair alignment is an equi-join
    * on the shifted DATE (a missing day simply contributes no pair —
    * no imputation), per-lag sums are the exact DECIMAL(38,0)
    * five-sum Pearson on integer counts, and the lag sweep is one
    * broadcast fan-out over the (2·maxLag+1)-row lag dim — the
    * [[autocorrelation]] shape with two series and true per-lag
    * normalization. Returns (lag, n_pairs, r) rounded 6 dp. */
  def crossCorrelation(events: DataFrame, tsCol: String, typeCol: String,
      typeA: String, typeB: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    val spark = events.sparkSession
    def daily(t: String) = events.filter(col(typeCol) === t)
      .groupBy(to_date(col(tsCol)).as("dt")).agg(count(lit(1)).as("x"))
    val a = daily(typeA).localCheckpoint(true)
    val b = daily(typeB)
      .select(col("dt").as("bdt"), col("x").as("y")).localCheckpoint(true)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val ks = spark.range(-maxLag.toLong, maxLag + 1L).select(col("id").as("k"))
    val pairs = a.crossJoin(broadcast(ks))
      .join(b, col("bdt") === date_add(col("dt"), col("k").cast("int")))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("m"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val varx = (col("m") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vary = (col("m") * col("syy") - col("sy") * col("sy")).cast("double")
    val num = (col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
    pairs.select(col("k").as("lag"), col("m").as("n_pairs"),
      when(varx > 0 && vary > 0,
        round(num / (sqrt(varx) * sqrt(vary)), 6)).as("r"))
  }

  /** Burst dedup over an event stream: within each key, events
    * chained by gaps < `gapSec` form one burst (the sessionize
    * island), and only the burst's FIRST event survives — the
    * retry/duplicate-collapse pass an event pipeline runs before
    * counting anything. Island detection is the exact-integer
    * epoch-µs lag comparison (one per-key window), burst ids a
    * running sum; the per-key report keeps the output bounded.
    * Returns (key, n_events, n_kept) — n_kept = number of bursts. */
  def burstDedup(events: DataFrame, keyCol: String, tsCol: String,
      gapSec: Long): DataFrame = {
    require(gapSec >= 1)
    val us = events.select(col(keyCol), unix_micros(col(tsCol)).as("__us"))
    us.withColumn("__prev", lag(col("__us"), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col("__us"))))
      .withColumn("__newburst",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") >= gapSec * 1000000L, 1L).otherwise(0L))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__newburst")).as("n_kept"))
  }

  /** Rolling spike screen over a daily count series: flag days whose
    * count more than doubles the average of their ±`radius`-day
    * neighborhood — the all-integer comparison
    *   x·(n_w − 1) > factor·(S_w − x)
    * (S_w/n_w the window sum/size including x) avoids every division,
    * so the flag replays exactly; the reported ratio is one
    * deterministic double division, rounded. One ROWS window over the
    * pre-aggregated series (the documented-small axis class — bounded
    * by the day span, not the row count). Returns flagged days only:
    * (dt, x, neighbor_sum, n_window, ratio). */
  def rollingSpike(events: DataFrame, tsCol: String, radius: Int,
      factor: Int): DataFrame = {
    require(radius >= 1 && factor >= 1)
    val daily = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("dt")).rowsBetween(-radius, radius)
    daily
      .withColumn("sw", sum(col("x")).over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .filter(col("nw") > 1 &&
        col("x") * (col("nw") - 1) > lit(factor.toLong) * (col("sw") - col("x")))
      .select(col("dt"), col("x"), (col("sw") - col("x")).as("neighbor_sum"),
        col("nw").as("n_window"),
        when(col("sw") - col("x") > 0,
          round(col("x").cast("double") * (col("nw") - 1).cast("double") /
            (col("sw") - col("x")).cast("double"), 4)).as("ratio"))
  }

  /** Up-streak report over a daily count series — "how long has this
    * metric been climbing, and what's the longest run we've seen?":
    * a day is UP when its count strictly exceeds the previous day's;
    * consecutive up days form a streak (the gaps-and-islands id is a
    * running sum of breaks — the q_t2 sessionize trick on the day
    * axis). All-integer; the one ordered window runs over the
    * pre-aggregated day axis (the documented-small series class).
    * current_streak is the LAST island's length via max_by. Returns
    * one row (n_days, n_up, longest_streak, current_streak). */
  def upStreaks(df: DataFrame, dateCol: String,
      countCol: String): DataFrame = {
    val w = Window.orderBy(col(dateCol))
    val cum = Window.orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d2 = df
      .withColumn("__up", when(col(countCol) >
        lag(col(countCol), 1).over(w), 1L).otherwise(0L))
      .withColumn("__grp", sum(lit(1L) - col("__up")).over(cum))
    d2.groupBy(col("__grp"))
      .agg(sum(col("__up")).as("__len"), count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("n_days"), sum(col("__len")).as("n_up"),
        max(col("__len")).as("longest_streak"),
        max_by(col("__len"), col("__grp")).as("current_streak"))
  }

  /** Error report of the NAIVE seasonal forecast x̂_t = x_{t−lagDays}
    * — the baseline every real forecaster must beat, and the
    * cheapest drift alarm (WAPE of the naive forecast jumping IS the
    * regime change). Alignment is a calendar equi-join (a missing
    * day contributes no pair — the crossCorrelation convention), so
    * |errors| and their sum are EXACT integers; MAE/WAPE are single
    * divisions of those integers, sMAPE's per-day terms round 9 dp
    * into DECIMAL(38,12). Returns one row
    * (n_eval, sum_abs_err, mae, wape, smape). */
  def naiveForecastError(daily: DataFrame, dateCol: String,
      countCol: String, lagDays: Int): DataFrame = {
    require(lagDays >= 1)
    val d = daily.select(col(dateCol).as("dt"), col(countCol).as("x"))
      .localCheckpoint(true)
    val pairs = d.as("a").join(d.as("b"),
        col("b.dt") === date_add(col("a.dt"), lagDays))
      .select(col("b.x").as("x"), col("a.x").as("f"))
      .withColumn("ae", abs(col("x") - col("f")))
    pairs.agg(count(lit(1)).as("n_eval"),
        sum(col("ae")).as("sum_abs_err"), sum(col("x")).as("__sx"),
        sum(when(col("x") + col("f") > 0,
            round(col("ae").cast("double") * 2 /
              (col("x") + col("f")).cast("double"), 9))
          .otherwise(lit(0.0)).cast("decimal(38,12)")).as("__sm"))
      .select(col("n_eval"), col("sum_abs_err"),
        when(col("n_eval") > 0, round(col("sum_abs_err").cast("double") /
          col("n_eval").cast("double"), 4)).as("mae"),
        when(col("__sx") > 0, round(col("sum_abs_err").cast("double") /
          col("__sx").cast("double"), 6)).as("wape"),
        when(col("n_eval") > 0, round(col("__sm").cast("double") /
          col("n_eval").cast("double"), 6)).as("smape"))
  }

  /** Exponential time-decay multi-touch attribution — the fair-share
    * refinement of [[touchAttribution]]'s first/last-touch extremes:
    * every non-conversion event of the same user within the trailing
    * window gets weight 2^(−Δt/halflife), normalized per conversion,
    * credited to its channel. Pairing is the [[graft.streaming
    * .Streams.intervalJoin]] equi+range shape (bounded fan-out, never
    * cartesian); determinism ladder: weights round 9 dp, per-
    * conversion totals sum in DECIMAL(38,12), shares round 9 dp and
    * re-sum in decimal, channel credit rounds 4 dp. Returns
    * (channel, n_touches, credit) — credits sum to ≈ the number of
    * attributed conversions. */
  def decayAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String, windowMinutes: Int,
      halfLifeMinutes: Int): DataFrame = {
    require(windowMinutes >= 1 && halfLifeMinutes >= 1)
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col("event_id").as("__cid"),
        unix_micros(col(tsCol)).as("__cus"))
    val touch = events.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("__u"), col(typeCol).as("channel"),
        unix_micros(col(tsCol)).as("__tus"))
    val win = windowMinutes * 60L * 1000000L
    val hl = halfLifeMinutes * 60.0 * 1000000.0
    val pairs = conv.join(touch, Seq("__u"))
      .filter(col("__tus") <= col("__cus") &&
        col("__tus") > col("__cus") - win)
      .withColumn("__w", round(pow(lit(2.0),
        -(col("__cus") - col("__tus")).cast("double") / hl), 9))
    val tot = pairs.groupBy(col("__cid"))
      .agg(sum(col("__w").cast("decimal(38,12)")).as("__wtot"))
    pairs.join(tot, Seq("__cid"))
      .withColumn("__share",
        round(col("__w") / col("__wtot").cast("double"), 9)
          .cast("decimal(38,12)"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("__share")).cast("double"), 4).as("credit"))
  }

  /** DAU / trailing-WAU / stickiness — the engagement report every
    * product dashboard opens with, and the textbook "you cannot
    * window a COUNT(DISTINCT)" problem. Scale shape: dedupe to
    * (day, user) FIRST (one hash aggregate — the only pass over raw
    * events), then fan each active-day row out to the ≤`windowDays`
    * calendar days it contributes to (bounded explode on the day
    * axis) and count distinct users per target day. DAU joins back
    * on the same axis; stickiness = DAU/WAU rounded 4 dp, the only
    * double. Days with no trailing activity simply don't appear.
    * Returns (dt, dau, wau, stickiness). */
  def dauWau(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 2)
    val dayUser = events
      .select(to_date(col(tsCol)).as("dt"), col(userCol).as("u")).distinct()
      .localCheckpoint(true)
    val dau = dayUser.groupBy(col("dt")).agg(count(lit(1)).as("dau"))
    val wau = dayUser
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("__k"),
        col("dt"), col("u"))
      .select(expr(s"date_add(dt, __k)").as("dt"), col("u"))
      .groupBy(col("dt")).agg(countDistinct(col("u")).as("wau"))
    // inner join: a target day only counts if itself active (keeps the
    // axis = observed days, matching the DAU frame)
    dau.join(wau, Seq("dt"))
      .select(col("dt"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 4)
          .as("stickiness"))
  }

  /** Periodogram of the daily count series — "what cycle dominates
    * this metric?" via the direct DFT at integer frequencies
    * k ∈ [1, n/2]:
    *   P_k = re² + im²,  re = Σ_t x_t·cos(−2πkt/n), im = Σ … sin.
    * The trig factors are the only transcendentals: each per-term
    * product rounds 6 dp into DECIMAL(38,12) — a coarser ladder than
    * the log/pow gates because cos/sin carry the largest cross-libm
    * ulp risk and the day axis multiplies the boundary exposure —
    * re/im and P round 4 dp. The
    * frequency sweep is one broadcast fan-out over ≤n/2 rows against
    * the indexed day axis (the autocorrelation class — bounded by
    * the span, not the row count). Returns (k, n, re, im, power). */
  def periodogram(events: DataFrame, tsCol: String): DataFrame = {
    val spark = events.sparkSession
    val daily = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
    val idx = daily
      .withColumn("t", row_number().over(Window.orderBy(col("dt"))) - 1)
      .select(col("t").cast("long").as("t"), col("x"))
      .localCheckpoint(true)
    val n = idx.agg(count(lit(1)).as("n"))
    val ks = idx.crossJoin(broadcast(n))
      .select(col("t"), col("x"), col("n"),
        explode(sequence(lit(1L), (col("n") / 2).cast("long"))).as("k"))
    val ang = lit(-2.0) * lit(math.Pi) * col("k").cast("double") *
      col("t").cast("double") / col("n").cast("double")
    ks.select(col("k"), col("n"),
        round(col("x").cast("double") * cos(ang), 6)
          .cast("decimal(38,12)").as("__re"),
        round(col("x").cast("double") * sin(ang), 6)
          .cast("decimal(38,12)").as("__im"))
      .groupBy(col("k"), col("n"))
      .agg(sum(col("__re")).as("__res"), sum(col("__im")).as("__ims"))
      .select(col("k"), col("n"),
        (round(col("__res").cast("double"), 4) + lit(0.0)).as("re"),
        (round(col("__ims").cast("double"), 4) + lit(0.0)).as("im"))
      .withColumn("power",
        round(col("re") * col("re") + col("im") * col("im"), 4))
  }

  /** Kaplan–Meier survival curve of time-to-conversion with
    * right-censoring (KM '58) — "how long until a signup purchases,
    * counting the users who never did?": naive averages over
    * converters only are survivorship-biased; KM keeps every user at
    * risk until their event OR censoring time (last observed day).
    * Survival table machinery: per distinct event day d,
    *   n_risk = n − (users gone before d),  factor = 1 − d_i/n_risk,
    *   S(d) = Π factors — the product as exp of a cumulative sum of
    * 12-dp-rounded ln(factor) terms in DECIMAL(38,18) (order-free),
    * with an S=0 short-circuit once a factor hits 0 (ln −∞ never
    * evaluated... it is, but the flag wins the `when`). All counts
    * exact integers off one user table + one day-axis window.
    * Returns (t_day, n_risk, n_events, survival). */
  def kmSurvival(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, startType: String, eventType: String): DataFrame = {
    val start = events.filter(col(typeCol) === startType)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t0"))
    val ev = events.filter(col(typeCol) === eventType)
      .select(col(userCol).as("u"), col(tsCol).as("te"))
    val horizon = events.agg(max(col(tsCol)).as("tmax"))
    // min over the conditional keeps pre-start conversions as NULLs
    // (censored), instead of filtering such users out entirely
    val users = start.join(ev, Seq("u"), "left")
      .groupBy(col("u"), col("t0"))
      .agg(min(when(col("te") >= col("t0"), col("te"))).as("tev"))
      .crossJoin(broadcast(horizon))
      .select(col("u"),
        when(col("tev").isNotNull,
          datediff(to_date(col("tev")), to_date(col("t0"))))
          .otherwise(datediff(to_date(col("tmax")), to_date(col("t0"))))
          .cast("long").as("dur"),
        col("tev").isNotNull.as("is_event"))
    val n = users.agg(count(lit(1)).as("n"))
    val perDur = users.groupBy(col("dur"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("is_event"), 1L).otherwise(0L)).as("n_events"))
    val wAsc = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = perDur.crossJoin(broadcast(n))
      .withColumn("n_risk",
        col("n") - coalesce(sum(col("n_all")).over(wAsc), lit(0L)))
      .filter(col("n_events") > 0)
    val factor = round(lit(1.0) -
      col("n_events").cast("double") / col("n_risk").cast("double"), 9)
    risk
      .withColumn("__f", factor)
      .withColumn("__lnf", when(col("__f") > 0,
        round(log(col("__f")), 12).cast("decimal(38,18)"))
        .otherwise(lit(null).cast("decimal(38,18)")))
      .withColumn("__anyzero",
        max(when(col("__f") <= 0, 1L).otherwise(0L)).over(wCum))
      .withColumn("__lnsum", sum(col("__lnf")).over(wCum))
      .select(col("dur").as("t_day"), col("n_risk"), col("n_events"),
        when(col("__anyzero") > 0, lit(0.0))
          .otherwise(round(exp(col("__lnsum").cast("double")), 6))
          .as("survival"))
  }

  /** Single binary-segmentation changepoint on the daily count
    * series — the LOCALIZATION step after [[cusum]]'s screen says
    * "something moved": choose the split that maximizes the
    * between-segment sum of squares
    *   SSB(i) = S_l²/n_l + S_r²/n_r − S²/n
    * (the two-segment ANOVA identity — only prefix sums needed, so
    * the whole sweep is ONE cumulative window over the day axis).
    * Exact integer prefix/total sums; each S²/n term rounds 6 dp
    * into DECIMAL(38,12) (the anovaF ladder), argmax ties to the
    * earliest split. Returns one row
    * (split_day, n_left, n_right, mean_left, mean_right, ssb) —
    * split_day is the first day of the right segment. */
  def binsegChangepoint(events: DataFrame, tsCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,12)")
    val daily = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
    val wCum = Window.orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def term(s: Column, n: Column) = dec(round(s.cast("double") *
      s.cast("double") / n.cast("double"), 6))
    daily
      .withColumn("__i", row_number().over(Window.orderBy(col("dt"))))
      .withColumn("__cs", sum(col("x")).over(wCum))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("x")).over(wAll))
      .withColumn("__nd", lead(col("dt"), 1).over(Window.orderBy(col("dt"))))
      .filter(col("__i") < col("__n"))
      .select(col("__nd").as("split_day"), col("__i").as("n_left"),
        (col("__n") - col("__i")).as("n_right"),
        round(col("__cs").cast("double") / col("__i").cast("double"), 4)
          .as("mean_left"),
        round((col("__s") - col("__cs")).cast("double") /
          (col("__n") - col("__i")).cast("double"), 4).as("mean_right"),
        round((term(col("__cs"), col("__i"))
          + term(col("__s") - col("__cs"), col("__n") - col("__i"))
          - term(col("__s"), col("__n"))).cast("double"), 4).as("ssb"))
      .orderBy(col("ssb").desc, col("split_day")).limit(1)
  }

  /** Cumulative unique users per day via the FIRST-SEEN trick — the
    * canonical scale pattern for "total users to date": a running
    * COUNT(DISTINCT) recomputes the union per day (quadratic in
    * days), but cumulative uniques at day d ≡ users whose FIRST
    * active day ≤ d — one min-aggregate per user, one count per
    * first-day, one running sum over the bounded day axis. DAU joins
    * the same axis; returning = dau − new. All-integer. Returns
    * (dt, dau, new_users, cum_users, returning). */
  def cumulativeUniques(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val du = events.select(to_date(col(tsCol)).as("dt"),
      col(userCol).as("u")).distinct().localCheckpoint(true)
    val dau = du.groupBy(col("dt")).agg(count(lit(1)).as("dau"))
    val firstDay = du.groupBy(col("u")).agg(min(col("dt")).as("dt"))
      .groupBy(col("dt")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(firstDay, Seq("dt"), "left")
      .select(col("dt"), col("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .withColumn("returning", col("dau") - col("new_users"))
  }

  /** Exact funnel step-latency quartiles — "how long from first view
    * to first purchase?", reported as the element-selection Q1 /
    * median / Q3 (type-1 quantiles: the ⌈n·q⌉-th ORDER STATISTIC,
    * an actual observed latency — no interpolation, so the exact-µs
    * integers replay bit-for-bit). Per user: t_view = min view,
    * t_conv = min conversion ≥ t_view (the conditional-min censoring
    * rule from [[kmSurvival]]); converters only enter the latency
    * pool. Selection indices come from
    * [[OrderedPrefix.withRowIndex]] — one row per CONVERTING USER is
    * still data-sized, so the global rank is a two-level distributed
    * scan, not a single-task ordered window; the ⌈n·q⌉-th-element
    * selection is tie-order-invariant, so the result is bit-exact.
    * Returns one row (n_users, q1_us, med_us, q3_us). */
  def stepLatencyQuartiles(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, fromType: String,
      toType: String): DataFrame = {
    val from = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("tv"))
    val to = events.filter(col(typeCol) === toType)
      .select(col(userCol).as("u"), col(tsCol).as("tp"))
    val lat = from.join(to, Seq("u"))
      .groupBy(col("u"), col("tv"))
      .agg(min(when(col("tp") >= col("tv"), col("tp"))).as("tpf"))
      .filter(col("tpf").isNotNull)
      .select((unix_micros(col("tpf")) - unix_micros(col("tv"))).as("lat"))
    OrderedPrefix.withRowIndex(lat, Seq(col("lat")), "__i", "__n")
      .select(col("__n"), col("__i"), col("lat"))
      .groupBy(col("__n").as("n_users"))
      .agg(min(when(col("__i") * 4 >= col("__n"), col("lat"))).as("q1_us"),
        min(when(col("__i") * 2 >= col("__n"), col("lat"))).as("med_us"),
        min(when(col("__i") * 4 >= col("__n") * 3, col("lat"))).as("q3_us"))
  }

  /** Split-conformal prediction interval for the daily-count trend
    * (Vovk's conformal framework in the split form of Lei et al.
    * '18 — THE distribution-free way to put honest error bars on any
    * point forecaster): chronological thirds-style split (60% fit /
    * 20% calibrate / 20% test), OLS trend on the fit window (the
    * exact five-sum ladder), calibration residuals' ⌈(n+1)(1−α)⌉-th
    * smallest absolute value as the band half-width q̂, and the
    * guaranteed-coverage check on the held-out tail — finite-sample
    * ≥ 1−α coverage with NO distributional assumption, which the
    * Gaussian ±2σ bands everywhere else in a dashboard do not give.
    *
    * Exactness: day index and counts are integers, the five OLS sums
    * are DECIMAL(38,0), slope/intercept round 6 dp, every residual
    * rounds 6 dp before the order-statistic selection, q̂ is an
    * actual observed residual. The day axis is post-aggregation tiny,
    * so the ordered windows are bounded by the calendar. Returns one
    * row (n_fit, n_cal, n_test, slope, intercept, qhat, n_covered).
    * `alphaPct` is α·100 (integer, keeps ⌈·⌉ exact). */
  def conformalInterval(events: DataFrame, tsCol: String,
      alphaPct: Int = 20): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 50, s"alphaPct in [1,50]: $alphaPct")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val wOrd = Window.orderBy(col("x"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val daily = events
      .groupBy(datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
        .cast("long").as("x"))
      .agg(count(lit(1)).as("y"))
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__part",
        when(col("__i") * 5 <= col("__n") * 3, "fit")
          .when(col("__i") * 5 <= col("__n") * 4, "cal")
          .otherwise("test"))
      .localCheckpoint(true)
    val fit = daily.filter(col("__part") === "fit")
      .agg(count(lit(1)).as("n_fit"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"))
    val varx = (dec(col("n_fit")) * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val num = (dec(col("n_fit")) * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val ab = fit.select(col("n_fit"),
      round(num / varx, 6).as("slope"),
      round((col("sy").cast("double") -
        num / varx * col("sx").cast("double")) /
        col("n_fit").cast("double"), 6).as("intercept"))
    val withResid = daily.crossJoin(broadcast(ab))
      .withColumn("__r", round(abs(col("y").cast("double") -
        (col("intercept") + col("slope") * col("x").cast("double"))), 6))
    val wCal = Window.orderBy(col("__r"), col("x"))
    val qhat = withResid.filter(col("__part") === "cal")
      .withColumn("__ri", row_number().over(wCal))
      .withColumn("__nc", count(lit(1)).over(wAll))
      // k = ceil((n_cal+1)(100-alpha)/100), capped at n_cal
      .filter(col("__ri") * 100 >=
        least((col("__nc") + 1) * (100 - alphaPct), col("__nc") * 100))
      .agg(max(col("__nc")).as("n_cal"), min(col("__r")).as("qhat"))
    val test = withResid.filter(col("__part") === "test")
      .crossJoin(broadcast(qhat))
      .agg(max(col("n_cal")).as("n_cal"), max(col("qhat")).as("qhat"),
        count(lit(1)).as("n_test"),
        sum(when(col("__r") <= col("qhat"), 1L).otherwise(0L))
          .as("n_covered"))
    ab.crossJoin(broadcast(test))
      .select(col("n_fit"), col("n_cal"), col("n_test"), col("slope"),
        col("intercept"), col("qhat"), col("n_covered"))
  }

  /** Multi-step ORDERED funnel conversion — the product-analytics
    * report [[stepLatencyQuartiles]]'s two-step latency face doesn't
    * give: how many users progress through EVERY prefix of
    * step1 → step2 → … → stepK in order, where step k counts only if
    * its first qualifying occurrence is at-or-after the user's step
    * k−1 time (the conditional-min censoring rule — out-of-order
    * events don't count, repeat visits use the earliest qualifying
    * one). Emits one row per step with the user count, step-to-step
    * conversion and cumulative conversion from step 1 (6 dp).
    *
    * Shape: the step list is a bounded pipeline parameter, so the
    * funnel unrolls to K−1 equi-joins on the user key + one
    * conditional-min aggregate each — no window over the event
    * corpus, no driver data; each stage's table shrinks
    * monotonically. Returns (step, step_type, n_users, conv_prev,
    * conv_first) ordered by step. */
  def funnelConversion(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.size <= 6,
      s"funnel needs 2-6 steps: ${steps.size}")
    val spark = events.sparkSession
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
      .localCheckpoint(true)
    val perStep = scala.collection.mutable.ArrayBuffer(
      (1, steps.head, cur.count()))
    for (k <- 1 until steps.size) {
      val ev = events.filter(col(typeCol) === steps(k))
        .select(col(userCol).as("u"), col(tsCol).as("__ts"))
      cur = cur.join(ev, Seq("u"))
        .groupBy(col("u"), col("t"))
        .agg(min(when(col("__ts") >= col("t"), col("__ts"))).as("__t2"))
        .filter(col("__t2").isNotNull)
        .select(col("u"), col("__t2").as("t"))
        .localCheckpoint(true)
      perStep += ((k + 1, steps(k), cur.count()))
    }
    import spark.implicits._
    val n1 = perStep.head._3
    // rates via Spark round() (HALF_UP, the engines' shared rule) —
    // a driver-side rint would half-even where the oracle half-ups
    perStep.toSeq.zip(0L +: perStep.toSeq.map(_._3).init)
      .map { case ((i, tp, n), prev) => (i.toLong, tp, n, prev, n1) }
      .toDF("step", "step_type", "n_users", "__prev", "__n1")
      .select(col("step"), col("step_type"), col("n_users"),
        when(col("step") === 1, 1.0)
          .when(col("__prev") === 0, 0.0)
          .otherwise(round(col("n_users").cast("double") /
            col("__prev").cast("double"), 6)).as("conv_prev"),
        when(col("__n1") === 0, 0.0)
          .otherwise(round(col("n_users").cast("double") /
            col("__n1").cast("double"), 6)).as("conv_first"))
  }

  /** Local-maximum detection on the daily count series — the peak
    * catalogue (strict: a day beating BOTH neighbors; boundary days
    * can't qualify, plateaus don't double-count), top-`topK` by
    * height with date ties earliest-first. One lag/lead window over
    * the bounded day axis + a bounded top-k. All-integer. Returns
    * (dt, x, prev_x, next_x). */
  def localPeaks(events: DataFrame, tsCol: String,
      topK: Int = 3): DataFrame = {
    require(topK >= 1)
    val w = Window.orderBy(col("dt"))
    events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
      .withColumn("prev_x", lag(col("x"), 1).over(w))
      .withColumn("next_x", lead(col("x"), 1).over(w))
      .filter(col("prev_x").isNotNull && col("next_x").isNotNull &&
        col("x") > col("prev_x") && col("x") > col("next_x"))
      .orderBy(col("x").desc, col("dt")).limit(topK)
  }

  /** Durbin–Watson statistic of the daily series' linear-trend
    * residuals — "is what the trend line missed autocorrelated?"
    * (DW ≈ 2 → independent, → 0 → positively correlated — your
    * confidence intervals are lying). The OLS (a, b) come from the
    * exact five integer sums (q_p27 chain), residuals round 6 dp,
    * squared terms round 9 dp into DECIMAL(38,12), and
    * DW = Σ(e_t−e_{t−1})²/Σe_t² is one closing division. One window
    * over the day axis. Returns (n, dw, rho_approx = 1 − DW/2). */
  def durbinWatson(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
    val idx = daily
      .withColumn("t", (row_number().over(Window.orderBy(col("dt"))) - 1)
        .cast("long"))
      .select(col("t"), col("x")).localCheckpoint(true)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val s = idx.agg(count(lit(1)).as("n"), sum(dec(col("t"))).as("st"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("t")) * dec(col("x"))).as("stx"),
      sum(dec(col("t")) * dec(col("t"))).as("stt"))
    val varT = (dec(col("n")) * col("stt") - col("st") * col("st"))
      .cast("double")
    val b = (dec(col("n")) * col("stx") - col("st") * col("sx"))
      .cast("double") / varT
    val a = (col("sx").cast("double") - b * col("st").cast("double")) /
      col("n").cast("double")
    val ab = s.select(col("n"), b.as("b"), a.as("a"))
    val res = idx.crossJoin(broadcast(ab))
      .select(col("t"), col("n"),
        round(col("x").cast("double") -
          (col("a") + col("b") * col("t").cast("double")), 6).as("e"))
    val w = Window.orderBy(col("t"))
    res
      .withColumn("__ep", lag(col("e"), 1).over(w))
      .select(col("n"),
        round(col("e") * col("e"), 9).cast("decimal(38,12)").as("__e2"),
        when(col("__ep").isNotNull,
          round((col("e") - col("__ep")) * (col("e") - col("__ep")), 9)
            .cast("decimal(38,12)")).as("__d2"))
      .groupBy(col("n"))
      .agg(sum(col("__e2")).as("__se2"), sum(col("__d2")).as("__sd2"))
      .select(col("n"),
        when(col("__se2") > 0, round(col("__sd2").cast("double") /
          col("__se2").cast("double"), 6)).as("dw"))
      .withColumn("rho_approx",
        when(col("dw").isNotNull, round(lit(1.0) - col("dw") / 2, 6)))
  }

  /** Mann–Kendall trend test over the daily event-count series — the
    * distribution-free "is this metric drifting?" screen (Mann 1945;
    * Kendall's tau). The statistic is all-integer:
    *   S = Σ_{i<j} sign(x_j − x_i)
    * over every ordered day pair, tie correction
    *   T = Σ_groups t(t−1)(2t+5), and the variance numerator
    *   V18 = n(n−1)(2n+5) − T  (Var(S) = V18/18, kept ×18 so the
    * gate hashes an exact BIGINT). The only doubles are the final
    *   tau = S / (n(n−1)/2) and the continuity-corrected
    *   z = (S ∓ 1)/sqrt(V18/18), both rounded 6 dp (the established
    * discipline). The pair sweep is the day-axis self-join — bounded
    * by the span, not the row count (the autocorrelation class); the
    * three aggregates combine via 1-row crossJoins. Returns one row
    * (n, n_pairs, s, v18, tau, z). */
  def mannKendall(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x")).localCheckpoint(true)
    val pairs = daily.as("a")
      .join(daily.as("b"), col("a.dt") < col("b.dt"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(signum(col("b.x") - col("a.x")).cast("long")).as("s"))
    val ties = daily.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(when(col("t") > 1,
        col("t") * (col("t") - 1) * (col("t") * 2 + 5))), lit(0L)).as("tcorr"))
    val tot = daily.agg(count(lit(1)).as("n"))
    val v18 = (col("n") * (col("n") - 1) * (col("n") * 2 + 5)
      - col("tcorr")).as("v18")
    val sd = sqrt(col("v18").cast("double") / 18.0)
    tot.crossJoin(pairs).crossJoin(ties)
      .select(col("n"), col("n_pairs"), col("s"), v18)
      .select(col("n"), col("n_pairs"), col("s"), col("v18"),
        round(col("s").cast("double") * 2 /
          (col("n") * (col("n") - 1)).cast("double"), 6).as("tau"),
        when(col("v18") > 0, round(
          when(col("s") > 0, (col("s") - 1).cast("double") / sd)
            .when(col("s") < 0, (col("s") + 1).cast("double") / sd)
            .otherwise(lit(0.0)), 6)).as("z"))
  }

  /** Week-over-week growth report — weekly volume with the previous
    * week and the percentage change, the cadence engagement review
    * that daily series are too noisy for (and that [[dauWau]]
    * stickiness doesn't answer: WAU can hold flat while volume
    * collapses). Weeks truncate to Monday (both engines' ISO
    * convention); growth = (n − prev)·100/prev rounded 2 dp, NULL for
    * the first week or a zero base. One lag window over the bounded
    * week axis. Returns (wk, n, prev_n, growth_pct). */
  def wowGrowth(events: DataFrame, tsCol: String): DataFrame = {
    val w = Window.orderBy(col("wk"))
    events.groupBy(date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("growth_pct", when(col("prev_n") > 0,
        round((col("n") - col("prev_n")).cast("double") * 100 /
          col("prev_n").cast("double"), 2)))
  }

  /** Wald–Wolfowitz runs test on the daily count series — "is the
    * sequence of above-/below-median days RANDOM?" Too few runs =
    * sticky regimes (trend, autocorrelation), too many = oscillation;
    * the nonparametric cousin of [[durbinWatson]] (which assumes a
    * linear trend model — this assumes nothing). Days equal to the
    * median drop (the classic treatment); the median is the exact
    * lower order statistic. R = 1 + sign-change count is pure integer
    * window arithmetic;
    *   E[R] = 2·n1·n2/n + 1,  V = 2·n1·n2·(2·n1·n2 − n)/(n²(n−1))
    * close in one fixed double chain, z = (R − E)/√V rounded 6 dp,
    * NULL when either side is empty or V ≤ 0. Returns one row
    * (n1, n2, runs, z). Scale: the day axis is post-aggregation
    * bounded, so both windows run over calendar-sized input. */
  def runsTest(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x")).localCheckpoint(true)
    val wOrd = Window.orderBy(col("x"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val med = daily
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__i") * 2 >= col("__n"))
      .agg(min(col("x")).as("med"))
    val w = Window.orderBy(col("dt"))
    val signs = daily.crossJoin(broadcast(med))
      .filter(col("x") =!= col("med"))
      .select(col("dt"), (col("x") > col("med")).cast("long").as("s"))
      .withColumn("__p", lag(col("s"), 1).over(w))
    val agg = signs.agg(
      sum(col("s")).as("n1"),
      sum(lit(1L) - col("s")).as("n2"),
      (coalesce(sum(when(col("__p").isNotNull && col("s") =!= col("__p"),
        1L)), lit(0L)) + 1L).as("runs"))
    val n = (col("n1") + col("n2")).cast("double")
    val two = lit(2.0) * col("n1").cast("double") * col("n2").cast("double")
    val er = two / n + 1.0
    val v = two * (two - n) / (n * n * (n - 1))
    agg.select(col("n1"), col("n2"), col("runs"),
      when(col("n1") > 0 && col("n2") > 0 && v > 0,
        round((col("runs").cast("double") - er) / sqrt(v), 6)).as("z"))
  }

  /** Top session paths — the most common first-k event-type
    * sequences across gap-delimited sessions (the "how do journeys
    * START?" product-analytics report; [[cohortRetention]] says
    * whether users return, [[touchAttribution]] who gets credit —
    * this says what people actually DO first). Sessions split on
    * `gapMinutes` of silence (the q_t2 rule, (ts, event_id)-ordered
    * so ties are pinned); each session's first `k` types concat to
    * a path string; top `topN` paths by (count desc, path). Returns
    * (path, n_sessions). Scale: two user-keyed windows + one hash
    * aggregate on the path key; the top-N is a
    * TakeOrderedAndProject. */
  def topSessionPaths(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapMinutes: Int = 30, k: Int = 3,
      topN: Int = 10): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes * 60L * 1000000L
    val sess = events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(byUser))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col(tsCol)) - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(byUser))
    val bySess = Window.partitionBy(col(userCol), col("__sid"))
      .orderBy(col(tsCol), col(idCol))
    sess
      .withColumn("__rn", row_number().over(bySess))
      .filter(col("__rn") <= k)
      .groupBy(col(userCol), col("__sid"))
      .agg(array_sort(collect_list(struct(col("__rn").as("r"),
        col(typeCol).cast("string").as("t")))).as("__steps"))
      .select(array_join(transform(col("__steps"),
        s => s.getField("t")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(topN)
  }

  /** Stationary distribution of the event-type Markov chain — "where
    * does the journey SETTLE?": the q_t10 transition counts become a
    * row-normalized probability matrix and a fixed number of power-
    * iteration steps from uniform gives the long-run occupancy (the
    * funnel's equilibrium, which raw transition counts — biased by
    * today's traffic mix — do not show). Every probability rounds
    * 9 dp, every v·P term rounds 12 dp into DECIMAL(38,18) (the
    * pagerankDf ladder), so the whole recurrence replays exactly.
    * States with no inbound mass keep an explicit 0 row. SEMANTICS
    * NOTE: the state space is the set of types that appear as a
    * transition SOURCE — a type that only ever appears as a target
    * (a terminal sink) is not a state, so mass flowing into it is
    * discarded each step and Σp may settle below 1; the returned p
    * is the occupancy of the non-terminal sub-chain, not a full
    * distribution (the oracle replays the same convention). Returns
    * (state, p) after `iters` steps, p rounded 6 dp. Scale: the
    * state space is the event-type domain (tiny); the only
    * corpus-scale work is the one windowed transition count. */
  def markovStationary(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1,8]: $iters")
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val cnt = events
      .select(col(typeCol).as("f"),
        lead(col(typeCol), 1).over(w).as("t"))
      .filter(col("t").isNotNull)
      .groupBy(col("f"), col("t")).agg(count(lit(1)).as("n"))
    val p = cnt
      .withColumn("__tot", sum(col("n")).over(Window.partitionBy(col("f"))))
      .select(col("f"), col("t"),
        round(col("n").cast("double") / col("__tot").cast("double"), 9)
          .as("p"))
      .localCheckpoint(true)
    val st = p.select(col("f").as("state")).distinct().localCheckpoint(true)
    val k = st.agg(count(lit(1)).as("k"))
    var v = st.crossJoin(broadcast(k))
      .select(col("state"), round(lit(1.0) / col("k"), 9).as("v"))
    for (_ <- 1 to iters) {
      val c = v.join(p, v("state") === p("f"))
        .select(p("t").as("state"),
          round(col("v") * col("p"), 12).cast("decimal(38,18)").as("s"))
        .groupBy(col("state")).agg(sum(col("s")).as("s"))
      v = st.join(c, Seq("state"), "left")
        .select(col("state"),
          round(coalesce(col("s").cast("double"), lit(0.0)), 9).as("v"))
        .localCheckpoint(true)
    }
    v.select(col("state"), round(col("v"), 6).as("p"))
  }

  /** Seasonal-strength index (Hyndman & Athanasopoulos, FPP):
    *   F_s = max(0, 1 − Var(residual)/Var(seasonal + residual))
    * — ONE number for "how seasonal is this series?" on top of
    * [[seasonalDecompose]]'s per-row columns (0 = the daily cycle
    * explains nothing, → 1 = the series IS its cycle). The decompose
    * columns are 4-dp-rounded doubles, so seasonal+residual is exact
    * at 4 dp; both variances run on the DECIMAL ladder (x and x² as
    * exact decimals of the rounded values), one double chain closes.
    * Returns one row (n, strength). */
  def seasonalStrength(events: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val d4 = (c: Column) => round(c, 4).cast("decimal(20,4)")
    val base = seasonalDecompose(events, tsCol, valueCol)
      .select(col("residual").cast("decimal(20,4)").as("e"),
        d4(col("seasonal") + col("residual")).as("sr"))
    val agg = base.agg(count(lit(1)).as("n"),
      sum(col("e")).as("se"), sum(col("e") * col("e")).as("qe"),
      sum(col("sr")).as("ss"), sum(col("sr") * col("sr")).as("qs"))
    val dd = (c: Column) => c.cast("double")
    def variance(s: Column, q: Column) =
      (dd(col("n")) * dd(q) - dd(s) * dd(s)) /
        (dd(col("n")) * dd(col("n") - 1))
    val ve = variance(col("se"), col("qe"))
    val vs = variance(col("ss"), col("qs"))
    agg.select(col("n"),
      when(col("n") > 1 && vs > 0,
        round(greatest(lit(0.0), lit(1.0) - ve / vs), 6)).as("strength"))
  }

  /** Entropy rate of the event-type Markov chain — "how PREDICTABLE
    * is the next step?", the one-number ceiling on any next-event
    * model: H = −Σ_s π_s Σ_t P(s→t) log₂ P(s→t) bits/step (0 =
    * deterministic journeys, log₂|states| = pure noise). π comes
    * from [[markovStationary]]'s replayable fixpoint, P from the
    * same 9-dp row-normalized counts; each −π·P·log₂P term rounds
    * 9 dp into DECIMAL(38,12) so the sum is order-free. Returns one
    * row (n_states, h_bits). */
  def markovEntropyRate(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, iters: Int = 5): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val p = events
      .select(col(typeCol).as("f"), lead(col(typeCol), 1).over(w).as("t"))
      .filter(col("t").isNotNull)
      .groupBy(col("f"), col("t")).agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(Window.partitionBy(col("f"))))
      .select(col("f"), col("t"),
        round(col("n").cast("double") / col("__tot").cast("double"), 9)
          .as("p"))
    val pi = markovStationary(events, userCol, tsCol, idCol, typeCol,
      iters).select(col("state").as("f"), col("p").as("pi"))
    p.join(pi, Seq("f"))
      .select(round(-col("pi") * col("p") * log2(col("p")), 9)
        .cast("decimal(38,12)").as("__h"))
      .agg(count(lit(1)).as("__nt"), sum(col("__h")).as("__s"))
      .crossJoin(broadcast(pi.agg(count(lit(1)).as("n_states"))))
      .select(col("n_states"),
        round(col("__s").cast("double"), 6).as("h_bits"))
  }

  /** Unrolled DuckDB oracle for [[markovEntropyRate]] — the
    * [[markovStationaryOracleSql]] chain with the entropy tail. */
  def markovEntropyRateOracleSql(iters: Int): String =
    markovChainCtes(iters) +
      s""", h AS (SELECT sum(CAST(round(-round(v.v, 6) * p.p * log2(p.p),
              9) AS DECIMAL(38,12))) AS s
            FROM p JOIN v$iters v ON v.state = p.f)
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM st) AS n_states,
                 round(CAST(h.s AS DOUBLE), 6) AS h_bits
          FROM h"""

  /** Unrolled DuckDB oracle for [[markovStationary]] over the events
    * table — one MATERIALIZED CTE pair per iteration. */
  def markovStationaryOracleSql(iters: Int): String =
    markovChainCtes(iters) +
      s" SELECT state, round(v, 6) AS p FROM v$iters ORDER BY state"

  private def markovChainCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """WITH x AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us FROM events),
         tr AS (SELECT event_type AS f, lead(event_type) OVER
                 (PARTITION BY user_id ORDER BY us, event_id) AS t
               FROM x),
         cnt AS (SELECT f, t, count(*) AS n FROM tr WHERE t IS NOT NULL
                 GROUP BY f, t),
         tot AS (SELECT f, sum(n) AS tot FROM cnt GROUP BY f),
         p AS MATERIALIZED (SELECT cnt.f, cnt.t,
             round(CAST(cnt.n AS DOUBLE) / CAST(tot.tot AS DOUBLE), 9)
               AS p
           FROM cnt JOIN tot ON tot.f = cnt.f),
         st AS MATERIALIZED (SELECT DISTINCT f AS state FROM p),
         kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
         v0 AS (SELECT state, round(1.0 / k, 9) AS v FROM st, kk)""")
    for (i <- 1 to iters)
      sb.append(s""",
         c$i AS MATERIALIZED (SELECT p.t AS state,
             sum(CAST(round(v${i - 1}.v * p.p, 12) AS DECIMAL(38,18)))
               AS s
           FROM v${i - 1} JOIN p ON p.f = v${i - 1}.state
           GROUP BY p.t),
         v$i AS MATERIALIZED (SELECT st.state,
             round(coalesce(CAST(c$i.s AS DOUBLE), 0), 9) AS v
           FROM st LEFT JOIN c$i ON c$i.state = st.state)""")
    sb.toString
  }

  /** Markov removal-effect attribution (Anderl et al. 2016's
    * data-driven alternative to [[touchAttribution]]'s positional
    * rules): how much of the conversion probability does each channel
    * actually CARRY? The journey chain gets two virtual states — a
    * per-user `__START` before the first event and an `__END` after
    * the last — and the conversion value of a state is its
    * first-passage probability into `convState` (value iteration,
    * `iters` steps: conv pinned to 1, END to 0, the rest fold one
    * transition). A channel's removal effect is the relative drop in
    * START's conversion value when every visit to that channel is
    * made a dead end (its value pinned to 0 — equivalent to routing
    * its inbound edges to END).
    *
    * Scale shape: ONE data-sized pass (the per-user lead window +
    * first-event rows, both partitioned by user) builds the
    * transition counts; everything after lives on the (removal ×
    * state) grid — |types|² rows, iterated `iters` times with tiny
    * broadcast joins. Determinism: probabilities are 9-dp-rounded
    * count ratios; each iteration's products round 12 dp into
    * DECIMAL(38,18) (order-free sums) and the new values round 9 dp —
    * the [[markovStationary]] ladder — so [[markovRemovalOracleSql]]
    * replays bit-for-bit. Truncation at `iters` steps is part of the
    * operator contract (journeys longer than `iters` transitions
    * contribute only their prefix), mirrored in the oracle. Returns
    * one row per removable channel: (channel, base_p, removed_p,
    * removal_effect = (base−removed)/base, 6 dp). */
  def markovRemovalEffect(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, convState: String,
      iters: Int = 12): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1,16]: $iters")
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val seq0 = events.select(col(typeCol).as("f"),
      coalesce(lead(col(typeCol), 1).over(w), lit("__END")).as("t"),
      row_number().over(w).as("__rn"))
    val trans = seq0.select(col("f"), col("t"))
      .unionByName(seq0.filter(col("__rn") === 1)
        .select(lit("__START").as("f"), col("f").as("t")))
    val p = trans.groupBy(col("f"), col("t")).agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(Window.partitionBy(col("f"))))
      .select(col("f"), col("t"),
        round(col("n").cast("double") / col("__tot").cast("double"), 9)
          .as("p"))
    // The value iteration runs over the (removal × state) grid —
    // DIMENSION-sized (|event types|+2 states squared), never
    // data-sized — so it is a bounded small by the repo's convention
    // (IVF centroids, the Louvain 2W literal): collect the transition
    // matrix once and iterate on the driver. The distributed plan ends
    // at `p` (the corpus-scale sessionize + transition aggregation);
    // the r12 profile measured the 12 distributed rounds as ~70 AQE
    // stage-jobs of pure per-job overhead on ≤50-row frames. Every
    // step replays the EXACT engine ladder the distributed form
    // computed — round(v·p, 12) via BigDecimal(HALF_UP) on the
    // double's shortest decimal form (Spark's Round), exact
    // decimal(38,18) summation (order-free), toDouble, round(_, 9) —
    // so the result is bit-identical (oracle-verified).
    def rnd(x: Double, s: Int): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    def pinV(removal: String, state: String, x: Double): Double =
      if (state == convState) 1.0
      else if (state == removal || state == "__END") 0.0
      else x
    val pr = p.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2)))
    val stateSeq = (pr.map(_._1) ++ pr.map(_._2)).distinct
    val channelSeq = stateSeq.filterNot(st =>
      st == "__START" || st == "__END" || st == convState).sorted
    val removalSeq = channelSeq :+ "__NONE"
    val outOf: Map[String, Array[(String, String, Double)]] =
      pr.groupBy(_._1)
    var v: Map[(String, String), Double] =
      (for (r <- removalSeq; st <- stateSeq)
        yield (r, st) -> pinV(r, st, 0.0)).toMap
    for (_ <- 1 to iters) {
      v = (for (r <- removalSeq; st <- stateSeq) yield {
        val s = outOf.getOrElse(st, Array.empty)
          .foldLeft(java.math.BigDecimal.ZERO) { case (acc, (_, t, pv)) =>
            acc.add(new java.math.BigDecimal(
              java.lang.Double.toString(rnd(v((r, t)) * pv, 12)))
              .setScale(18, java.math.RoundingMode.HALF_UP))
          }
        (r, st) -> pinV(r, st, rnd(s.doubleValue(), 9))
      }).toMap
    }
    val spark = events.sparkSession
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("channel",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("base_p",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("removed_p",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("removal_effect",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val rows = channelSeq.map { ch =>
      val bp = v(("__NONE", "__START"))
      val rp = v((ch, "__START"))
      val eff: Any =
        if (bp > 0) java.lang.Double.valueOf(rnd((bp - rp) / bp, 6)) else null
      org.apache.spark.sql.Row(ch, bp, rp, eff)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size.min(4))),
      outSchema)
  }

  /** Unrolled DuckDB oracle for [[markovRemovalEffect]]: the same
    * START/END-augmented transition table, the same (removal × state)
    * grid, one MATERIALIZED CTE pair per value-iteration step with
    * the same pin/round ladder. */
  def markovRemovalOracleSql(convState: String, iters: Int): String = {
    val pinSql = (expr: String) =>
      s"""CASE WHEN g.state = '$convState' THEN 1.0
              WHEN g.state = g.removal OR g.state = '__END' THEN 0.0
              ELSE $expr END"""
    val sb = new StringBuilder(
      s"""WITH x AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us FROM events),
         sq AS (SELECT event_type AS f,
             coalesce(lead(event_type) OVER
               (PARTITION BY user_id ORDER BY us, event_id), '__END') AS t,
             row_number() OVER
               (PARTITION BY user_id ORDER BY us, event_id) AS rn
           FROM x),
         tr AS (SELECT f, t FROM sq
                UNION ALL SELECT '__START' AS f, f AS t FROM sq WHERE rn = 1),
         cnt AS (SELECT f, t, count(*) AS n FROM tr GROUP BY f, t),
         tot AS (SELECT f, sum(n) AS tot FROM cnt GROUP BY f),
         p AS MATERIALIZED (SELECT cnt.f, cnt.t,
             round(CAST(cnt.n AS DOUBLE) / CAST(tot.tot AS DOUBLE), 9)
               AS p
           FROM cnt JOIN tot ON tot.f = cnt.f),
         st AS MATERIALIZED (SELECT DISTINCT state FROM
           (SELECT f AS state FROM p UNION ALL SELECT t AS state FROM p)),
         rm AS MATERIALIZED (SELECT state AS removal FROM st
             WHERE state NOT IN ('__START', '__END', '$convState')
           UNION ALL SELECT '__NONE' AS removal),
         g AS MATERIALIZED (SELECT rm.removal, st.state FROM rm, st),
         v0 AS (SELECT g.removal, g.state,
             ${pinSql("0.0")} AS v FROM g)""")
    for (i <- 1 to iters)
      sb.append(s""",
         c$i AS MATERIALIZED (SELECT v.removal, p.f AS state,
             sum(CAST(round(v.v * p.p, 12) AS DECIMAL(38,18))) AS s
           FROM v${i - 1} v JOIN p ON p.t = v.state
           GROUP BY v.removal, p.f),
         v$i AS MATERIALIZED (SELECT g.removal, g.state,
             ${pinSql(s"round(coalesce(CAST(c$i.s AS DOUBLE), 0), 9)")} AS v
           FROM g LEFT JOIN c$i
             ON c$i.removal = g.removal AND c$i.state = g.state)""")
    sb.append(s"""
         SELECT v.removal AS channel, b.v AS base_p, v.v AS removed_p,
                CASE WHEN b.v > 0 THEN round((b.v - v.v) / b.v, 6) END
                  AS removal_effect
         FROM v$iters v,
              (SELECT v FROM v$iters
               WHERE removal = '__NONE' AND state = '__START') b
         WHERE v.state = '__START' AND v.removal <> '__NONE'
         ORDER BY channel""")
    sb.toString
  }

  /** Calendar coverage gaps — runs of days with ZERO events between
    * the observed min and max date (gaps-and-islands over the missing
    * set: island key = missing day minus its rank, pure date/integer
    * arithmetic). The ingestion-health report every downstream daily
    * metric silently assumes is empty — a 3-day hole reads as a
    * volume crash in q_t38 and a false regime in q_t41 unless checked
    * here first. Returns (gap_start, gap_end, n_days) per gap, empty
    * when coverage is complete. Scale: the spine explodes from one
    * (min, max) row — calendar-bounded, never corpus-bounded. */
  def calendarGaps(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
    val spine = daily.agg(min(col("dt")).as("lo"), max(col("dt")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("dt"))
    val missing = spine.join(daily, Seq("dt"), "left_anti")
    val w = Window.orderBy(col("dt"))
    missing
      .withColumn("__grp", datediff(col("dt"), to_date(lit("1970-01-01")))
        - row_number().over(w))
      .groupBy(col("__grp"))
      .agg(min(col("dt")).as("gap_start"), max(col("dt")).as("gap_end"),
        count(lit(1)).as("n_days"))
      .drop("__grp")
  }

  /** Ljung–Box portmanteau test — "are the first K autocorrelations
    * JOINTLY zero?", the whole-correlogram whiteness check behind
    * [[autocorrelation]]'s per-lag values (and the multi-lag
    * companion to [[durbinWatson]]'s lag-1):
    *   Q = n(n+2) Σ_{k≤K} ρ_k²/(n−k)  ~  χ²(K) under whiteness.
    * ρ_k are the exact-sum 6-dp ACF values; each term rounds 9 dp
    * into DECIMAL(38,12) and Q closes in one double chain. Q ≫
    * K + 2√(2K) says the daily series is not noise. Returns one row
    * (n, max_lag, q_stat). */
  def ljungBox(events: DataFrame, tsCol: String,
      maxLag: Int): DataFrame = {
    val acf = autocorrelation(events, tsCol, maxLag)
    val tot = events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x")).agg(count(lit(1)).as("n"))
    acf.crossJoin(broadcast(tot))
      .select(col("n"),
        round(coalesce(col("r"), lit(0.0)) * coalesce(col("r"), lit(0.0)) /
          (col("n") - col("lag")).cast("double"), 9)
          .cast("decimal(38,12)").as("__t"))
      .groupBy(col("n"))
      .agg(sum(col("__t")).as("__s"))
      .select(col("n"), lit(maxLag.toLong).as("max_lag"),
        round(col("n").cast("double") * (col("n") + 2).cast("double") *
          col("__s").cast("double"), 6).as("q_stat"))
  }

  /** Rolling 7-day distinct users per day — EXACT, via coverage
    * expansion: distinct counts don't decompose over sliding windows
    * (yesterday's window can't be updated, only recounted), so each
    * (user, day) activity row fans out to the ≤7 window anchor days
    * it covers and one hash countDistinct per day closes it. The
    * fan-out is a fixed ×7 map-side explode — linear, shuffles once
    * on the day key, no per-day rescan, no window-of-sets state. Days
    * reported are the observed activity days ([[dauWau]]'s weekly
    * buckets are the coarse cousin; this is the smooth daily line).
    * Returns (dt, dau7). */
  def rollingDistinctUsers(events: DataFrame, userCol: String,
      tsCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1)
    val ud = events.select(col(userCol).as("u"),
      to_date(col(tsCol)).as("d")).distinct().localCheckpoint(true)
    val covered = ud.select(col("u"),
      explode(sequence(col("d"), date_add(col("d"), windowDays - 1)))
        .as("dt"))
    covered.join(ud.select(col("d").as("dt")).distinct(), Seq("dt"))
      .groupBy(col("dt")).agg(countDistinct(col("u")).as("dau7"))
  }

  /** Median-filtered anomaly detection — days whose deviation from
    * the 7-day [[rollingMedian]] exceeds 3× the MAD of those
    * deviations (the robust x-sigma rule: median and MAD shrug off
    * the very outliers a mean/stddev screen would absorb into its own
    * threshold — [[rollingSpike]]'s known failure mode). ENTIRELY in
    * integers: residual r = x − med7 is integer, MAD is the exact
    * ⌈n/2⌉-th order statistic of |r|, and the flag is the integer
    * comparison |r| > 3·MAD — no rounding anywhere, both engines
    * agree bit-for-bit. Returns flagged days (dt, x, med7, r, mad).
    * Scale: two calendar-bounded windows + one broadcast scalar. */
  def medianAnomalies(events: DataFrame, tsCol: String): DataFrame = {
    val base = rollingMedian(events, tsCol)
      .select(col("dt"), col("x"), col("med7"),
        (col("x") - col("med7")).as("r"))
      .localCheckpoint(true)
    val wOrd = Window.orderBy(abs(col("r")))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val mad = base
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__i") * 2 >= col("__n"))
      .agg(min(abs(col("r"))).as("mad"))
    base.crossJoin(broadcast(mad))
      .filter(abs(col("r")) > col("mad") * 3)
      .select(col("dt"), col("x"), col("med7"), col("r"), col("mad"))
  }

  /** Maximum drawdown of the daily event-count series — how far below
    * its historical peak daily volume ever fell (the capacity-planning
    * and health-alert headline; a big drawdown that q_t23's spike
    * screen missed is a slow bleed, not a spike). One window pass
    * computes the running maximum; drawdown(t) = runmax(t) − x(t) is
    * pure integer arithmetic, and the report row is the trough with
    * the LARGEST drawdown (ties → earliest day), carried with its
    * peak level. Returns one row (trough_dt, peak_x, trough_x,
    * drawdown). Scale: the daily series is post-aggregation tiny
    * (one row per day), so the unpartitioned running-max window is
    * bounded by the calendar, never the corpus; the top-1 is a
    * TakeOrderedAndProject. */
  /** Longest-inactivity-gap report: each user's maximum gap between
    * consecutive events (exact µs integers), summarized as the exact
    * p50/p90/max ORDER STATISTICS over users (⌈n·q⌉-th element, the
    * q_t36 selection rule — no interpolation, bit-exact). The churn
    * screen [[cohortRetention]]'s calendar buckets can't see: "how
    * long do users actually go dark before coming back?". Gap
    * multisets are invariant under equal-timestamp tie order, so the
    * per-user lag window is deterministic without a tiebreak column.
    * Returns one row (n_users, p50_us, p90_us, max_us) over users
    * with ≥2 events. Scale: one per-user window + one hash agg; the
    * closing order-statistic pass runs over one row per user — still
    * data-sized, so it rides [[OrderedPrefix.withRowIndex]] (two-level
    * distributed rank), never a global single-task ordered window; the
    * ⌈n·q⌉-th-element selection is tie-order-invariant. */
  def longestGapStats(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val wu = Window.partitionBy(col("u")).orderBy(col("ts"))
    val per = events.select(col(userCol).as("u"), col(tsCol).as("ts"))
      .withColumn("__prev", lag(col("ts"), 1).over(wu))
      .filter(col("__prev").isNotNull)
      .select(col("u"),
        (unix_micros(col("ts")) - unix_micros(col("__prev"))).as("gap"))
      .groupBy(col("u")).agg(max(col("gap")).as("mg"))
    OrderedPrefix.withRowIndex(per, Seq(col("mg")), "__i", "__n")
      // plain aggregate (not GROUP BY __n) so a corpus with no user
      // holding >=2 events still yields ONE row of NULLs — matching
      // the oracle's shape on degenerate input
      .agg(max(col("__n")).as("n_users"),
        min(when(col("__i") * 2 >= col("__n"), col("mg"))).as("p50_us"),
        min(when(col("__i") * 10 >= col("__n") * 9, col("mg"))).as("p90_us"),
        max(col("mg")).as("max_us"))
  }

  /** Exact 7-day rolling MEDIAN of the daily count series — the
    * robust trend line ([[rollingSpike]]'s mean-based screen chases
    * outliers; the median shrugs them off). Each full 7-day window's
    * sorted array picks its ⌈7/2⌉=4th element — integer, no
    * interpolation; partial head windows are excluded rather than
    * emitted with a different effective width. Returns (dt, x, med7)
    * per day from day 7 on. Scale: the day axis is post-aggregation
    * tiny, so the collect-over-window array is 7 longs/row — bounded
    * by the calendar, never the corpus. */
  def rollingMedian(events: DataFrame, tsCol: String): DataFrame = {
    val w = Window.orderBy(col("dt")).rowsBetween(-6, 0)
    events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
      .withColumn("__arr", collect_list(col("x")).over(w))
      .filter(size(col("__arr")) === 7)
      .select(col("dt"), col("x"),
        element_at(array_sort(col("__arr")), 4).as("med7"))
  }

  def maxDrawdown(events: DataFrame, tsCol: String): DataFrame = {
    val w = Window.orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.groupBy(to_date(col(tsCol)).as("dt"))
      .agg(count(lit(1)).as("x"))
      .withColumn("runmax", max(col("x")).over(w))
      .select(col("dt").as("trough_dt"), col("runmax").as("peak_x"),
        col("x").as("trough_x"), (col("runmax") - col("x")).as("drawdown"))
      .orderBy(col("drawdown").desc, col("trough_dt")).limit(1)
  }

  /** Exponentially weighted moving average of the per-type daily
    * count series (the classic smoother y_t = α·x_t + (1−α)·y_{t−1},
    * y_0 = x_0; Holt–Winters' level-only component). The recursion is
    * a first-order linear recurrence, closed-formed onto cumulative
    * windows with EPOCH RE-ANCHORING so the horizon is unbounded:
    *
    * Within an epoch of at most L observed days (local index j),
    *   s_j = Σ_{i=0..j} x_i·r^{−i}           (r = 1−α, cumulative sum)
    *   pre-carry value  v_j = r^j·( α·(s_j − x̂_0) + x̂_0 )
    * where x̂_0 is the series head x_0 inside epoch 0 (the y_0 = x_0
    * boundary) and 0 in later epochs (pure α·Σ r^{j−i}·x_i tail).
    * L is sized so r^{−(L−1)} ≤ 2^512 (L = 512 at the default
    * α = 1/2) — the within-epoch cumulative can never overflow, which
    * the single-window form did past ~1024 days (Σ x_i·2^i hits Inf
    * at 2^1024, then r^t·Inf → NaN; ~308 days at α = 0.9).
    *
    * Across epochs the recurrence COMPOSES linearly: an epoch with
    * n_e observed days acts on the incoming level as
    * y ↦ A_e·y + B_e with A_e = r^{n_e} ≤ 1 and B_e = its last
    * pre-carry value — so the carry into epoch e is the left fold of
    * the preceding epochs' (A, B) pairs from 0. A_e ≤ 1 and
    * B_e ≤ max x keep the fold finite at ANY horizon (r^{n} merely
    * underflows to 0 — old mass genuinely negligible — never Inf),
    * and the fold runs over the per-key EPOCH list: calendar/L
    * entries, a few structs even for a century of days. Final value:
    *   y_t = v_j + r^{j+1}·carry_{e−1}.
    *
    * The default α = 1/2 makes every product x_i·2^i an exact double
    * (a count's mantissa merely shifts exponent), and a cumulative
    * window sum adds in window order on any engine — so for series
    * within one epoch (epoch 0: carry ≡ 0, and +0.0 is exact) the
    * oracle's single-window replay is bit-identical, not merely
    * close, exactly as before the re-anchoring.
    *
    * Scale shape: one hash aggregate to days, then windows
    * PARTITIONED by (type, epoch) over the calendar-bounded day
    * axis — never a data-sized window; the epoch summary table and
    * the per-key fold arrays are calendar/L-bounded (tiny). Returns
    * (event_type, day, n, ewma). */
  def ewmaDaily(events: DataFrame, tsCol: String, typeCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    val r = 1.0 - alpha
    // largest L with r^{-(L-1)} ≤ 2^512: within-epoch terms are
    // bounded by max(x)·2^512, half the double exponent range
    val epochLen = math.max(1, (512.0 * math.log(2.0) / math.log(1.0 / r)).toInt)
    val wKey = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wEp = Window.partitionBy(col("event_type"), col("__e")).orderBy(col("day"))
    val cumEp = wEp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__t", row_number().over(wKey) - 1)
      .withColumn("__e", (col("__t") / epochLen).cast("int"))
      .withColumn("__j", col("__t") % epochLen)
      .withColumn("__s", sum(col("n").cast("double") *
        pow(lit(1.0 / r), col("__j"))).over(cumEp))
      .withColumn("__x0", when(col("__e") === 0,
        first(col("n").cast("double")).over(cumEp)).otherwise(lit(0.0)))
    // per-(key, epoch) summary: A = r^{rows}, B = last pre-carry value
    // (max over the j-headed struct picks the epoch's last row)
    val eps = scored
      .groupBy(col("event_type"), col("__e"))
      .agg(count(lit(1)).as("__rows"),
        max(struct(col("__j"), col("__s"), col("__x0"))).as("__last"))
      .select(col("event_type"), col("__e"),
        pow(lit(r), col("__rows")).as("__A"),
        (pow(lit(r), col("__last.__j")) *
          (lit(alpha) * (col("__last.__s") - col("__last.__x0")) +
            col("__last.__x0"))).as("__B"))
    // carry into epoch e = fold of the first e (A, B) pairs; the
    // per-key epoch array is calendar/L-bounded, so collect + slice
    // per epoch row is a few structs even at century horizons
    val arrs = eps.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("__e"), col("__A"), col("__B"))))
        .as("__eps"))
    val carries = eps.join(arrs, Seq("event_type"))
      .select(col("event_type"), col("__e"),
        aggregate(slice(col("__eps"), lit(1), col("__e")), lit(0.0),
          (acc, x) => x.getField("__A") * acc + x.getField("__B"))
          .as("__carryPrev"))
    scored.join(carries, Seq("event_type", "__e"))
      .select(col("event_type"), col("day"), col("n"),
        round(pow(lit(r), col("__j")) *
          (lit(alpha) * (col("__s") - col("__x0")) + col("__x0")) +
          pow(lit(r), col("__j") + 1) * col("__carryPrev"), 4).as("ewma"))
  }
}
