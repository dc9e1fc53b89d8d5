package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ordered prefix-sum / global row-index primitive — the
  * scale-safe replacement for `Window.orderBy(...)` over a data-sized
  * row set (which forces the ENTIRE input through one task's sort — the
  * classic 100 TB bottleneck; see the bounded-axis discipline notes in
  * [[Sampling]] and [[TimeSeries]], where ordered windows are only
  * legal when the axis is calendar/top-k bounded by construction).
  *
  * Shape (the textbook two-level scan, cf. Blelloch '90 prefix-sums):
  *   1. `repartitionByRange` on the order key — each partition owns a
  *      contiguous, disjoint key range, all partitions sort in
  *      parallel. Equal keys land in one partition (RangePartitioner
  *      assigns by key comparison), so ties never straddle a boundary.
  *   2. per-partition inclusive cumsum via a window PARTITIONED by the
  *      range-partition id — a partitioned window, never a global one.
  *   3. per-partition totals (one row per partition — bounded by the
  *      CLUSTER, not the data) get exclusive-prefix offsets through a
  *      tiny unpartitioned window over ≤ nParts rows.
  *   4. broadcast the offsets back and add: global = local + offset.
  *
  * The pid-stamped projection is `localCheckpoint`ed (eager) because
  * the range boundaries come from a sampling pass: re-evaluating the
  * lineage could re-sample different boundaries for the window vs. the
  * totals aggregate, mis-joining offsets. The checkpoint pins ONE
  * partitioning; it materializes only the narrow (order-key, value)
  * projection, distributed across executors.
  *
  * Determinism: with a unique order key the result is bit-exact. With
  * ties, rows of equal key receive tie-order-dependent indices (as any
  * distributed sort would), but every consumer in this repo uses
  * tie-invariant selections (the ⌈n·q⌉-th ORDER STATISTIC of a
  * multiset, or cumsum at unique keys), so outputs replay bit-for-bit.
  */
object OrderedPrefix {

  private val PID = "__op_pid"

  /** Range-partition `df` by `order` and stamp the partition id,
    * checkpointed so every downstream evaluation sees the SAME
    * boundaries. `nParts` <= 0 → session shuffle-partition count. */
  private def stamped(df: DataFrame, order: Seq[Column], nParts: Int): DataFrame = {
    val n = if (nParts > 0) nParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, order: _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(true)
  }

  /** Adds `cumCol` = inclusive prefix sum of `value` over the global
    * `order`. All other input columns pass through. */
  def withPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      cumCol: String, nParts: Int = 0): DataFrame =
    withPrefixSums(df, order, Seq(value -> cumCol), nParts)

  /** One inclusive prefix sum PER (value, cumCol) pair over the same
    * global `order` — a whole family of cumulative counts (e.g. the
    * two-sample CDFs a KS test compares) pays ONE range shuffle and
    * ONE checkpoint instead of one per column. All other input
    * columns pass through. */
  def withPrefixSums(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)], nParts: Int = 0): DataFrame = {
    require(values.nonEmpty, "need at least one (value, cumCol) pair")
    val vn = values.indices.map(i => s"__op_v$i")
    val withVals = values.zip(vn).foldLeft(df) {
      case (d, ((v, _), n)) => d.withColumn(n, v) }
    val st = stamped(withVals, order, nParts)
    val wLoc = Window.partitionBy(col(PID)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = vn.zipWithIndex.foldLeft(st) { case (d, (n, i)) =>
      d.withColumn(s"__op_loc$i", sum(col(n)).over(wLoc)) }
    val wOff = Window.orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = st.groupBy(col(PID))
      .agg(sum(col(vn.head)).as("__op_tot0"),
        vn.tail.zipWithIndex.map { case (n, i) =>
          sum(col(n)).as(s"__op_tot${i + 1}") }: _*)
      .select(col(PID) +: values.indices.map(i =>
        coalesce(sum(col(s"__op_tot$i")).over(wOff), lit(0L))
          .as(s"__op_off$i")): _*)
    val joined = local.join(broadcast(offsets), Seq(PID))
    val withCums = values.zipWithIndex.foldLeft(joined) {
      case (d, ((_, cumCol), i)) =>
        d.withColumn(cumCol, col(s"__op_loc$i") + col(s"__op_off$i")) }
    val temps = PID +: values.indices.flatMap(i =>
      Seq(s"__op_v$i", s"__op_loc$i", s"__op_off$i"))
    withCums.drop(temps: _*)
  }

  /** Adds `idxCol` = global 1-based row index over `order` and `nCol`
    * = total row count (the `row_number` + `count() over ()` pair that
    * exact order-statistic selection needs), without any data-sized
    * unpartitioned window. */
  def withRowIndex(df: DataFrame, order: Seq[Column], idxCol: String,
      nCol: String, nParts: Int = 0): DataFrame = {
    val st = stamped(df, order, nParts)
    val local = st.withColumn("__op_loc",
      row_number().over(Window.partitionBy(col(PID)).orderBy(order: _*)))
    val counts = st.groupBy(col(PID)).agg(count(lit(1)).as("__op_tot"))
    val offsets = counts
      .withColumn("__op_off",
        coalesce(sum(col("__op_tot")).over(Window.orderBy(col(PID))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__op_n",
        sum(col("__op_tot")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(PID), col("__op_off"), col("__op_n"))
    local.join(broadcast(offsets), Seq(PID))
      .withColumn(idxCol, col("__op_loc") + col("__op_off"))
      .withColumn(nCol, col("__op_n"))
      .drop(PID, "__op_loc", "__op_off", "__op_n")
  }
}
