package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the warehouse
  * pattern behind every "refresh the rollup without rescanning
  * history" pipeline: keep per-group summary STATES built from
  * algebraic aggregates (counts and sums — each merges by addition),
  * summarize only the new batch, and fold it into the stored state.
  * The q_d8 incremental-dedup idea applied to aggregation: per
  * refresh the work is O(batch), never O(history).
  *
  * Only algebraic/commutative states qualify (count, sum, min, max,
  * and the sketch families — HLL via `hll_union_agg` (q_a19), KMV
  * via [[Sketches.kmvMerge]], CMS cell-wise; a median is NOT
  * mergeable and must re-derive from equi-depth states, q_a18).
  * The merge being a plain re-aggregation is the correctness
  * argument: union-then-sum over partial sums equals sum over the
  * union, exactly, in any partition order — integers, no ladder
  * needed. The gate proves it by comparing a 3-way batch merge
  * against the oracle's direct full-table summary. */
object Materialize {

  /** Per-group summary state of a documents-shaped table:
    * (grp, n_docs, n_tokens, n_chars) — all addition-mergeable. */
  def docSummary(docs: DataFrame, grpCol: String): DataFrame =
    docs.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))

  /** Fold summary states into one: union + re-aggregate. Associative
    * and commutative, so any batch arrival order yields the same
    * state as a full recompute. */
  def mergeSummaries(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty)
    parts.reduce(_ unionByName _)
      .groupBy(col("grp"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
  }
}
