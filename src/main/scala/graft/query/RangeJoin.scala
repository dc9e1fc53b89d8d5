package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — the scalable plan for a pure time-range join
  * with NO equi key. A naive `l.ts BETWEEN r.ts - w AND r.ts` theta
  * join plans as BroadcastNestedLoop/cartesian: O(|L|·|R|) compares
  * and one side fully broadcast or replicated. Banding restores an
  * equi key: bucket both sides by `floor(ts / w)`; a left row within
  * `w` of a right row is always in the right row's bucket or the one
  * before, so replicating the LEFT side into 2 buckets (map-side
  * explode, factor exactly 2) turns the range join into an equi join
  * on the bucket id plus a residual filter. Shuffle volume is
  * 2·|L| + |R| rows hashed on bucket — the standard
  * interval-join-without-key plan (Flink's window join and Spark's
  * own stream-stream join use the same construction internally).
  *
  * Skew note: bucket population is bounded by events-per-window, so
  * the only skew source is a hot time window; AQE's skew-join split
  * handles that (buckets are many and fine-grained by construction).
  */
object RangeJoin {

  /** Pairs (left, right) with `l.tsCol` in `(r.tsCol - windowUs,
    * r.tsCol]` — left rows at most `windowUs` micros BEFORE the right
    * row. Timestamps are compared as epoch micros. Output: leftCols
    * ++ rightCols (caller pre-aliases to avoid collisions). */
  def leadingWindowPairs(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"window must be positive, got $windowUs")
    val lb = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__bucket",
        explode(array(expr(s"__lus div ${windowUs}L"),
          expr(s"__lus div ${windowUs}L") + 1)))
    val rb = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__bucket", expr(s"__rus div ${windowUs}L"))
    lb.join(rb, Seq("__bucket"))
      .filter(col("__lus") <= col("__rus") &&
        col("__lus") > col("__rus") - windowUs)
      .drop("__bucket", "__lus", "__rus")
  }
}
