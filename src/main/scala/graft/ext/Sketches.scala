package graft.ext

import org.apache.spark.sql.DataFrame
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
}
