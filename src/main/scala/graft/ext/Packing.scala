package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing (driver extension, SURVEY §7 module
  * 6): assign documents to fixed-budget training sequences — the
  * "concatenate then chunk into context windows" layout every LLM
  * pre-training build runs after filtering/dedup.
  *
  * Semantics: within each shard (`shardCol`), documents are taken in
  * deterministic `orderCol` order and streamed into bins of
  * approximately `budget` tokens: a document starts a new bin when the
  * tokens already placed reach the next budget boundary. A document
  * longer than the budget gets a bin (region) of its own. Bins can
  * overflow by at most one document — the standard streaming-fill
  * trade: exact first-fit packing is inherently sequential, while this
  * form is one exclusive-prefix-sum window per shard, so it scales to
  * any corpus size with a single shuffle on the shard key (and at
  * 100 TB shards are sized so each window partition fits an executor).
  */
object Packing {

  /** Add a `bin` column: `floor(exclusive_running_sum(tokens) /
    * budget)` per shard in `orderCol` order. Deterministic, relational
    * (SQL-oracle-able), one window scan. */
  def packByBudget(df: DataFrame, shardCol: String, orderCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bin",
      floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)) / budget))
  }

  /** Per-bin packing report: documents and token mass per (shard,
    * bin) — the manifest a sequence-writer consumes. */
  def packingManifest(df: DataFrame, shardCol: String, orderCol: String,
      tokenCol: String, budget: Long): DataFrame =
    packByBudget(df, shardCol, orderCol, tokenCol, budget)
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))
}
