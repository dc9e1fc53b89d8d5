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

  /** Length-bucketed batch assignment — the padding-efficiency
    * batching a fine-tuning dataloader runs when sequences are NOT
    * packed: group examples of similar token length, batch within the
    * group, and per-batch padding cost collapses (pad-to-longest
    * inside a batch of near-equal lengths wastes ~nothing, vs up to
    * maxLen-1 per row under random batching).
    *
    * Bucket = floor(log2(tokens)) (power-of-two length bands);
    * batch = consecutive `batchSize` rows within the bucket in
    * deterministic `orderCol` order. One row_number window per
    * bucket — the same single-shuffle shape as [[packByBudget]].
    * Returns the input plus (bucket, batch_id, pad_cost) where
    * pad_cost is that row's padding waste to its batch max. */
  def lengthBucketedBatches(df: DataFrame, orderCol: String,
      tokenCol: String, batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    val bucket = floor(log2(greatest(col(tokenCol).cast("double"), lit(1.0))))
      .cast("long")
    val wRank = Window.partitionBy(col("__bucket")).orderBy(col(orderCol))
    val withBatch = df.withColumn("__bucket", bucket)
      .withColumn("batch_id",
        ((row_number().over(wRank) - 1) / batchSize).cast("long"))
    val wBatch = Window.partitionBy(col("__bucket"), col("batch_id"))
    withBatch
      .withColumn("pad_cost",
        (max(col(tokenCol)).over(wBatch) - col(tokenCol)).cast("long"))
      .withColumnRenamed("__bucket", "bucket")
  }

  /** Concatenate-then-chunk sequence construction — the actual packed
    * context windows a dataloader reads, not just the manifest: per
    * shard, documents' token arrays are concatenated in `orderCol`
    * order and cut into sequences of exactly `seqLen` tokens (the last
    * sequence per shard may be shorter). Documents span sequence
    * boundaries, matching GPT-style pre-training layout.
    *
    * Plan shape: one window (exclusive prefix sum of lengths → each
    * document's global start offset), then a pure map-side explode of
    * each document into per-sequence slices (a document overlaps
    * `len/seqLen + <=1` sequences), then one hash aggregation on
    * (shard, seq_id) that reassembles each sequence's tokens in
    * offset order. Two shuffles total, both on keys; every output row
    * is bounded by `seqLen` tokens, so sequence reassembly can never
    * concentrate mass — the operator streams at any corpus size
    * provided shards are sized so one shard's window partition fits an
    * executor (same contract as [[packByBudget]]).
    *
    * Output: (shard, seq_id, n_docs, ids, doc_starts, n_toks) where
    * `ids` is the packed token array, `doc_starts` the 1-based
    * within-sequence positions where a NEW document begins (what the
    * dataloader needs to reset attention across packed documents — a
    * document continuing from the previous sequence contributes no
    * start), and `seq_id` is 0-based per shard. */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
      idsCol: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    val L = lit(seqLen.toLong)
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df
      .select(col(shardCol).as("shard"), col(orderCol).as("ord"),
        col(idsCol).as("ids"))
      .withColumn("len", size(col("ids")).cast("long"))
      .withColumn("start", coalesce(sum(col("len")).over(w), lit(0L)))
      .filter(col("len") > 0)
    // A document starting at `start` with `len` tokens overlaps
    // sequences floor(start/L) .. floor((start+len-1)/L); each overlap
    // contributes the slice of its ids that falls inside the sequence.
    val pieces = offsets
      .select(col("shard"), col("start"), col("len"), col("ids"),
        explode(sequence(
          floor(col("start") / L).cast("long"),
          floor((col("start") + col("len") - lit(1L)) / L).cast("long")))
          .as("seq_id"))
      .withColumn("lo", greatest(col("start"), col("seq_id") * L))
      .withColumn("hi", least(col("start") + col("len"), (col("seq_id") + lit(1L)) * L))
      .select(col("shard"), col("seq_id"), col("lo").as("piece_start"),
        (col("lo") === col("start")).as("is_doc_start"),
        slice(col("ids"), (col("lo") - col("start") + lit(1L)).cast("int"),
          (col("hi") - col("lo")).cast("int")).as("piece"))
    pieces.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        array_sort(collect_list(struct(col("piece_start"),
          col("is_doc_start"), col("piece")))).as("__ps"))
      .select(col("shard"), col("seq_id"), col("n_docs"),
        flatten(transform(col("__ps"), p => p.getField("piece"))).as("ids"),
        transform(
          filter(col("__ps"), p => p.getField("is_doc_start")),
          p => p.getField("piece_start") - col("seq_id") * L + lit(1L))
          .as("doc_starts"))
      .withColumn("n_toks", size(col("ids")).cast("long"))
  }
}
