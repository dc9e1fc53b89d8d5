package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer training — the
  * subword-vocabulary step of a training-data pipeline (q_x12's
  * token-id encoding consumes a vocabulary like the one produced
  * here).
  *
  * Scale design (the classic Sennrich formulation, distributed):
  * training runs on the WORD-FREQUENCY DICTIONARY, not the corpus —
  * one corpus pass builds (word, freq), and every merge round after
  * that costs O(distinct words), which is Zipf-bounded (millions)
  * no matter how many TB the corpus is. Each round is one
  * pair-count aggregation (map-side partial agg) + a driver argmax
  * (a single tiny row, IVF-centroid pattern) + a map-side greedy
  * re-segmentation; lineage is cut per round with localCheckpoint
  * so k rounds don't stack k plans.
  *
  * Determinism: the winning pair is argmax by (total count DESC,
  * pair string ASC) — a total order, so the merge sequence is a
  * pure function of the corpus.
  */
object BpeTrainer {

  /** (w, syms, freq): per distinct word, the original spelling, its
    * character segmentation, and corpus frequency. `w` rides along so
    * the round-trip invariant (concat(syms) == w) stays checkable
    * after any number of merges. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), split(col("w"), "").as("syms"), col("freq"))

  /** Adjacent-pair totals over the dictionary, weighted by word
    * frequency (multiplicity within a word counts). Pair rendered as
    * "a b" (space-joined — symbols never contain spaces: tokens are
    * whitespace-split). */
  def pairCounts(wf: DataFrame): DataFrame =
    wf.filter(size(col("syms")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
        i => concat(element_at(col("syms"), i), lit(" "),
          element_at(col("syms"), i + 1)))).as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("c"))

  /** Greedy left-to-right application of one merge (a, b) → ab to a
    * symbol-array column: a functional fold — merged symbols are
    * immediately eligible as the LEFT side of the next comparison,
    * exactly the sequential BPE semantics. */
  def applyMerge(syms: org.apache.spark.sql.Column, a: String, b: String)
      : org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train `numMerges` merges. Returns the ordered merge list and the
    * final dictionary segmentation. Stops early if no pair repeats. */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int): (Seq[(String, String)], DataFrame) = {
    var wf = wordFreq(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts(wf).orderBy(col("c").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((a, b))
        wf = wf.select(col("w"), applyMerge(col("syms"), a, b).as("syms"),
          col("freq")).localCheckpoint()
      }
      i += 1
    }
    (merges.toSeq, wf)
  }

  /** Encode a symbol-array column with an ordered merge list (the
    * inference face: k map-side folds, no shuffle). */
  def encode(syms: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    merges.foldLeft(syms) { case (c, (a, b)) => applyMerge(c, a, b) }
}
