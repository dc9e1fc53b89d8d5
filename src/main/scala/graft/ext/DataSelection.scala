package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling — the DSIR recipe
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023) re-expressed relationally: score every
  * raw document by how much more likely its n-grams are under a
  * TARGET-domain bag-of-grams language model than under the raw-corpus
  * model, then keep the top mass. The importance weight of doc x is
  *
  *   log w(x) = Σ_{g ∈ grams(x)} [ log p̂_target(g) − log p̂_raw(g) ]
  *
  * over unigram + bigram word features with add-one smoothing against
  * the shared vocabulary (the paper hashes grams into 10⁴ buckets to
  * bound the feature space; the unhashed gram table is kept here
  * because both engines then replay the EXACT same counts — hashing is
  * an engine-specific fingerprint the DuckDB oracle could not
  * reproduce, and the gram count table is vocabulary-sized either
  * way).
  *
  * Scale shape: gram explode is map-side; the corpus-scale shuffles
  * key on the gram (one hash aggregate builds both LMs in a single
  * pass — target counts ride as a conditional sum next to raw counts)
  * and on the doc id (per-doc weight rollup); the occurrence→count
  * join is a gram-keyed equi-join AQE plans freely; LM totals are a
  * 1-row broadcast. Selection reuses [[Profiling.exactQuantiles]]
  * (OrderedPrefix two-level rank) for the keep threshold — no global
  * sort, no data-sized window, nothing driver-side.
  *
  * Reference scope: `/root/reference` has no data-selection surface;
  * this extends the training-data pipeline family (quality scoring →
  * dedup → decontaminate → SELECT → pack) the charter asks for.
  */
object DataSelection {

  /** Unigrams ++ bigrams of a token array (bigrams joined by one
    * space). Guarded so `sequence` never runs backwards on 0/1-token
    * docs. */
  private def grams(toks: Column): Column =
    concat(toks,
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>")))

  /** One row per gram OCCURRENCE: (doc_id, __is_t, gram). */
  private def gramOccurrences(docs: DataFrame, idCol: String,
      textCol: String, targetPred: Column): DataFrame =
    docs.select(col(idCol).as("doc_id"), targetPred.as("__is_t"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("doc_id"), col("__is_t"),
        explode(grams(col("__tk"))).as("gram"))

  /** Per-document DSIR log importance weight: (doc_id, n_grams,
    * log_w), log_w rounded to 4 dp (a sum of logs; the repo's
    * non-grid-double convention). Docs with no tokens report
    * (0, 0.0). `targetPred` marks the target-domain slice WITHIN
    * `docs` — the raw LM counts every doc, the target LM only the
    * marked ones, both from one aggregate.
    *
    * `hashBuckets` switches on the paper's hashed-feature face
    * (Xie et al. §3: grams hashed into 10⁴ buckets): the LM keys on
    * `hash(gram) mod B` instead of the gram string, bounding the
    * count-table to B rows regardless of corpus vocabulary — the
    * 100 TB shape, where the unhashed gram table is ~10⁹ rows. Same
    * code path; only the feature key changes (smoothing vocabulary
    * becomes the occupied-bucket count). The unhashed face stays the
    * oracle face: both engines replay its exact counts, while a hash
    * choice is an engine fingerprint DuckDB cannot reproduce —
    * selection agreement between the faces is measured by
    * DataSelectionSpec at gate scale. */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, hashBuckets: Option[Int] = None): DataFrame = {
    val g0 = gramOccurrences(docs, idCol, textCol, targetPred)
    val g = hashBuckets.fold(g0)(b =>
      g0.withColumn("gram", pmod(xxhash64(col("gram")), lit(b.toLong))))
    val counts = g.groupBy(col("gram")).agg(
      count(lit(1)).as("__c_raw"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("__c_t"))
    val totals = counts.agg(sum(col("__c_raw")).as("__n_raw"),
      sum(col("__c_t")).as("__n_t"), count(lit(1)).as("__vocab"))
    val term =
      log((col("__c_t") + 1.0) / (col("__n_t") + col("__vocab"))) -
      log((col("__c_raw") + 1.0) / (col("__n_raw") + col("__vocab")))
    val per = g.join(counts, Seq("gram"))
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), round(sum(term), 4).as("log_w"))
    docs.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("log_w"), lit(0.0)).as("log_w"))
  }

  /** Deterministic DSIR selection: keep the `keepPermille`/1000 of
    * docs with the highest importance weight. The paper resamples
    * with Gumbel noise; the replayable variant selects by the exact
    * (1000−keep) per-mille order statistic of the weights
    * ([[Profiling.exactQuantiles]] — integer-exact on the 4-dp
    * fixed-point weights), keeping ties at the threshold (≥ quota,
    * deterministic). Returns the selected (doc_id, log_w). */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, keepPermille: Int,
      hashBuckets: Option[Int] = None): DataFrame = {
    require(keepPermille >= 1 && keepPermille <= 999,
      s"keepPermille in [1,999]: $keepPermille")
    val w = dsirLogWeights(docs, idCol, textCol, targetPred, hashBuckets)
      .withColumn("__wfp", round(col("log_w") * 10000, 0).cast("long"))
      .localCheckpoint(true)
    val thr = Profiling.exactQuantiles(w, col("__wfp"),
        Seq(1000 - keepPermille))
      .select(col("value").as("__thr"))
    w.crossJoin(broadcast(thr))
      .filter(col("__wfp") >= col("__thr"))
      .select(col("doc_id"), col("log_w"))
  }
}
