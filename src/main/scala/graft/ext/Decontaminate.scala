package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (driver extension, SURVEY §7 module 6):
  * remove training documents that share a word n-gram with an
  * evaluation/benchmark corpus — the standard pre-training hygiene
  * step (n-gram collision decontamination, n ≈ 8–13 in published
  * pipelines).
  *
  * Scale design: the benchmark side is tiny by construction (eval
  * sets are MBs; the corpus is the 100 TB side), so its distinct
  * n-gram set is broadcast and the corpus side never shuffles — each
  * corpus partition explodes its own grams map-side and probes the
  * broadcast hash relation. Corpus cost is one narrow pass; the only
  * exchange is the per-document hit aggregation, keyed on the (rare)
  * contaminated ids.
  */
object Decontaminate {

  /** Distinct word n-grams of a benchmark corpus (the broadcast
    * side). Tokenization matches [[TextAnalysis.shingles]]. */
  def benchmarkGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(TextAnalysis.shingles(col(textCol), n)).as("gram"))
      .distinct()

  /** Per-document contamination report: documents sharing ≥ 1 word
    * n-gram with the benchmark, with the count of distinct matching
    * grams. Clean documents are absent from the report.
    *
    * @return (idCol, n_hits)
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    val grams = docs.select(col(idCol),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("gram"))
    grams.join(broadcast(benchmarkGrams(bench, benchTextCol, n)), Seq("gram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** Drop face: the corpus minus every contaminated document. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame =
    docs.join(
      contaminationReport(docs, idCol, textCol, bench, benchTextCol, n)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Bloom-filtered contamination flags: the constant-size variant of
    * [[contaminationReport]] for when even the benchmark's distinct
    * n-gram SET is too big to broadcast as an exact hash relation
    * (stacked eval suites at 100 TB-corpus scale). The benchmark
    * grams are folded into a Bloom filter (`DataFrameStatFunctions
    * .bloomFilter`, built distributed via treeAggregate); the corpus
    * side probes it map-side — same no-shuffle probe topology, but
    * the broadcast payload is a few MB regardless of gram count.
    *
    * Bloom semantics: NO false negatives (every truly contaminated
    * doc is flagged), bounded false positives (fpp). Callers route
    * flagged docs to the exact [[contaminationReport]] for
    * confirmation — the classic two-phase filter.
    *
    * @return (idCol, n_maybe_hits) for docs with ≥1 probable hit
    */
  def bloomContaminationFlags(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      expectedGrams: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = benchmarkGrams(bench, benchTextCol, n)
      .stat.bloomFilter("gram", expectedGrams, fpp)
    val spark = docs.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => g != null && bloomBc.value.mightContainString(g))
    docs.select(col(idCol),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("gram"))
      .filter(mightContain(col("gram")))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_maybe_hits"))
  }
}
