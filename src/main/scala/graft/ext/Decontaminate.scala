package graft.ext

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
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
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame =
    contaminationReportWith(docs, idCol, textCol,
      benchmarkGrams(bench, benchTextCol, n), n)

  /** [[contaminationReport]] against a prebuilt (possibly persisted)
    * [[benchmarkGrams]] set — lets a pipeline derive the benchmark
    * side once per session instead of once per run. */
  def contaminationReportWith(docs: DataFrame, idCol: String,
      textCol: String, grams: DataFrame, n: Int): DataFrame = {
    val docGrams = docs.select(col(idCol),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("gram"))
    docGrams.join(broadcast(grams), Seq("gram"))
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
    * grams fold into a Bloom filter via the native `bloom_filter_agg`
    * aggregate (the same machinery Catalyst's InjectRuntimeFilter
    * uses — see [[graft.query.Skew.runtimeBloomSession]]); the corpus
    * side probes it with the codegen'd `BloomFilterMightContain`
    * predicate over a scalar subquery, so the filter binary never
    * touches the driver and the probe stays inside whole-stage
    * codegen — no UDF, no per-row serialization.
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
      expectedGrams: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    bloomContaminationFlagsWith(docs, idCol, textCol,
      benchmarkBloom(bench, benchTextCol, n, expectedGrams, fpp), n)

  /** The benchmark-side Bloom sketch as a reusable 1-row DataFrame —
    * split out so callers can build it ONCE (e.g. via
    * [[graft.DerivedCache]]) and probe it from many pipeline runs;
    * rebuilding it inside every run re-pays the full benchmark scan +
    * shingle explode each time. BloomFilterAggregate is constructed
    * directly (Catalyst keeps bloom_filter_agg off the public
    * registry); xxhash64 (seed 42) on both sides keeps build and
    * probe aligned. Bit count is the standard −n·ln p/(ln 2)² of
    * Bloom '70. */
  def benchmarkBloom(bench: DataFrame, benchTextCol: String, n: Int,
      expectedGrams: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val numBits = math.max(64L, math.ceil(
      -expectedGrams.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    benchmarkGrams(bench, benchTextCol, n)
      .agg(GraftBridge.column(new BloomFilterAggregate(
          new XxHash64(Seq(UnresolvedAttribute("gram")), 42L),
          Literal(expectedGrams), Literal(numBits)).toAggregateExpression())
        .as("bf"))
  }

  /** Probe face of [[bloomContaminationFlags]] against a prebuilt
    * [[benchmarkBloom]] sketch (possibly persisted — Spark's cache
    * manager substitutes cached relations inside scalar subqueries,
    * so a persisted 1-row bloom is read, not rebuilt). The corpus
    * side explodes its grams map-side and probes the codegen'd
    * `BloomFilterMightContain` over the scalar subquery. */
  def bloomContaminationFlagsWith(docs: DataFrame, idCol: String,
      textCol: String, bloom: DataFrame, n: Int): DataFrame = {
    val probe = GraftBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloom.queryExecution.analyzed),
      new XxHash64(Seq(UnresolvedAttribute("gram")), 42L)))
    docs.select(col(idCol),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("gram"))
      .filter(probe)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_maybe_hits"))
  }
}
