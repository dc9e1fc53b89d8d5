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
      expectedGrams: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // optimal bit count for (n, p) — the standard -n·ln p / (ln 2)² of
    // Bloom'70, the same sizing the sketch library derives from fpp
    val numBits = math.max(64L, math.ceil(
      -expectedGrams.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // build side: distinct benchmark grams → one binary sketch row.
    // BloomFilterAggregate is constructed directly (Catalyst keeps
    // bloom_filter_agg off the public registry); xxhash64 (seed 42)
    // on both sides keeps build and probe aligned.
    val benchBloom = benchmarkGrams(bench, benchTextCol, n)
      .agg(GraftBridge.column(new BloomFilterAggregate(
          new XxHash64(Seq(UnresolvedAttribute("gram")), 42L),
          Literal(expectedGrams), Literal(numBits)).toAggregateExpression())
        .as("bf"))
    val probe = GraftBridge.column(BloomFilterMightContain(
      ScalarSubquery(benchBloom.queryExecution.analyzed),
      new XxHash64(Seq(UnresolvedAttribute("gram")), 42L)))
    docs.select(col(idCol),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("gram"))
      .filter(probe)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_maybe_hits"))
  }
}
