package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exact and Bloom-filtered benchmark decontamination. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta different tail"),
    (4L, "totally unrelated words with no overlap at all here now")
  ).toDF("doc_id", "text")
  // bench shares an 8-gram with docs 1 and 3 (their first 8 tokens)
  private lazy val bench = Seq(
    "alpha beta gamma delta epsilon zeta eta theta").toDF("text")

  test("exact report flags exactly the docs sharing an 8-gram") {
    val r = Decontaminate.contaminationReport(docs, "doc_id", "text", bench, "text", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(1L, 3L), r.toString)
    val kept = Decontaminate.decontaminate(docs, "doc_id", "text", bench, "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("bloom flags are a superset of exact hits (no false negatives)") {
    val exact = Decontaminate.contaminationReport(docs, "doc_id", "text", bench, "text", n = 8)
      .select("doc_id")
    val flagged = Decontaminate.bloomContaminationFlags(docs, "doc_id", "text",
      bench, "text", n = 8, expectedGrams = 1000L, fpp = 1e-6)
    assert(exact.join(flagged, Seq("doc_id"), "left_anti").count() == 0)
    // at fpp 1e-6 over a handful of grams, no false positives either
    assert(flagged.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }
}
