package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataSelectionSpec extends SparkSpec {
  import spark.implicits._

  // target slice talks about "alpha beta"; junk talks about "zzz yyy"
  private def corpus = Seq(
    (1L, "alpha beta alpha beta gamma", true),
    (2L, "alpha beta gamma alpha beta", true),
    (10L, "alpha beta gamma delta", false),   // target-like raw doc
    (11L, "zzz yyy zzz yyy zzz", false),      // off-domain raw doc
    (12L, "zzz yyy xxx www", false),
    (13L, "", false))                          // empty: 0 grams
    .toDF("doc_id", "text", "is_t")

  test("dsirLogWeights: target-like docs outscore off-domain docs") {
    val w = DataSelection.dsirLogWeights(corpus, "doc_id", "text",
      col("is_t")).collect().map(r =>
        r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_grams"), r.getAs[Double]("log_w"))).toMap
    // unigrams + bigrams: 5 tokens -> 9 grams, 4 -> 7, 0 -> 0
    assert(w(1L)._1 === 9L)
    assert(w(10L)._1 === 7L)
    assert(w(13L) === ((0L, 0.0)))
    // the target-like raw doc must carry a HIGHER weight than both
    // off-domain docs — the DSIR ordering the operator exists for
    assert(w(10L)._2 > w(11L)._2, s"target-like vs off-domain: $w")
    assert(w(10L)._2 > w(12L)._2, s"target-like vs off-domain: $w")
    // off-domain grams are absent from the target LM: weight < 0
    assert(w(11L)._2 < 0.0 && w(12L)._2 < 0.0, w.toString)
  }

  test("dsirLogWeights: weight decomposes as sum of per-gram log ratios") {
    // tiny corpus computable by hand: target = doc 1 "a a", raw adds
    // doc 2 "b". grams: doc1 {a, a, "a a"}, doc2 {b}.
    // counts: a: raw 2 t 2; "a a": raw 1 t 1; b: raw 1 t 0.
    // totals: n_raw 4, n_t 3, vocab 3.
    val tiny = Seq((1L, "a a", true), (2L, "b", false))
      .toDF("doc_id", "text", "is_t")
    val w = DataSelection.dsirLogWeights(tiny, "doc_id", "text",
      col("is_t")).collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Double]("log_w")).toMap
    def t(ct: Long, cr: Long) =
      math.log((ct + 1.0) / (3 + 3.0)) - math.log((cr + 1.0) / (4 + 3.0))
    val exp1 = BigDecimal(2 * t(2, 2) + t(1, 1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(t(0, 1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(w(1L) - exp1) < 1e-9, s"got ${w(1L)} want $exp1")
    assert(math.abs(w(2L) - exp2) < 1e-9, s"got ${w(2L)} want $exp2")
  }

  test("dsirSelect: keeps the top-weight slice, ties at threshold included") {
    val sel = DataSelection.dsirSelect(corpus, "doc_id", "text",
      col("is_t"), keepPermille = 500)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // 6 docs, keep >= half by weight: the target docs and the
    // target-like raw doc must be in; the off-domain pair must be out
    assert(sel.contains(1L) && sel.contains(2L) && sel.contains(10L), sel.toString)
    assert(!sel.contains(11L) && !sel.contains(12L), sel.toString)
  }
}
