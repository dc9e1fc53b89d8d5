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

  test("hashed-feature face (10k buckets) agrees with the exact face at gate scale") {
    // the 100 TB face: grams hashed into 10^4 buckets bound the LM
    // count table regardless of vocabulary. Hash collisions perturb
    // individual weights, so the contract is SELECTION agreement with
    // the exact face at the gate's own settings (q_o35: target = src1,
    // keep top 200 permille) on the gate-scale corpus — the q_n21
    // recall convention (brute face as ground truth).
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    def ids(sel: org.apache.spark.sql.DataFrame) =
      sel.select("doc_id").as[Long].collect().toSet
    val exact = ids(DataSelection.dsirSelect(docs, "doc_id", "text",
      col("source") === "src1", keepPermille = 200))
    val hashed = ids(DataSelection.dsirSelect(docs, "doc_id", "text",
      col("source") === "src1", keepPermille = 200,
      hashBuckets = Some(10000)))
    val overlap = (exact intersect hashed).size.toDouble / exact.size
    info(f"selection overlap exact-vs-hashed: $overlap%.4f " +
      s"(exact ${exact.size}, hashed ${hashed.size})")
    assert(overlap >= 0.9, f"overlap $overlap%.4f below 0.9")
    // the hashed face keeps a comparable-size slice (ties differ)
    assert(hashed.size <= exact.size * 2 && hashed.size * 2 >= exact.size,
      s"sizes diverged: exact ${exact.size}, hashed ${hashed.size}")
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
