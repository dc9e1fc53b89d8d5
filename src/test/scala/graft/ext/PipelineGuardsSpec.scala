package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Corpus-hygiene guards added in round 7: within-doc repetition,
  * Luhn validation, domain blocklists, and the IVF-PQ composed
  * index's recall calibration. */
class PipelineGuardsSpec extends SparkSpec {
  import spark.implicits._

  test("dupNgramStats: clean text zero, repeated block caught, short text zeros") {
    val docs = Seq(
      (1L, "a b c d e f g h"),                    // 8 distinct tokens: no dup 5-grams
      (2L, "a b c d e a b c d e"),                // full self-repeat
      (3L, "x y")                                  // shorter than n
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupNgramStats(docs, "doc_id", "text", n = 5)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out(0) == ((1L, 4L, 0L, 0.0)), out(0).toString)
    // doc 2: 6 windows, the repeated "a b c d e" occurs at pos 1 and 6
    val (_, n2, dup2, frac2) = out(1)
    assert(n2 == 6L && dup2 == 2L, out(1).toString)
    assert(frac2 > 0.0 && frac2 < 1.0)
    assert(out(2) == ((3L, 0L, 0L, 0.0)), out(2).toString)
  }

  test("luhnValid: known card test vectors and rejects") {
    val cases = Seq(
      ("4111111111111111", true),   // canonical Visa test number
      ("79927398713", true),        // the textbook Luhn example
      ("79927398710", false),
      ("4111111111111112", false),
      ("", false))
    val out = cases.map(_._1).toDF("dg")
      .select($"dg", TextAnalysis.luhnValid($"dg").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((s, want) <- cases)
      assert(out(s) == want, s"luhn($s) = ${out(s)}, want $want")
  }

  test("blockedByDomainList: suffix blocks subdomains, full-host entry is exact") {
    import graft.etl.UrlFunctions
    val bl = Seq("bad.com", "cdn.meh.org")
    val cases = Seq(
      ("https://bad.com/x", true),
      ("https://a.bad.com/x", true),
      ("https://notbad.com/x", false),       // no substring matching
      ("https://cdn.meh.org/x", true),
      ("https://meh.org/x", false),          // full-host entry only
      ("https://www.cdn.meh.org/x", true),   // entry is itself a suffix
      ("https://localhost/x", false))
    val out = cases.map(_._1).toDF("url")
      .select($"url", UrlFunctions.blockedByDomainList($"url", bl).as("b"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((u, want) <- cases)
      assert(out(u) == want, s"blocked($u) = ${out(u)}, want $want")
  }

  test("ivfPqTopK: recall vs brute clears the q_n22 floor with margin") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 10)
    val cents = Similarity.trainIvfCentroids(e, "embedding", k = 16)
    val cb = Similarity.trainPqCodebooks(e, "embedding", dim = 64, m = 8, k = 16)
    val ann = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", cents,
        dim = 64, m = 8, kCentroids = 16, codebooks = cb, k = 5,
        nprobe = 4, oversample = 8)
      .select($"query_id", $"cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select($"query_id", $"cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & bf).size.toDouble / bf.size
    info(s"ivfpq recall@5 sf0.001: $recall")
    assert(recall >= 0.3, s"recall $recall too close to the 0.25 gate floor")
  }
}
