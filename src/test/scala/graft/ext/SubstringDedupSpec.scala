package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exact substring dedup (Lee et al. repeated-substring removal at
  * k-shingle granularity): first occurrence survives, later ones are
  * cut span-exactly, and the surviving corpus carries no cross-doc
  * k-token repeat. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val k = 5
  // shared is 7 tokens (> k): spans must be cut exactly, not just one
  // shingle's worth
  private val shared = "s1 s2 s3 s4 s5 s6 s7"
  private lazy val docs = Seq(
    (1L, s"a1 a2 a3 $shared b1 b2 b3"),          // first occurrence: keeps shared
    (2L, s"c1 c2 c3 c4 $shared d1 d2 d3"),       // later occurrence: loses shared
    (3L, "u1 u2 u3 u4 u5 u6 u7 u8"),             // untouched
    (4L, s"e1 e2 e3 e4 e5 $shared"),             // later occurrence at tail
    (5L, "r1 r2 r3 r4 r5 x1 x2 r1 r2 r3 r4 r5")  // within-doc repeat, 2nd cut
  ).toDF("doc_id", "text")

  private def result: Map[Long, String] =
    SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k)
      .as[(Long, String)].collect().toMap

  test("first occurrence keeps the shared span; later occurrences lose exactly it") {
    val r = result
    assert(r(1L) == s"a1 a2 a3 $shared b1 b2 b3")
    assert(r(2L) == "c1 c2 c3 c4 d1 d2 d3")
    assert(r(3L) == "u1 u2 u3 u4 u5 u6 u7 u8")
    assert(r(4L) == "e1 e2 e3 e4 e5")
    assert(r(5L) == "r1 r2 r3 r4 r5 x1 x2")
  }

  test("surviving corpus has no k-token shingle in more than one document") {
    val out = SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k)
    val repeats = out
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.shingles(col("text"), k))).as("g"))
      .groupBy(col("g")).agg(countDistinct(col("doc_id")).as("n"))
      .filter(col("n") > 1).count()
    assert(repeats == 0L)
  }

  test("documents shorter than k tokens and empty docs pass through / drop") {
    val tiny = Seq((1L, "a b c"), (2L, "   "), (3L, "a b c d e f")).toDF("doc_id", "text")
    val r = SubstringDedup.dedupSubstrings(tiny, "doc_id", "text", k)
      .as[(Long, String)].collect().toMap
    // doc 2 tokenizes to nothing and drops; short docs survive verbatim
    assert(r == Map(1L -> "a b c", 3L -> "a b c d e f"))
  }

  test("a fully-duplicated later document drops entirely") {
    val pair = Seq(
      (1L, "p1 p2 p3 p4 p5 p6"),
      (2L, "p1 p2 p3 p4 p5 p6")).toDF("doc_id", "text")
    val r = SubstringDedup.dedupSubstrings(pair, "doc_id", "text", k)
      .as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "p1 p2 p3 p4 p5 p6"))
  }
}
