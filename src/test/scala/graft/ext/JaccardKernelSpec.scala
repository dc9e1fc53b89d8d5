package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The fused Jaccard kernels must be BIT-IDENTICAL to the composed
  * builtins they replace — the HOF formulation is kept here as the
  * in-test oracle. */
class JaccardKernelSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "EDIT the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
    (4L, "wholly different content with no overlap at all here"),
    (5L, "two words"),          // fewer than n=3 tokens: empty shingle set
    (6L, "café naïve résumé café naïve tokens"),
    (7L, "a a a a a a"))         // degenerate: one distinct shingle

  test("tokenShingleJaccard equals the HOF array_intersect/union formulation") {
    val n = 3
    val docs = texts.toDF("id", "text")
      .select(col("id"), graft.ext.TextAnalysis.tokens(col("text")).as("toks"))
    def sh(c: org.apache.spark.sql.Column) = array_distinct(
      transform(sequence(lit(0), greatest(size(c) - n, lit(-1))),
        i => array_join(slice(c, i + 1, lit(n)), " ")))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.toks").as("t1"), col("b.toks").as("t2"))
      .filter(size(col("t1")) >= n && size(col("t2")) >= n)
    val out = pairs.select(col("id1"), col("id2"),
        round(graft.functions.Jaccard.tokenShingleJaccard(
          col("t1"), col("t2"), n), 4).as("fused"),
        round(size(array_intersect(sh(col("t1")), sh(col("t2")))).cast("double") /
          size(array_union(sh(col("t1")), sh(col("t2")))), 4).as("hof"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("fused") === r.getAs[Double]("hof"),
        s"pair (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // identical docs → 1.0; disjoint docs → 0.0 (sanity anchors)
    val m = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("fused")).toMap
    assert(m((1L, 3L)) > 0.3 && m((1L, 3L)) < 1.0)
    assert(m((1L, 4L)) === 0.0)
  }

  test("intersectSize equals size(array_intersect) including dup elements") {
    val df = Seq(
      (Seq("a", "b", "c", "c"), Seq("c", "c", "d", "a")),
      (Seq.empty[String], Seq("x")),
      (Seq("x"), Seq.empty[String]),
      (Seq("u", "u"), Seq("u")),
      (Seq("é", "e"), Seq("é"))).toDF("a", "b")
    val out = df.select(
        graft.functions.Jaccard.intersectSize(col("a"), col("b")).as("fused"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("minHashDupPairs end-to-end unchanged by the fused verify") {
    // the q_d2 construction in miniature: planted near-dups must come
    // back with the same exact jaccard values as the HOF verify gave
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "PREFIX alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "unrelated words entirely disjoint from everything else here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashDupPairs(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.5)
      .collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert(p.getAs[Long]("id1") === 1L && p.getAs[Long]("id2") === 2L)
    // J = 8 shared / (8 + 9 + 1 extra... ) — exact hand value: doc1 has
    // 8 shingles, doc2 has 9, shared 8 → 8/9 = 0.8889
    assert(p.getAs[Double]("jaccard") === 0.8889, p.toString)
  }
}
