package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  test("chunks conserve length and index contiguously") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog again and again."),
      (2L, "short"),
      (3L, "!!! ???"), // normalizes to single space — still chunked
      (4L, "")) // normalizes to empty — no chunks
      .toDF("doc_id", "text")
    val ch = ChunkDedup.cdcChunks(docs, "doc_id", "text").cache()
    val norm = docs.select(col("doc_id"),
      length(ChunkDedup.normalizeAscii(col("text"))).as("n"))
    val got = ch.groupBy("doc_id")
      .agg(sum("clen").as("mass"), count(lit(1)).as("k"), max("chunk_idx").as("mx"))
      .join(norm, Seq("doc_id"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Number]("mass").longValue === r.getAs[Number]("n").longValue,
        s"doc ${r.getAs[Long]("doc_id")}: chunk mass != normalized length")
      assert(r.getAs[Number]("mx").longValue === r.getAs[Number]("k").longValue,
        s"doc ${r.getAs[Long]("doc_id")}: chunk_idx not contiguous")
    }
    assert(ch.filter(col("doc_id") === 4L).count() === 0L)
    assert(ch.filter(col("clen") <= 0L).count() === 0L)
  }

  test("in-row chunk hashing is identical to the explode-then-slice " +
      "formulation it replaced") {
    // the pre-round-11 shape: posexplode the cut list FIRST, slice +
    // hash per chunk ROW afterwards — semantically equal, but
    // GenerateExec materialized each doc's whole char array into
    // every chunk row (~len²/divisor bytes per doc; super-linear at
    // sf10). This freezes that formulation as the reference and
    // asserts the in-row rewrite is exact on real text.
    val docs = graft.Tables.documents(spark, sf0001)
    val now = ChunkDedup.cdcChunks(docs, "doc_id", "text")
    val w = 8
    val divisor = 32
    def foldHash(codes: org.apache.spark.sql.Column) =
      aggregate(codes, lit(0L), (acc, c) => (acc * 31L + c) % ChunkDedup.Mod)
    val base = docs
      .select(col("doc_id"), ChunkDedup.normalizeAscii(col("text")).as("__t"))
      .filter(length(col("__t")) > 0)
      .select(col("doc_id"), length(col("__t")).cast("long").as("__n"),
        transform(sequence(lit(1), length(col("__t"))),
          j => ascii(col("__t").substr(j, lit(1))).cast("long")).as("__c"))
    val bounds = when(col("__n") >= w,
      filter(sequence(lit(w.toLong), col("__n")), i =>
        (foldHash(slice(col("__c"), i - (w - 1), lit(w))) * ChunkDedup.Mix
          % ChunkDedup.Mod) % divisor === 0L))
      .otherwise(array().cast("array<bigint>"))
    val lastBound = element_at(concat(array(lit(-1L)), col("__b")), -1)
    val cuts = when(lastBound === col("__n"),
        concat(array(lit(0L)), col("__b")))
      .otherwise(concat(array(lit(0L)), col("__b"), array(col("__n"))))
    val old = base.withColumn("__b", bounds).withColumn("__cuts", cuts)
      .select(col("doc_id"), col("__c"), col("__cuts"),
        posexplode(expr("slice(__cuts, 1, size(__cuts) - 1)"))
          .as(Seq("__j", "__lo")))
      .select(col("doc_id"), (col("__j") + 1).as("chunk_idx"),
        foldHash(slice(col("__c"), (col("__lo") + 1).cast("int"),
          (element_at(col("__cuts"), (col("__j") + 2).cast("int"))
            - col("__lo")).cast("int"))).as("fp"),
        (element_at(col("__cuts"), (col("__j") + 2).cast("int"))
          - col("__lo")).as("clen"))
    assert(now.exceptAll(old).count() == 0 &&
      old.exceptAll(now).count() == 0)
  }

  test("identical text yields identical chunk fingerprint sequences") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val ch = ChunkDedup.cdcChunks(docs, "doc_id", "text")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("chunk_idx"), col("fp"), col("clen"))))
        .as("sig"))
      .collect().map(r => r.getSeq[Any](1)).toSeq
    assert(ch.size === 2 && ch.head === ch(1))
  }

  test("shift resilience: a prefix edit leaves later chunks shared") {
    // the CDC selling point fixed-offset blocking lacks: insert a
    // prefix into one copy and the chunks AFTER the first boundary
    // recover identity with the unedited copy
    val body = "the common tail of this document stays byte for byte identical " * 4
    val docs = Seq((1L, body), (2L, "EDITED PREFIX inserted here " + body))
      .toDF("doc_id", "text")
    val ch = ChunkDedup.cdcChunks(docs, "doc_id", "text")
    val shared = ch.filter(col("doc_id") === 1L).select("fp", "clen")
      .intersect(ch.filter(col("doc_id") === 2L).select("fp", "clen"))
      .count()
    assert(shared >= 3L, s"expected shared tail chunks after prefix edit, got $shared")
  }

  test("doc stats attribute ownership to the first doc and dup mass to both") {
    val dup = "this exact duplicated paragraph appears in two documents verbatim " * 3
    val docs = Seq((10L, dup), (20L, dup), (30L, "entirely different content here okay"))
      .toDF("doc_id", "text")
    val st = ChunkDedup.docDedupStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val (d10, d20, d30) = (st(0), st(1), st(2))
    // doc 10 owns every chunk identity; doc 20 owns none (all inherited)
    assert(d10.getAs[Long]("n_owned") > 0L)
    assert(d20.getAs[Long]("n_owned") === 0L)
    // both carry full dup mass; the unique doc carries none
    assert(d10.getAs[Long]("dup_len") === d10.getAs[Long]("total_len"))
    assert(d20.getAs[Long]("dup_len") === d20.getAs[Long]("total_len"))
    assert(d30.getAs[Long]("dup_len") === 0L)
  }

  test("incremental probe: a prefix-edited re-crawl is mostly hit mass") {
    val body = "an unchanged long tail of content shared across the recrawl " * 5
    val store = Seq((1L, body), (2L, "other stored doc entirely")).toDF("doc_id", "text")
    val batch = Seq((100L, "NEW BANNER " + body), // mostly held
      (200L, "a wholly novel document nothing like the store"))
      .toDF("doc_id", "text")
    val st = ChunkDedup.incrementalStats(store, batch, "doc_id", "text")
      .orderBy("doc_id").collect()
    val recrawl = st(0)
    assert(recrawl.getAs[Long]("hit_len") > recrawl.getAs[Long]("new_len"),
      s"prefix-edited re-crawl should be mostly hit: $recrawl")
    val novel = st(1)
    assert(novel.getAs[Long]("hit_len") === 0L, s"novel doc hit nothing: $novel")
  }

  test("corpus savings reflect the planted duplication") {
    val dup = "repeat repeat repeat this very paragraph of shared text content " * 3
    val docs = Seq((1L, dup), (2L, dup), (3L, dup), (4L, "a lone unique document"))
      .toDF("doc_id", "text")
    val s = ChunkDedup.corpusSavings(docs, "doc_id", "text").collect().head
    assert(s.getAs[Long]("raw_mass") > s.getAs[Long]("dedup_mass"))
    assert(s.getAs[Double]("savings") > 0.5,
      s"3x-duplicated corpus should dedup > 50%, got ${s.getAs[Double]("savings")}")
    // empty-corpus guard: all-symbol docs normalize away cleanly
    val none = ChunkDedup.corpusSavings(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text").collect().head
    assert(none.isNullAt(none.fieldIndex("savings")) || none.getAs[Long]("n_chunks") === 0L)
  }
}
