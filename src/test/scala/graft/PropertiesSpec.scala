package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY §5 test plan #4): MERGE
  * idempotence, URL-normalization idempotence, pair-query symmetry,
  * orphan-cleanup fixpoint, fingerprint reference equality.
  * Sized small and capped at 10 cases each — every case runs Spark
  * jobs. */
object PropertiesSpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private val keyGen = Gen.alphaLowerStr.map(_.take(4)).suchThat(_.nonEmpty)
  private val kvGen = Gen.listOfN(12, Gen.zip(keyGen, Gen.choose(0, 99)))

  property("mergeByKey is idempotent") = forAll(kvGen, kvGen) { (e, i) =>
    val existing = e.toDF("k", "v").dropDuplicates("k")
    val incoming = i.toDF("k", "v")
    val once = graft.store.GraphStore.mergeByKey(existing, incoming, Seq("k"))
    val twice = graft.store.GraphStore.mergeByKey(once, incoming, Seq("k"))
    // collect-and-sort compare: exceptAll over two window+monotonic-id
    // plans sharing parents hits INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    once.as[(String, Int)].collect().sorted.toSeq ==
      twice.as[(String, Int)].collect().sorted.toSeq
  }

  property("mergeByKey preserves PK uniqueness") = forAll(kvGen, kvGen) { (e, i) =>
    val out = graft.store.GraphStore.mergeByKey(
      e.toDF("k", "v").dropDuplicates("k"), i.toDF("k", "v"), Seq("k"))
    out.groupBy("k").count().filter(col("count") > 1).count() == 0
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("", "http://", "HTTPS://", "https://")
    host <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(8).mkString)
    path <- Gen.listOf(Gen.alphaNumChar).map(_.take(6).mkString)
    suffix <- Gen.oneOf("", "/", "?q=1", "#frag", "/?a=b#c")
  } yield s"$scheme$host.example/$path$suffix"

  property("normalizeUrl is idempotent") = forAll(Gen.listOfN(8, urlGen)) { urls =>
    val once = urls.toDF("u")
      .select(graft.etl.UrlFunctions.normalizeUrl(col("u")).as("n"))
      .as[String].collect().toSeq
    val again = once.toDF("u")
      .select(graft.etl.UrlFunctions.normalizeUrl(col("u")).as("n"))
      .as[String].collect().toSeq
    once == again
  }

  private val edgeGen = Gen.listOfN(15,
    Gen.zip(Gen.choose(1, 6).map("l" + _), Gen.choose(1, 4).map("k" + _)))
  private val catGen = Gen.listOfN(6,
    Gen.zip(Gen.choose(1, 6).map("l" + _), Gen.oneOf("A", "B", "C")))

  property("interconnections invariant under input row order") =
    forAll(edgeGen, catGen, Gen.choose(1L, 999L)) { (hk, bt, seed) =>
      val hkDf = hk.toDF("src", "dst")
      val btDf = bt.toDF("src", "dst").dropDuplicates("src")
      val a = graft.query.GraphQueries.interconnections(hkDf, btDf).collect().toSeq
      val b = graft.query.GraphQueries.interconnections(
        hkDf.orderBy(rand(seed)), btDf.orderBy(rand(seed + 1))).collect().toSeq
      a == b
    }

  property("orphans is a fixpoint: removing orphans leaves none") =
    forAll(edgeGen, Gen.listOfN(8, Gen.choose(1, 9).map("k" + _))) { (hk, dims) =>
      val edges = hk.toDF("src", "dst")
      val dimDf = dims.toDF("name").distinct()
      val kept = dimDf.join(edges.select(col("dst")).distinct(),
        col("name") === col("dst"), "left_semi")
      graft.query.GraphQueries.orphans(kept, edges).count() == 0
    }

  property("delta maintenance: full recompute = old result + delta of new edges") =
    forAll(edgeGen, edgeGen, catGen) { (oldE, newE, bt) =>
      val oldDf = oldE.toDF("src", "dst").distinct()
      val newDf = newE.toDF("src", "dst").distinct()
        .exceptAll(oldDf) // a true delta: edges not already stored
      val allDf = oldDf.unionByName(newDf)
      val btDf = bt.toDF("src", "dst").dropDuplicates("src")
      def full(e: org.apache.spark.sql.DataFrame) =
        graft.query.GraphQueries.interconnections(
          e, btDf, canonicalPairs = true, limit = Int.MaxValue)
          .collect().map(_.toSeq).toSet
      val delta = graft.query.GraphQueries
        .interconnectionsDelta(newDf, allDf, btDf)
        .collect().map(_.toSeq).toSet
      full(allDf) == (full(oldDf) ++ delta)
    }

  property("motif translation equals the hand-written join DAG") =
    forAll(edgeGen, catGen) { (hk, bt) =>
      val hkDf = hk.toDF("src", "dst")
      val btDf = bt.toDF("src", "dst").dropDuplicates("src")
      val motif = graft.query.Motif.find(
          Map("HK" -> hkDf, "BT" -> btDf),
          "(url1)-[:HK]->(kw); (url2)-[:HK]->(kw); " +
            "(url1)-[:BT]->(c1); (url2)-[:BT]->(c2)")
        .filter(col("url1") < col("url2") && col("c1") =!= col("c2"))
        .select("url1", "c1", "url2", "c2", "kw")
      val direct = graft.query.GraphQueries.interconnections(
        hkDf, btDf, canonicalPairs = true, limit = Int.MaxValue)
      motif.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet
    }

  private val asciiText = Gen.listOf(
    Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.take(40).mkString)

  property("fingerprint equals reference fold") = forAll(Gen.listOfN(6, asciiText)) { texts =>
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 2147483647L)
    val out = texts.toDF("t")
      .select(graft.ext.TextAnalysis.fingerprint(col("t"))).as[Long].collect().toSeq
    out == texts.map(ref)
  }

  // random per-shard documents with 0..9 tokens each
  private val shardDocsGen: Gen[List[(String, Long, List[String])]] = for {
    nShards <- Gen.choose(1, 3)
    docs <- Gen.listOfN(8, for {
      sh <- Gen.choose(0, nShards - 1).map(i => s"s$i")
      len <- Gen.choose(0, 9)
      toks <- Gen.listOfN(len, Gen.choose(0, 99).map(_.toString))
    } yield (sh, toks))
  } yield docs.zipWithIndex.map { case ((sh, ts), i) => (sh, i.toLong, ts) }

  property("packSequences reassembles exactly the concatenated stream") =
    forAll(shardDocsGen, Gen.choose(1, 7)) { (docs, seqLen) =>
      val df = docs.toDF("shard", "ord", "ids")
      val out = graft.ext.Packing.packSequences(df, "shard", "ord", "ids", seqLen)
        .select(col("shard"), col("seq_id"), col("ids"))
        .as[(String, Long, Seq[String])].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.groupBy(_._1).forall { case (sh, ds) =>
        val stream = ds.sortBy(_._2).flatMap(_._3)
        val expect = stream.grouped(seqLen).toSeq
        val got = out.getOrElse(sh, Array.empty[(String, Long, Seq[String])])
          .map(_._3).toSeq
        // exact reassembly: contiguous windows of seqLen, ids 0..n-1,
        // last window ragged, token order preserved across documents
        got == expect &&
          out.getOrElse(sh, Array.empty[(String, Long, Seq[String])])
            .map(_._2).toSeq == expect.indices.map(_.toLong)
      }
    }
}
