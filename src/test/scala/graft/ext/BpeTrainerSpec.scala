package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Distributed BPE training: deterministic merge order, greedy
  * left-to-right application, round-trip safety. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("learns merges by (count desc, pair asc); greedy application") {
    // "aaab"×3 + "aab"×2: pair totals aa=8, ab=5 ⇒ first merge (a,a).
    // Then "aa a"=3, "a b"=3, "aa b"=2 ⇒ tie broken by pair string:
    // "a b" < "aa a" ⇒ second merge (a,b).
    val docs = Seq("aaab aaab aaab", "aab aab").toDF("text")
    val (merges, wf) = BpeTrainer.train(spark, docs, "text", numMerges = 2)
    assert(merges == Seq(("a", "a"), ("a", "b")), merges.toString)
    val segs = wf.select($"w", array_join($"syms", "|").as("s"))
      .as[(String, String)].collect().toMap
    // greedy: aaab → [aa, a, b] → ab merge touches a+b ⇒ [aa, ab]
    assert(segs("aaab") == "aa|ab", segs.toString)
    assert(segs("aab") == "aa|b", segs.toString)
  }

  test("round-trip: segmentations concatenate back to every word") {
    val docs = graft.Tables.documents(spark, sf0001)
    val (merges, wf) = BpeTrainer.train(spark, docs, "text", numMerges = 8)
    assert(merges.size == 8)
    assert(wf.filter(array_join($"syms", "") =!= $"w").count() == 0)
    // vocab bounded by base alphabet + merges
    val nBase = docs.select(explode(TextAnalysis.tokens($"text")).as("w"))
      .select(explode(split($"w", "")).as("c")).distinct().count()
    val nVocab = wf.select(explode($"syms").as("s")).distinct().count()
    assert(nVocab <= nBase + 8, s"vocab $nVocab > base $nBase + 8")
  }

  test("encode applies the merge list to unseen text map-side") {
    val docs = Seq("aaab aaab aaab", "aab aab").toDF("text")
    val (merges, _) = BpeTrainer.train(spark, docs, "text", numMerges = 2)
    val enc = Seq("aabab").toDF("w")
      .select(BpeTrainer.encode(split($"w", ""), merges).as("syms"))
      .select(array_join($"syms", "|")).as[String].head()
    // aabab: (a,a) ⇒ [aa,b,a,b]; (a,b) ⇒ [aa,b,ab]
    assert(enc == "aa|b|ab", enc)
  }
}
