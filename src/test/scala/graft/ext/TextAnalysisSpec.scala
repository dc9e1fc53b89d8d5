package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens and counts") {
    val out = Seq("  the quick  brown  ", "", "one").toDF("t")
      .select(TextAnalysis.tokenCount($"t").as("n")).as[Long].collect().toSeq
    assert(out == Seq(3L, 0L, 1L))
  }

  test("bpe-ish count splits words, numbers and marks") {
    val out = Seq("hello, world42! x").toDF("t")
      .select(TextAnalysis.bpeishCount($"t")).as[Long].head()
    // hello , world 42 ! x -> 6
    assert(out == 6L)
  }

  test("shingles produce n-grams; short docs yield empty") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(TextAnalysis.shingles($"t", 3).as("s")).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq())
  }

  test("langId picks the language with the most stopword hits") {
    val out = Seq(
      "the cat of the house is big",     // en
      "der hund und die katze ist da",   // de
      "le chat et la maison est grande", // fr
      "xyzzy qwerty")                    // none -> und
      .toDF("t").select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(out == Seq("en", "de", "fr", "und"))
  }

  test("punctRatio, stopwordRatio, avgWordLen on known input") {
    val df = Seq("the cat!!").toDF("t")
    val (pr, sr, awl) = df.select(
      TextAnalysis.punctRatio($"t"),
      TextAnalysis.stopwordRatio($"t"),
      TextAnalysis.avgWordLen($"t")).as[(Double, Double, Double)].head()
    assert(math.abs(pr - 2.0 / 9.0) < 1e-12) // 2 of 9 chars are '!'
    assert(sr == 0.5)                        // "the" of 2 tokens
    assert(math.abs(awl - 4.0) < 1e-12)      // (3 + 5)/2 ("cat!!" keeps marks)
  }

  test("qualityScore stays in [0,1] on the corpus") {
    val d = graft.Tables.documents(spark, sf0001)
    val bad = d.select(TextAnalysis.qualityScore($"text").as("q"))
      .filter($"q" < 0 || $"q" > 1).count()
    assert(bad == 0)
  }

  test("fingerprint matches a reference implementation and is order-sensitive") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 2147483647L)
    val inputs = Seq("abc", "cba", "the quick brown fox", "")
    val out = inputs.toDF("t")
      .select(TextAnalysis.fingerprint($"t")).as[Long].collect().toSeq
    assert(out == inputs.map(ref))
    assert(out(0) != out(1))
  }
}
