package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("pmiPairs matches a reference implementation; dilution lowers PMI") {
    // (new, york) always together; big/apple co-occur in only half
    // their appearances — diluted association
    val texts =
      (1 to 10).map(i => s"new york u$i v$i") ++
      (1 to 5).map(_ => "big apple") ++
      (1 to 5).map(i => s"big j$i") ++ (1 to 5).map(i => s"apple k$i")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val out = TextAnalysis.pmiPairs(docs, "id", "text", window = 3, minCount = 5L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // reference implementation: same window rule, same formula
    val allPairs = texts.flatMap { t =>
      val w = t.split("\\s+").toSeq
      for { i <- w.indices; j <- (i + 1) until math.min(i + 4, w.length) }
        yield if (w(i) <= w(j)) (w(i), w(j)) else (w(j), w(i))
    }
    val tTot = allPairs.size.toDouble
    val cxy = allPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val marg = allPairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = cxy.filter(_._2 >= 5L).map { case (p, n) =>
      p -> ((n, BigDecimal(math.log(4.0 * tTot * n / (marg(p._1).toDouble * marg(p._2))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(out == expect, s"spark=$out\nref=$expect")
    // (big, apple) outranks (new, york): both are perfect collocates
    // given their frequency, but big/apple live in 2-token docs (tiny
    // marginals), so PMI — association relative to chance — is higher
    assert(out(("apple", "big"))._2 > out(("new", "york"))._2)
    assert(out.values.forall(_._1 >= 5L)) // minCount honored
  }

  test("corruptionSpans: one span per block, in-bounds, non-overlapping, deterministic") {
    // 45 tokens -> blocks of 20: [0,20), [20,40), [40,45)
    val text = (1 to 45).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, text), (8L, ""), (9L, "solo")).toDF("id", "text")
    val spans = TextAnalysis.corruptionSpans(df, "id", "text", blockSize = 20)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // empty doc yields nothing; 1-token doc yields one len-1 span at 0
    assert(!spans.exists(_._1 == 8L))
    assert(spans.filter(_._1 == 9L).toSeq == Seq((9L, 0L, 0L, 1L)))
    val d7 = spans.filter(_._1 == 7L)
    assert(d7.length == 3) // exactly one span per block
    d7.foreach { case (_, blk, start, len) =>
      assert(len >= 1 && len <= 3)
      val blockLo = blk * 20
      val blockHi = math.min(blockLo + 20, 45)
      assert(start >= blockLo && start + len <= blockHi,
        s"span ($start,$len) escapes block [$blockLo,$blockHi)")
    }
    // block partitioning => spans can never overlap
    val sorted = d7.sortBy(_._3)
    assert(sorted.sliding(2).forall {
      case Array(a, b) => a._3 + a._4 <= b._3
      case _ => true
    })
    // deterministic
    val again = TextAnalysis.corruptionSpans(df, "id", "text", blockSize = 20)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(again.toSeq == spans.toSeq)
  }

  test("stripHtml: blocks, tags, entity order, whitespace collapse") {
    def strip(s: String): String = Seq(s).toDF("t")
      .select(TextAnalysis.stripHtml($"t")).as[String].head()
    assert(strip("<p>Hello <b>world</b></p>") == "Hello world")
    // script/style bodies vanish even with a '<' inside
    assert(strip("a<script>if (1 < 2) x();</script>b<style>p{}</style>c") == "a b c")
    // case-insensitive, attributes, multi-line block
    assert(strip("x<SCRIPT type=\"a\">\nvar y;\n</SCRIPT>z") == "x z")
    // entity order: &amp;lt; is the LITERAL string "&lt;", not "<"
    assert(strip("Tom &amp; Jerry &amp;lt; &lt;3 &quot;q&quot; &#39;a&#39;&nbsp;end")
      == "Tom & Jerry &lt; <3 \"q\" 'a' end")
    assert(strip("  a \t\n b  ") == "a b")
    assert(strip("") == "")
  }

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

  test("normalizeText: newlines, controls, unicode spaces/quotes/dashes, " +
      "collapse, trim, lowercase") {
    val cases = Seq(
      "A\r\nB\rC\nD" -> "a\nb\nc\nd",             // CRLF and CR to LF
      "x\u0007y\u0001z\u009F" -> "xyz",             // C0/C1 controls dropped
      "a\u00A0b\u2003c\u3000d" -> "a b c d",        // unicode spaces to ASCII
      "\u2018q\u2019 \u201Cw\u201D" -> "'q' \"w\"",  // curly quotes unified
      "a\u2014b\u2013c\u2212d" -> "a-b-c-d",        // em/en-dash + minus unified
      "  A   B  " -> "a b",                        // collapse + trim + lower
      "tab\tkept" -> "tab\tkept")                  // tab is NOT a space variant
    val out = cases.map(_._1).toDF("t")
      .select(TextAnalysis.normalizeText($"t")).as[String].collect().toSeq
    assert(out == cases.map(_._2))
    // idempotent: normalizing a normalized string is a no-op
    val again = out.toDF("t")
      .select(TextAnalysis.normalizeText($"t")).as[String].collect().toSeq
    assert(again == out)
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

  test("chunk: overlapping token windows, short tail kept, empty doc dropped") {
    val docs = Seq((1L, "a b c d e"), (2L, "x"), (3L, "  ")).toDF("doc_id", "text")
    val w2s2 = TextAnalysis.chunk(docs, "doc_id", "text", window = 2, stride = 2)
      .orderBy("doc_id", "chunk_id").as[(Long, Long, String)].collect().toSeq
    assert(w2s2 == Seq((1L, 0L, "a b"), (1L, 1L, "c d"), (1L, 2L, "e"),
      (2L, 0L, "x")))
    val w3s1 = TextAnalysis.chunk(docs.filter($"doc_id" === 1), "doc_id", "text",
        window = 3, stride = 1)
      .orderBy("chunk_id").as[(Long, Long, String)].collect().map(_._3).toSeq
    assert(w3s1 == Seq("a b c", "b c d", "c d e"))
  }

  test("bm25: saturation and length normalization on a hand-computed corpus") {
    // query = {a}; N=3, df(a)=2, avgdl = (4+1+1)/3 = 2
    val docs = Seq((1L, "a a a b"), (2L, "a"), (3L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("a"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    def s(tf: Double, dl: Double) =
      math.rint(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 2.0)) * 1e4) / 1e4
    assert(out == Seq((1L, s(3, 4)), (2L, s(1, 1)), (3L, 0.0)))
    // tf saturation: doc 1 has 3x the tf of doc 2 but nowhere near 3x
    // the score — and still outranks it despite the length penalty
    assert(out(0)._2 > out(1)._2 && out(0)._2 < 3 * out(1)._2)
  }

  test("bigramLm: add-one smoothed avg logprob on a hand-computed corpus") {
    // uni: a=4 b=3 c=1 x=1 -> V=4; bigrams: (a b)=3, (b a)=1, (a x)=1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"), (4L, "a x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val d1 = r4((2 * math.log(4.0 / 8) + math.log(2.0 / 7)) / 3)
    assert(out == Seq(
      (1L, 3L, d1),
      (2L, 1L, r4(math.log(4.0 / 8))),
      (3L, 0L, 0.0),                      // single token: no bigrams
      (4L, 1L, r4(math.log(2.0 / 8)))))
    // the corpus-likeliest doc (repeating the dominant bigram) wins
    assert(out(1)._3 > d1 && d1 > out(3)._3)
  }

  test("zipfFit recovers slope -1 on an exactly Zipfian corpus") {
    // token w_r appears floor(1000/r) times -> ln f = ln 1000 - ln r
    val text = (1 to 20).flatMap(r => Seq.fill(1000 / r)(s"w${('a' + r).toChar}"))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(docs, "text").head()
    assert(row.getLong(0) == 20L)
    val slope = row.getDouble(1)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope")
  }

  test("gopherQuality: each rule fails for its own reason, clean docs pass") {
    val longWord = Array.fill(10)("pneumonoultramicroscopicsilicovolcanoconiosis")
      .mkString(" ")
    val docs = Seq(
      (1L, "the quick brown fox and a dog run to the barn of hay today"),
      (2L, "the a of to and 111 222 $$$ ### @@@ %%% &&& 000 999 888 777"),
      (3L, "the a " + longWord),
      (4L, "short text here")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("passes"))                 // clean
    assert(!out(1).getAs[Boolean]("passes"))                // frac_alpha 5/16
    assert(out(1).getAs[Double]("frac_alpha") < 0.8)
    assert(!out(2).getAs[Boolean]("passes"))                // mean_wl >> 10
    assert(out(2).getAs[Double]("mean_wl") > 10.0)
    assert(out(2).getAs[Double]("frac_alpha") == 1.0)       // fails ONLY wl
    assert(!out(3).getAs[Boolean]("passes"))                // word count < 10
    assert(out(3).getAs[Long]("n_words") == 3L)
  }

  test("fluencyMedianFilter: per-group rank-median cut keeps the fluent half") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = TextAnalysis.fluencyMedianFilter(docs, "doc_id", "text", "lang")
      .as[(String, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (g, n, kept, cut) =>
      assert(kept >= (n + 1) / 2 && kept <= n, s"$g: kept $kept of $n")
      assert(cut < 0.0, s"$g: add-one smoothed logprob must be negative, got $cut")
    }
    // denominator counts exactly the docs with >= 1 bigram per group
    val exp = docs.filter(size(TextAnalysis.tokens($"text")) >= 2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(out.map(r => r._1 -> r._2).toMap == exp)
  }

  test("heapsFit: all-new tokens fit beta=1, frozen vocabulary fits beta=0") {
    // every doc introduces 5 fresh tokens → V(N) = N exactly
    val fresh = (0L until 10L).map(i =>
      (i, (1 to 5).map(j => s"t${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val f = TextAnalysis.heapsFit(fresh, "doc_id", "text")
      .select($"decile", $"n_cum", $"v_cum", $"beta", $"k")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(f.length == 10)
    assert(f.forall(r => r._2 == r._3), "V(N) must equal N for all-new tokens")
    assert(f.head._4 == 1.0 && f.head._5 == 1.0, s"beta/k = ${f.head}")
    // every doc repeats the same 5 tokens → V constant → beta = 0, K = 5
    val frozen = (0L until 10L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val z = TextAnalysis.heapsFit(frozen, "doc_id", "text")
      .select($"beta", $"k").as[(Double, Double)].head()
    assert(z == ((0.0, 5.0)), z.toString)
  }

  test("rakePhrases: hand-computed degree/freq scores, co-occurrence beats isolation") {
    // stops {of, is}: phrases "deep learning", "deep networks", "fun"
    // deg/freq: deep 4/2, learning 2/1, networks 2/1, fun 1/1
    val docs = Seq((1L, "deep learning of deep networks is fun"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.rakePhrases(docs, "doc_id", "text", topK = 3)
      .as[(Long, String, Double)].collect()
      .sortBy(r => (-r._3, r._2)).toSeq
    assert(out == Seq(
      (1L, "deep learning", 4.0), (1L, "deep networks", 4.0),
      (1L, "fun", 1.0)), out.mkString(", "))
    // topK truncates deterministically: k=1 keeps the lexicographic tie-winner
    val top1 = TextAnalysis.rakePhrases(docs, "doc_id", "text", topK = 1)
      .as[(Long, String, Double)].collect().toSeq
    assert(top1 == Seq((1L, "deep learning", 4.0)), top1.mkString(", "))
  }

  test("ngramNovelty: first holder keeps the gram, copies score zero, short docs empty") {
    val docs = Seq(
      (1L, "a b c d"),   // grams (n=3): "a b c", "b c d" — both novel
      (2L, "a b c d"),   // exact copy: 0 novel
      (3L, "a b c x"),   // "a b c" seen, "b c x" novel → 0.5
      (4L, "y z")        // too short: 0 grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0),
      (3L, 2L, 1L, 0.5), (4L, 0L, 0L, 0.0)), out.mkString(", "))
  }

  test("mattr: sliding-window TTR hand-computed, short docs fall back, spam sinks") {
    def round4(d: Double) = math.round(d * 10000).toDouble / 10000
    val docs = Seq(
      // n=5 < w=4? use w=3: windows (a b a)=2, (b a b)=2, (a b c)=3
      (1L, "a b a b c"),
      (2L, "x y"),          // short: TTR = 2/2 = 1.0
      (3L, "z z z z z z")   // spam: every window 1/3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.mattr(docs, "doc_id", "text", w = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 5L, 3L, round4((2 + 2 + 3) / 9.0)),
      (2L, 2L, 1L, 1.0),
      (3L, 6L, 4L, round4(4 / 12.0))), out.mkString(", "))
  }

  test("trigramBackoff: each backoff tier scores its hand-computed value") {
    // train doc 0: "a b c d" → tri {abc, bcd}, bi {ab, bc, cd},
    // uni {a,b,c,d}, N=4, V=4
    val docs = Seq(
      (0L, "a b c d"),  // train
      (1L, "a b c"),    // tier 1: c3(abc)/c2(ab) = 1.0 → ln = 0
      (3L, "x b c"),    // tier 2: 0.4·c2(bc)/c1(b) = 0.4
      (5L, "x y z"),    // tier 3: α²·(0+1)/(4+4) = 0.02
      (7L, "a b")       // too short: zero trigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.trigramBackoff(docs, "doc_id", "text",
        col("doc_id") % 2 === 0)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, 1L, 0L, 0.0),
      (3L, 1L, 0L, 1L, -0.9163),  // ln 0.4
      (5L, 1L, 0L, 0L, -3.912),   // ln 0.02
      (7L, 0L, 0L, 0L, 0.0)), out.mkString(", "))
  }

  test("encodingAudit: planted corruption counted exactly per source") {
    val docs = Seq(
      ("a", "clean text"),
      ("a", "bad \uFFFD here \uFFFD\uFFFD"),          // 3 replacement chars
      ("a", "ctrl\u0007and\u0001two"),                // 2 C0 controls
      ("b", "moji caf\u00C3\u00A9 na\u00C3\u00AFve"), // 2 mojibake leads
      ("b", "tab\tand\nnewline are fine")             // whitelisted controls
    ).toDF("source", "text")
    val out = TextAnalysis.encodingAudit(docs, "source", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("a", 3L, 1L, 3L, 2L, 0L),
      ("b", 2L, 0L, 0L, 0L, 1L)), out.mkString(", "))
  }
}
