package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-4 training-pipeline operators: sampling, mixture, packing,
  * PII redaction, vector normalize, sliding windows. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("stratifiedDeterministic keeps only listed strata at ~fraction") {
    val out = Sampling.stratifiedDeterministic(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.25), grain = 100)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de")))
    val en = out.filter($"lang" === "en").count().toDouble
    val enAll = docs.filter($"lang" === "en").count().toDouble
    assert(en / enAll > 0.3 && en / enAll < 0.7, s"en fraction ${en / enAll}")
    // deterministic: same call selects the same rows
    val again = Sampling.stratifiedDeterministic(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.25), grain = 100)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("stratifiedSeeded draws only listed strata, roughly at fraction") {
    val out = Sampling.stratifiedSeeded(docs, "lang", Map("en" -> 0.5), seed = 7L)
    assert(out.select("lang").distinct().as[String].collect().toSet == Set("en"))
    val n = out.count().toDouble
    val all = docs.filter($"lang" === "en").count().toDouble
    assert(n / all > 0.2 && n / all < 0.8, s"fraction ${n / all}")
  }

  test("mixture honors per-source quotas in doc_id order") {
    val out = Sampling.mixture(docs, "source", "doc_id",
      Map("src0" -> 0.5, "src1" -> 0.2), total = 20L)
    val by = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(by.keySet.subsetOf(Set("src0", "src1")))
    assert(by.getOrElse("src0", 0L) == 10L && by.getOrElse("src1", 0L) == 4L, by.toString)
    // the rows taken are the LOWEST doc_ids of each source
    val minSkipped = docs.filter($"source" === "src0")
      .join(out.filter($"source" === "src0"), Seq("doc_id"), "left_anti")
      .agg(min("doc_id")).as[Long].head()
    val maxTaken = out.filter($"source" === "src0")
      .agg(max("doc_id")).as[Long].head()
    assert(maxTaken < minSkipped)
  }

  test("packByBudget: bins respect the exclusive-prefix-sum boundary") {
    val df = Seq(
      ("a", 1L, 3000L), ("a", 2L, 3000L), ("a", 3L, 3000L), ("a", 4L, 9000L),
      ("b", 1L, 10000L), ("b", 2L, 1L)
    ).toDF("shard", "ord", "toks")
    val out = Packing.packByBudget(df, "shard", "ord", "toks", budget = 8192L)
      .select("shard", "ord", "bin").as[(String, Long, Long)].collect().toSet
    // a: cumExcl 0,3000,6000,9000 -> bins 0,0,0,1 ; b: 0,10000 -> 0,1
    assert(out == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L),
      ("b", 1L, 0L), ("b", 2L, 1L)))
  }

  test("packSequences: exact seqLen windows, boundary-spanning docs, stream equals concat") {
    // shard a: doc1 has 3 tokens, doc2 has 6 (spans the 4-boundary),
    // doc3 has 9 (longer than 2*seqLen: spans three sequences);
    // shard b: a single short doc; plus an empty doc that must vanish.
    val df = Seq(
      ("a", 1L, Seq("1", "2", "3")),
      ("a", 2L, Seq("4", "5", "6", "7", "8", "9")),
      ("a", 3L, (10 to 18).map(_.toString)),
      ("b", 1L, Seq("x")),
      ("b", 2L, Seq.empty[String])
    ).toDF("shard", "ord", "ids")
    val out = Packing.packSequences(df, "shard", "ord", "ids", seqLen = 4)
      .select($"shard", $"seq_id", $"n_docs", $"ids")
      .as[(String, Long, Long, Seq[String])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // shard a stream = 1..18 cut into windows of 4
    val streamA = (1 to 18).map(_.toString)
    val expectA = streamA.grouped(4).zipWithIndex
      .map { case (w, i) => ("a", i.toLong) -> w }.toMap
    assert(out.view.filterKeys(_._1 == "a").mapValues(_._2).toMap ==
      expectA.map { case (k, v) => k -> v.toSeq })
    // positions: doc1 0-2, doc2 3-8, doc3 9-17 → piece counts per window
    assert(out(("a", 0L))._1 == 2L) // doc1 + doc2 head
    assert(out(("a", 1L))._1 == 1L) // doc2 interior
    assert(out(("a", 2L))._1 == 2L) // doc2 tail + doc3 head
    assert(out(("a", 3L))._1 == 1L && out(("a", 4L))._1 == 1L) // doc3 tail
    // shard b: one short sequence; the empty doc contributed nothing
    assert(out(("b", 0L)) == ((1L, Seq("x"))))
    assert(out.size == 6)
    // doc-start boundaries: within-sequence 1-based positions of NEW
    // docs only — continuation pieces contribute no start
    val starts = Packing.packSequences(df, "shard", "ord", "ids", seqLen = 4)
      .select($"shard", $"seq_id", $"doc_starts")
      .as[(String, Long, Seq[Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(starts(("a", 0L)) == Seq(1L, 4L)) // doc1 at pos 1, doc2 at pos 4
    assert(starts(("a", 1L)) == Seq())       // doc2 interior: no new doc
    assert(starts(("a", 2L)) == Seq(2L))     // doc3 starts at global 9 -> pos 2
    assert(starts(("a", 3L)) == Seq() && starts(("a", 4L)) == Seq())
    assert(starts(("b", 0L)) == Seq(1L))
  }

  test("packSequences conserves the corpus token stream at sf0.001") {
    val ids = docs.select($"source", $"doc_id",
      graft.ext.TextAnalysis.tokens($"text").as("ids"))
    val out = Packing.packSequences(ids, "source", "doc_id", "ids", seqLen = 128)
    // token mass conserved
    val inToks = ids.agg(sum(size($"ids"))).as[Long].head()
    assert(out.agg(sum($"n_toks")).as[Long].head() == inToks)
    // every sequence except the last per shard is exactly seqLen
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"shard")
    val bad = out.withColumn("mx", max($"seq_id").over(w))
      .filter($"seq_id" < $"mx" && $"n_toks" =!= 128L).count()
    assert(bad == 0L)
  }

  test("leakageSafeSplit: dup components never straddle splits; shares near 80/10/10") {
    import org.apache.spark.sql.functions.col
    // 300 docs; ids 0-99 pair up into 50 two-doc components
    val d = (0L until 300L).toDF("id")
    val pairs = (0L until 100L by 2L).map(i => (i, i + 1, 0.9))
      .toDF("id1", "id2", "sim")
    val out = Sampling.leakageSafeSplit(d, "id", pairs,
      Seq("train" -> 80, "val" -> 10, "test" -> 10), seed = 7L)
    val m = out.select(col("id"), col("split")).as[(Long, String)]
      .collect().toMap
    // paired ids always co-assigned
    (0L until 100L by 2L).foreach(i => assert(m(i) == m(i + 1), s"pair $i split"))
    // rough share sanity on the 300-doc corpus
    val shares = m.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(shares("train") > 180 && shares("val") > 5 && shares("test") > 5, shares.toString)
    // deterministic; different seed reshuffles at least one doc
    val again = Sampling.leakageSafeSplit(d, "id", pairs,
      Seq("train" -> 80, "val" -> 10, "test" -> 10), seed = 7L)
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    assert(again == m)
    val other = Sampling.leakageSafeSplit(d, "id", pairs,
      Seq("train" -> 80, "val" -> 10, "test" -> 10), seed = 8L)
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    assert(other != m)
  }

  test("lengthBucketedBatches: log2 bands, fixed batch size, pad cost vs batch max") {
    val df = Seq((1L, 10L), (2L, 12L), (3L, 15L), (4L, 100L), (5L, 9L))
      .toDF("id", "toks")
    val out = Packing.lengthBucketedBatches(df, "id", "toks", batchSize = 2)
      .select($"id", $"bucket", $"batch_id", $"pad_cost")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 9..15 -> bucket 3; 100 -> bucket 6
    assert(Seq(1L, 2L, 3L, 5L).forall(out(_)._2 == 3L) && out(4L)._2 == 6L)
    // bucket 3 in id order: (1,2) batch 0, (3,5) batch 1
    assert(out(1L)._3 == 0L && out(2L)._3 == 0L)
    assert(out(3L)._3 == 1L && out(5L)._3 == 1L)
    // pad cost to the batch max: batch0 max 12 -> costs 2,0; batch1 max 15 -> 0,6
    assert(out(1L)._4 == 2L && out(2L)._4 == 0L)
    assert(out(3L)._4 == 0L && out(5L)._4 == 6L)
    assert(out(4L)._4 == 0L) // singleton batch pads nothing
    // bucketed batching strictly beats naive id-ordered batching
    // ((1,2),(3,4),(5) pad-to-max) on total padding for this input
    val naivePad = (12L - 10L) + (100L - 15L)
    assert(out.values.map(_._4).sum < naivePad)
  }

  test("temperatureMixture: α=1 natural shares, α=0 uniform, α=0.5 between") {
    // skewed corpus: big=80, mid=16, tail=4
    val df = ((1L to 80L).map(i => (i, "big")) ++
      (101L to 116L).map(i => (i, "mid")) ++
      (201L to 204L).map(i => (i, "tail"))).toDF("id", "source")
    def shares(alpha: Double): Map[String, Long] =
      Sampling.temperatureMixture(df, "source", "id", alpha, total = 50L)
        .groupBy("source").count().as[(String, Long)].collect().toMap
    val nat = shares(1.0)   // quotas 40/8/2
    assert(nat == Map("big" -> 40L, "mid" -> 8L, "tail" -> 2L), nat.toString)
    val uni = shares(0.0)   // 3 sources, uniform: round(50/3)=17 (tail capped at 4)
    assert(uni("big") == 17L && uni("mid") == 16L && uni("tail") == 4L, uni.toString)
    val mid = shares(0.5)   // √80:√16:√4 ≈ 8.94:4:2 → 30/13/7 (tail capped)
    assert(mid("big") < nat("big") && mid("big") > uni("big"), mid.toString)
    assert(mid("tail") == 4L) // tail fully taken once up-sampled past its size
  }

  test("dsirWeights ranks target-like raw docs above unlike ones") {
    // target speaks vocab A; raw docs 10-12 speak A, 20-22 speak B
    val a = "alpha beta gamma delta alpha beta"
    val b = "omega psi chi phi omega psi"
    val df = (
      (1L to 5L).map(i => (i, a, true)) ++
      (10L to 12L).map(i => (i, a, false)) ++
      (20L to 22L).map(i => (i, b, false))
    ).toDF("id", "text", "tgt")
    val w = Sampling.dsirWeights(df, "id", "text", $"tgt", buckets = 32)
      .as[(Long, Double)].collect().toMap
    assert(w.keySet == Set(10L, 11L, 12L, 20L, 21L, 22L)) // raw docs only
    val aScores = Seq(10L, 11L, 12L).map(w)
    val bScores = Seq(20L, 21L, 22L).map(w)
    assert(aScores.min > bScores.max,
      s"target-like $aScores should beat unlike $bScores")
    // identical text -> identical weight (pure function of content)
    assert(aScores.distinct.size == 1 && bScores.distinct.size == 1)
  }

  test("packingManifest sums doc counts and token mass per bin") {
    val m = Packing.packingManifest(docs.select($"doc_id", $"source", $"n_chars"),
      "source", "doc_id", "n_chars", budget = 8192L)
    val total = m.agg(sum("n_docs")).as[Long].head()
    assert(total == docs.count())
    // no bin except possibly the last of a shard is under-full by more
    // than one document's worth: every bin's tokens <= budget + max doc
    val maxDoc = docs.agg(max("n_chars")).as[Long].head()
    val over = m.filter($"tokens" > lit(8192L + maxDoc)).count()
    assert(over == 0)
  }

  test("redactPii scrubs emails, IPs, and phones, leaves clean text alone") {
    val out = Seq(
      "mail me at jane.doe+spam@corp.example.org today",
      "server at 192.168.0.1 rebooted",
      "call 555-123-4567 or 555 987 6543",
      "no pii here, just 42 and v1.2 release"
    ).toDF("t").select(TextAnalysis.redactPii($"t").as("c")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "server at <IP> rebooted")
    assert(out(2) == "call <PHONE> or <PHONE>")
    assert(out(3) == "no pii here, just 42 and v1.2 release")
  }

  test("l2Normalize yields unit vectors; zero vector passes through") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))
    ).toDF("id", "v")
    val out = df.select($"id",
      graft.functions.VectorFunctions.l2Normalize($"v").as("n"))
      .as[(Long, Array[Double])].collect().toMap
    assert(math.abs(out(1L)(0) - 0.6) < 1e-12 && math.abs(out(1L)(1) - 0.8) < 1e-12)
    assert(out(2L).toSeq == Seq(0.0, 0.0))
  }

  test("slidingAgg: every event lands in duration/slide windows") {
    val events = graft.Tables.events(spark, sf0001)
    val slid = graft.streaming.Streams.slidingAgg(events, 60, 15)
    val massed = slid.agg(sum("n")).as[Long].head()
    assert(massed == events.count() * 4)
    // each window covers exactly the events within [start, start+60m)
    val w0 = slid.orderBy($"w_start", $"event_type").first()
    val s0 = w0.getLong(0)
    val expect = events
      .filter(unix_timestamp($"ts") >= s0 && unix_timestamp($"ts") < s0 + 3600 &&
        $"event_type" === w0.getString(1)).count()
    assert(w0.getLong(2) == expect)
  }

  test("writeShards: key-disjoint range shards, per-file row cap, sorted files") {
    import graft.etl.Staging
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_spec").toString
    val df = docs.select($"doc_id", $"source", $"n_chars")
    Staging.writeShards(df, dir, Seq("source", "doc_id"), numShards = 4,
      maxRecordsPerFile = 50L)
    // identity round-trip
    val back = Staging.readShards(spark, dir)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // per-file properties: row cap and in-file ordering
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 4, s"expected >= 4 shard files, got ${files.length}")
    for (f <- files) {
      val rows = spark.read.parquet(f)
        .select($"source", $"doc_id").as[(String, Long)].collect()
      assert(rows.length <= 50, s"file over cap: ${rows.length}")
      assert(rows.sortBy(r => (r._1, r._2)).toSeq == rows.toSeq, s"file not sorted: $f")
    }
    // range partitioning: per-FILE key ranges never interleave across
    // shard partitions (files of the same partition may share keys)
    val ord = implicitly[Ordering[(String, Long)]]
    val spans = files.map { f =>
      val ks = spark.read.parquet(f).select($"source", $"doc_id")
        .as[(String, Long)].collect()
      (ks.min(ord), ks.max(ord))
    }.sortBy(_._1)(ord)
    spans.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(ord.lteq(hi, lo2),
        s"overlapping shard ranges: $hi vs $lo2")
      case _ =>
    }
  }

  test("writeShuffledShards: deterministic seeded permutation, uniform disjoint shards") {
    import graft.etl.Staging
    val df = docs.select($"doc_id", $"source")
    // read back shard -> in-file row order of ids
    def writeRead(tag: String, seed: Long): Map[Int, Seq[Long]] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_shuffle_$tag").toString
      Staging.writeShuffledShards(df, dir, "doc_id", seed = seed, numShards = 8)
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
        .map { sd =>
          val ids = sd.listFiles().filter(_.getName.endsWith(".parquet"))
            .sortBy(_.getName).toSeq
            .flatMap(f => spark.read.parquet(f.getAbsolutePath)
              .select($"doc_id").as[Long].collect().toSeq)
          sd.getName.stripPrefix("shard=").toInt -> ids
        }.toMap
    }
    val a = writeRead("a", 42L)
    // determinism: a second write is bit-identical
    assert(a == writeRead("b", 42L))
    // permutation: shards are disjoint and complete
    val flat = a.values.flatten.toSeq
    assert(flat.length == df.count() && flat.distinct.length == flat.length)
    // cross-shard uniformity (500 rows / 8 shards, expected 62.5)
    a.values.foreach(s => assert(s.length > 30 && s.length < 100,
      s"skewed shard: ${s.length}"))
    // order law: within a shard, ids follow fingerprint(id:seed) order —
    // the same key q_o10_shuffle_shards' oracle replays
    val fp = graft.functions.TextStats.fingerprint(
      concat($"doc_id".cast("string"), lit(":42")))
    val expect = df.select($"doc_id", fp.as("fp")).as[(Long, Long)].collect()
      .groupBy(t => (t._2 % 8).toInt)
      .map { case (sh, rows) => sh -> rows.sortBy(t => (t._2, t._1)).map(_._1).toSeq }
    assert(a == expect)
    // a different seed is a different permutation
    val c = writeRead("c", 7L)
    assert(c != a && c.values.flatten.toSeq.sorted == flat.sorted)
  }

  test("tokenMixture keeps per-source prefixes under the token quota, overshoot < 1 doc") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L), ("a", 4L, 100L),
      ("b", 5L, 500L), ("b", 6L, 500L),
      ("c", 7L, 50L)
    ).toDF("source", "doc_id", "n_toks")
    // total 1000: a→0.25 (250: docs 1,2,3 — cum before doc3 is 200<250,
    // overshoot bounded by one doc), b→0.5 (500: doc 5 only — cum
    // before doc6 is 500, not < 500), c excluded entirely
    val out = Sampling.tokenMixture(df, "source", "doc_id", "n_toks",
        Map("a" -> 0.25, "b" -> 0.5), totalTokens = 1000L)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L, 5L), out.toString)
    // quota above a source's total takes the whole source
    val all = Sampling.tokenMixture(df, "source", "doc_id", "n_toks",
        Map("a" -> 1.0), totalTokens = 1000L)
      .select($"doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L, 4L))
    // determinism
    val again = Sampling.tokenMixture(df, "source", "doc_id", "n_toks",
        Map("a" -> 0.25, "b" -> 0.5), totalTokens = 1000L)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == out)
  }

  test("EP-T final stage: the training pipeline's output shuffles into shards losslessly") {
    import graft.etl.Staging
    val ept = graft.SparkEntry.queries("q_ept_training_pipeline")(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ept_shuffle").toString
    Staging.writeShuffledShards(ept, dir, "doc_id", seed = 42L, numShards = 4)
    val back = Staging.readShards(spark, dir).drop("shard")
    assert(back.count() == ept.count())
    assert(back.exceptAll(ept).isEmpty && ept.exceptAll(back).isEmpty)
  }

  test("profile: nulls, distinct, min/max per column in one row each") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")), (3L, Some("a")))
      .toDF("id", "s")
    val p = Profiling.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") == ("id", 4L, 0L, 3L, "1", "3"))
    assert(p("s") == ("s", 4L, 1L, 2L, "a", "b"))
  }

  test("partitionStats: rows sum to total, ratio >= 1") {
    val st = Profiling.partitionStats(docs)
    assert(st.agg(sum("n_rows")).as[Long].head() == docs.count())
    assert(st.select(min("max_over_mean")).as[Double].head() >= 1.0)
  }

  test("slidingAggStream runs with a watermark over a rate-less memory stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = graft.streaming.Streams.slidingAggStream(df, 60, 15, "1 hour")
      .writeStream.format("memory").queryName("slide_test")
      .outputMode("update").start()
    try {
      mem.addData((java.sql.Timestamp.valueOf("2026-01-01 10:20:00"), "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("slide_test").count()
      assert(got == 4, s"one event must open 4 sliding windows, got $got")
    } finally q.stop()
  }

  test("curriculumSchedule: quartile stages near-balanced, deterministic, " +
      "stage monotone in difficulty") {
    val out = Sampling.curriculumSchedule(docs, "doc_id", "n_chars", 4, "s1")
      .join(docs.select($"doc_id", $"n_chars"), "doc_id")
    val byStage = out.groupBy("stage").count()
      .as[(Long, Long)].collect().toMap
    assert(byStage.keySet == Set(0L, 1L, 2L, 3L), byStage.toString)
    val n = docs.count()
    byStage.values.foreach(c => assert(c >= n / 8 && c <= n / 2, byStage.toString))
    // monotone: every stage-k row is no harder than every stage-(k+1) row
    val maxPerStage = out.groupBy("stage").agg(max("n_chars"), min("n_chars"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    maxPerStage.sliding(2).foreach { case Array((_, mx, _), (_, _, mn)) =>
      assert(mx <= mn, maxPerStage.mkString(","))
    case _ => }
    // seeded: same seed reproduces, different seed permutes
    val again = Sampling.curriculumSchedule(docs, "doc_id", "n_chars", 4, "s1")
    assert(out.select("doc_id", "stage", "ord")
      .exceptAll(again.select("doc_id", "stage", "ord")).isEmpty)
    val other = Sampling.curriculumSchedule(docs, "doc_id", "n_chars", 4, "s2")
    assert(other.select("doc_id", "ord")
      .exceptAll(out.select("doc_id", "ord")).count() > 0)
  }

  test("apportionBudget: floors + largest remainders, sums exactly to budget") {
    // exact quotas: no leftover to distribute
    val a = Seq(("a", 3L), ("b", 3L), ("c", 4L)).toDF("src", "n")
    val outA = Sampling.apportionBudget(a, "src", col("n"), 10L)
      .select($"src", $"alloc").as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(outA == Seq(("a", 3L), ("b", 3L), ("c", 4L)), outA.mkString(", "))
    // equal thirds: one leftover seat, remainder tie breaks to "a"
    val b = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("src", "n")
    val outB = Sampling.apportionBudget(b, "src", col("n"), 10L)
      .select($"src", $"alloc").as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(outB == Seq(("a", 4L), ("b", 3L), ("c", 3L)), outB.mkString(", "))
    // skewed: allocations track proportions and the total is exact
    val c = Seq(("a", 970L), ("b", 20L), ("c", 10L)).toDF("src", "n")
    val outC = Sampling.apportionBudget(c, "src", col("n"), 1000L)
      .select($"src", $"alloc").as[(String, Long)].collect()
    assert(outC.map(_._2).sum == 1000L)
    assert(outC.toMap == Map("a" -> 970L, "b" -> 20L, "c" -> 10L))
  }

  test("skyline2d: monotone chain equals NOT-EXISTS dominance, dominated points drop") {
    val pts = Seq((1.0, 10L), (2.0, 9L), (2.0, 11L), (3.0, 5L), (1.0, 12L),
      (3.0, 5L), (2.5, 4L)).toDF("q", "len")
    val out = Sampling.skyline2d(pts, $"q", $"len")
      .as[(Double, Long)].collect().sortBy(_._1).toSeq
    // (2.5, 4) is dominated by (3, 5); per-x bests form the chain
    assert(out == Seq((1.0, 12L), (2.0, 11L), (3.0, 5L)), out.mkString(", "))
    // brute-force dominance check: nothing in the skyline is dominated
    val all = pts.as[(Double, Long)].collect()
    for ((x, y) <- out)
      assert(!all.exists { case (ox, oy) =>
        ox >= x && oy >= y && (ox > x || oy > y) }, s"($x, $y) dominated")
  }

  test("preferencePairs: best/worst per group, ties to smallest id, degenerates drop") {
    val df = Seq(
      (1L, "g1", 0.9), (2L, "g1", 0.2), (3L, "g1", 0.5),    // normal
      (10L, "g2", 0.7), (11L, "g2", 0.7),                   // all tied → drop
      (20L, "g3", 0.4),                                     // singleton → drop
      (30L, "g4", 0.8), (31L, "g4", 0.8), (32L, "g4", 0.1)  // top tie → chosen 30
    ).toDF("id", "grp", "s")
    val out = Sampling.preferencePairs(df, "id", Seq("grp"), col("s"))
      .select($"grp", $"chosen_id", $"rejected_id", $"margin")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("g1", 1L, 2L, 0.7), ("g4", 30L, 32L, 0.7)),
      out.mkString(", "))
  }
}
