package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table: binary payload + typed metadata") {
    val media = Multimodal.mediaTableFromText(spark,
      Tables.documents(spark, sf0001).limit(20), "doc_id", "text")
    val row = media.filter($"media_id" === 1).head()
    assert(row.media.nonEmpty)
    assert(Seq("jpeg", "png", "wav", "mp4").contains(row.format))
    assert(row.width >= 16 && row.height >= 16 && row.n_frames >= 1)
  }

  test("decode stage: deterministic features, histogram normalized") {
    val media = Multimodal.mediaTableFromText(spark,
      Tables.documents(spark, sf0001).limit(50), "doc_id", "text")
    val feats = Multimodal.decodeStage(spark, media, new Multimodal.StubDecoder, partitions = 3)
    assert(feats.count() == 50)
    val f = feats.filter($"media_id" === 0).head()
    assert(f.checksum.length == 64)
    assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
    // byte_len equals utf-8 length of source text
    val expected = Tables.documents(spark, sf0001)
      .filter($"doc_id" === 0).select(length($"text")).as[Int].head()
    assert(f.byte_len == expected) // corpus is ascii: chars == bytes
    // determinism across runs
    val again = Multimodal.decodeStage(spark, media, new Multimodal.StubDecoder, partitions = 7)
    assert(feats.toDF().exceptAll(again.toDF()).count() == 0)
  }

  test("resize stage clamps width, scales height, truncates payload") {
    val media = Multimodal.mediaTableFromText(spark,
      Tables.documents(spark, sf0001).limit(20), "doc_id", "text")
    val resized = Multimodal.resizeStage(spark, media,
      new Multimodal.StubResizer, targetWidth = 224, partitions = 3)
    val byId = resized.collect().map(r => r.media_id -> r).toMap
    val origById = media.collect().map(r => r.media_id -> r).toMap
    byId.values.foreach { r =>
      val o = origById(r.media_id)
      assert(r.width == math.min(224, o.width))
      assert(r.height == math.max(1, o.height * r.width / o.width))
      assert(r.media.length == math.min(o.media.length, r.width * r.height))
      assert(r.media.sameElements(o.media.take(r.media.length))) // prefix, not garbage
    }
    // small images pass through untouched
    val small = byId.values.find(r => origById(r.media_id).width <= 224).get
    assert(small.width == origById(small.media_id).width)
  }

  test("frame sampling keeps every stride-th frame") {
    val media = Multimodal.mediaTableFromText(spark,
      Tables.documents(spark, sf0001).limit(5), "doc_id", "text")
    val sampled = Multimodal.sampleFrames(media.toDF(), stride = 10)
      .filter($"media_id" === 3).select($"frame_ids").as[Seq[Int]].head()
    // doc 3: n_frames = 3 % 30 + 1 = 4 -> frames 0..3, stride 10 -> [0]
    assert(sampled == Seq(0))
  }

  test("pairWithText joins captions onto media rows by key") {
    val media = Multimodal.mediaTableFromText(spark,
      Tables.documents(spark, sf0001).limit(10), "doc_id", "text").toDF()
    val caps = Tables.documents(spark, sf0001).limit(10)
      .select($"doc_id", concat(lit("cap "), $"doc_id").as("c"))
    val paired = Multimodal.pairWithText(media, caps, "media_id", "doc_id", "c")
    assert(paired.count() == 10)
    assert(paired.filter($"media_id" === 3)
      .select($"caption").as[String].head() == "cap 3")
    // payload bytes ride through untouched
    assert(paired.columns.contains("media"))
  }

  test("composite pair dedup: payload branch exact, caption branch near, both resolve to min id") {
    val long = "the quick brown fox jumps over the lazy dog again and again " +
      "with many more tokens to make simhash stable across small edits"
    val rows = Seq(
      (1L, "payloadA", long),                        // base
      (2L, "payloadA", "completely different words entirely unrelated caption here"), // exact payload dup of 1
      (3L, "payloadB", long + " tiny edit"),         // caption near-dup of 1
      (4L, "payloadC", "an island row sharing nothing with anyone at all ok")
    ).toDF("id", "payload", "caption")
      .select($"id", $"payload".cast("binary").as("payload"), $"caption")
    val dupPairs = Multimodal.pairDupPairs(rows, "id", "payload", "caption", maxHamming = 3)
      .as[(Long, Long)].collect().toSet
    assert(dupPairs.contains((1L, 2L)), s"exact payload pair missing: $dupPairs")
    assert(dupPairs.contains((1L, 3L)), s"caption near pair missing: $dupPairs")
    assert(!dupPairs.exists(p => p._1 == 4L || p._2 == 4L), s"island paired: $dupPairs")
    val kept = Multimodal.dedupPairs(rows, "id", "payload", "caption", maxHamming = 3)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"kept: $kept")
  }
}
