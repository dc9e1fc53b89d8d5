package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize (batch): gap splits sessions") {
    val us = 1000000L
    val ev = Seq(
      (1L, 10L, 0L * us), (1L, 11L, 60L * us),            // session 1
      (1L, 12L, 4000L * us),                              // > 30min gap -> session 2
      (2L, 20L, 0L * us)                                  // other user
    ).toDF("user_id", "event_id", "us")
      .select($"user_id", $"event_id", timestamp_micros($"us").as("ts"))
    val out = Streams.sessionize(ev, gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("streaming sessionizer agrees with batch face on real events") {
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"))
      .as[Streams.SessionEvent]
    val in = MemoryStream[Streams.SessionEvent](spark)
    val q = Streams.sessionizeStream(spark, in.toDS())
      .writeStream.format("memory").queryName("sess_spec").outputMode("append").start()
    in.addData(ev.collect().toSeq)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sess_spec")
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("first_event"), max("event_id").as("last_event"))
    val batch = Streams.sessionize(Tables.events(spark, sf0001))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming sessionizer carries state across micro-batches") {
    val us = 1000000L
    val in = MemoryStream[Streams.SessionEvent](spark)
    val q = Streams.sessionizeStream(spark, in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_state").outputMode("append").start()
    in.addData(Streams.SessionEvent(1L, 1L, 0L))
    q.processAllAvailable()
    in.addData(Streams.SessionEvent(1L, 2L, 60L * us))        // same session
    in.addData(Streams.SessionEvent(1L, 3L, 4000L * us))      // new session
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_state").orderBy("event_id")
      .select("session_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L, 2L))
  }

  test("hourly agg stream matches batch face") {
    val ev = Tables.events(spark, sf0001)
    val schema = ev.schema
    val in = MemoryStream[org.apache.spark.sql.Row](
      org.apache.spark.sql.Encoders.row(schema), spark)
    val agg = Streams.hourlyAggStream(in.toDF(), watermark = "10 years")
    val q = agg.writeStream.format("memory").queryName("hourly_spec")
      .outputMode("complete").start()
    in.addData(ev.collect().toSeq)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hourly_spec")
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type", $"n", $"v")
    val batch = Streams.hourlyAgg(ev)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("file-source streaming: events parquet dir drives the hourly agg") {
    // the readStream->transform->memory-sink path with a real file
    // source (schema supplied, one file = one micro-batch)
    val ev = Tables.events(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graftstream").toString
    ev.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = Streams.hourlyAggStream(stream, watermark = "10 years")
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("file_hourly")
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type", $"n", $"v")
    val batch = Streams.hourlyAgg(ev)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream interval join matches the batch face") {
    val ev = Tables.events(spark, sf0001)
    val views = ev.filter($"event_type" === "view")
    val purchases = ev.filter($"event_type" === "purchase")
    val dirV = java.nio.file.Files.createTempDirectory("graftv").toString
    val dirP = java.nio.file.Files.createTempDirectory("graftp").toString
    views.write.mode("overwrite").parquet(dirV)
    purchases.write.mode("overwrite").parquet(dirP)
    val q = Streams.intervalJoinStream(
        spark.readStream.schema(ev.schema).parquet(dirV),
        spark.readStream.schema(ev.schema).parquet(dirP),
        windowMinutes = 120, watermark = "10 years")
      .writeStream.format("memory").queryName("ivj").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ivj")
    val batch = Streams.intervalJoin(ev, "view", "purchase", 120)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream LEFT OUTER interval join: unmatched rows emit with nulls " +
      "after the watermark closes their window") {
    val us = 1000000L
    val min = 60L * us
    val inV = MemoryStream[(Long, Long, Long)](spark) // (user, event_id, us)
    val inP = MemoryStream[(Long, Long, Long)](spark)
    def shaped(m: MemoryStream[(Long, Long, Long)]) =
      m.toDS().toDF("user_id", "event_id", "us")
        .select($"user_id", $"event_id", timestamp_micros($"us").as("ts"))
    val q = Streams.intervalJoinStream(shaped(inV), shaped(inP),
        windowMinutes = 30, watermark = "1 minute", joinType = "left_outer")
      .writeStream.format("memory").queryName("ivj_outer").outputMode("append").start()
    inV.addData((1L, 100L, 5L * min))   // view for u1
    inP.addData((1L, 200L, 10L * min),  // purchase u1: matches the view
      (2L, 201L, 12L * min))            // purchase u2: NO view
    q.processAllAvailable()
    // advance both watermarks far past the windows -> u2's state closes
    inV.addData((9L, 998L, 300L * min))
    inP.addData((9L, 999L, 300L * min))
    q.processAllAvailable(); q.stop()
    val out = spark.table("ivj_outer")
      .select($"right_id", $"left_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(200L) == Some(100L))   // matched pair carries the view id
    assert(out.contains(201L) && out(201L).isEmpty) // unmatched emits nulls
  }

  test("as-of join: each purchase gets latest prior view") {
    val us = 1000000L
    val ev = Seq(
      (1L, 1L, "view", 10L * us),
      (1L, 2L, "purchase", 20L * us),   // matches view@10
      (1L, 3L, "view", 30L * us),
      (1L, 4L, "purchase", 40L * us),   // matches view@30
      (2L, 5L, "purchase", 5L * us)     // no prior view -> null
    ).toDF("user_id", "event_id", "event_type", "us")
      .select($"user_id", $"event_id", $"event_type", timestamp_micros($"us").as("ts"))
    val out = Streams.asOfLastEvent(ev, "view", "purchase")
      .orderBy("event_id")
      .select($"event_id", $"asof_us").as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq((2L, Some(10L * us)), (4L, Some(30L * us)), (5L, None)))
  }

  test("incremental interconnections: per-batch delta equals full recompute") {
    val root = java.nio.file.Files.createTempDirectory("graftivm").toString
    val store = new graft.store.GraphStore(spark, root)
    val bt = Seq(("l1", "A"), ("l2", "B"), ("l3", "A"), ("l4", "C"))
      .toDF("src", "dst")
    store.writeEdges("BELONGS_TO", bt)
    store.writeEdges("HAS_KEYWORD", Seq.empty[(String, String)].toDF("src", "dst"))
    store.writeNodes("j3_result",
      Seq.empty[(String, String, String, String, String)]
        .toDF("url1", "category1", "url2", "category2", "shared_keyword"))
    val ivm = new Streams.IncrementalInterconnections(
      spark, store, "HAS_KEYWORD", "BELONGS_TO", "j3_result")
    // three batches, including a duplicate edge and a cross-batch pair
    ivm.applyBatch(Seq(("l1", "k1"), ("l2", "k1")).toDF("src", "dst"))
    ivm.applyBatch(Seq(("l3", "k1"), ("l1", "k1")).toDF("src", "dst")) // l1,k1 dup
    ivm.applyBatch(Seq(("l4", "k2"), ("l2", "k2")).toDF("src", "dst"))
    val incremental = store.nodes("j3_result")
    val full = graft.query.GraphQueries.interconnections(
      store.edges("HAS_KEYWORD"), bt, canonicalPairs = true, limit = Int.MaxValue)
    assert(incremental.count() > 0)
    assert(incremental.exceptAll(full).count() == 0 &&
      full.exceptAll(incremental).count() == 0)
  }

  test("streaming SCD-2 sink: micro-batches accumulate version history; " +
      "re-delivered updates are no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graftscd2").toString
    val store = new graft.store.GraphStore(spark, root)
    store.writeNodes("dim", Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long")))
    val apply = Streams.applyScd2Batch(store, "dim", Seq("k"), "ts") _
    // batch 1: a changes at t=100, c appears
    apply(Seq(("a", 10, 100L), ("c", 3, 100L)).toDF("k", "v", "ts"))
    // batch 2: at-least-once replay of batch 1 (must be a no-op),
    // then b changes at t=200
    apply(Seq(("a", 10, 150L), ("c", 3, 150L)).toDF("k", "v", "ts"))
    apply(Seq(("b", 20, 200L)).toDF("k", "v", "ts"))
    val hist = store.nodes("dim").orderBy("k", "valid_from")
      .as[(String, Int, Long, Option[Long])].collect().toSeq
    assert(hist == Seq(
      ("a", 1, 0L, Some(100L)), ("a", 10, 100L, None),
      ("b", 2, 0L, Some(200L)), ("b", 20, 200L, None),
      ("c", 3, 100L, None)))
    // point-in-time faces over the streamed history
    assert(graft.store.GraphStore.scd2AsOf(store.nodes("dim"), 50L)
      .select("k", "v").as[(String, Int)].collect().toSet == Set(("a", 1), ("b", 2)))
    assert(graft.store.GraphStore.scd2AsOf(store.nodes("dim"), 300L)
      .select("k", "v").as[(String, Int)].collect().toSet
      == Set(("a", 10), ("b", 20), ("c", 3)))
  }

  test("streaming dedup drops duplicate keys across micro-batches, bounded state") {
    val us = 1000000L
    final case class Doc(doc_id: Long, ts: java.sql.Timestamp)
    val in = MemoryStream[(Long, Long)](spark)
    val stream = in.toDS().toDF("doc_id", "us")
      .select($"doc_id", timestamp_micros($"us").as("ts"))
    val q = Streams.dedupStream(stream, Seq("doc_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_spec").outputMode("append").start()
    in.addData((1L, 0L * us), (2L, 1L * us))
    q.processAllAvailable()
    in.addData((1L, 2L * us), (3L, 3L * us)) // 1 is a dup within the watermark
    q.processAllAvailable(); q.stop()
    val out = spark.table("dedup_spec").select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("incremental manifest: batch-accumulated checksums equal the one-shot manifest") {
    val rows = (1L to 40L).map(i => (i % 4, i, s"text$i"))
    val (b1, b2, b3) = (rows.take(10), rows.slice(10, 25), rows.drop(25))
    val inc = new Streams.IncrementalManifest("shard", Seq("id", "text"))
    Seq(b1, b2, b3).foreach { b =>
      inc.applyBatch(b.toDF("shard", "id", "text"))
    }
    val oneShot = graft.etl.Staging.shardManifest(
        rows.toDF("shard", "id", "text"), "shard", Seq("id", "text"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(inc.manifest == oneShot, s"${inc.manifest} vs $oneShot")
    // batch order doesn't matter (commutative combine)
    val inc2 = new Streams.IncrementalManifest("shard", Seq("id", "text"))
    Seq(b3, b1, b2).foreach(b => inc2.applyBatch(b.toDF("shard", "id", "text")))
    assert(inc2.manifest == oneShot)
  }

  test("stream-static enrich: micro-batches join the broadcast dimension map-side") {
    val dim = Seq((1L, "Tech"), (2L, "Science")).toDF("cat_id", "category")
    val in = MemoryStream[(Long, Long)](spark)
    val stream = in.toDS().toDF("url_id", "cat_id")
    val q = Streams.enrichStream(stream, dim, "cat_id")
      .writeStream.format("memory").queryName("enrich_spec").outputMode("append").start()
    in.addData((10L, 1L), (11L, 2L), (12L, 9L)) // 9 has no dim row
    q.processAllAvailable(); q.stop()
    val out = spark.table("enrich_spec")
      .select($"url_id", $"category").as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((10L, Some("Tech")), (11L, Some("Science")), (12L, None)))
  }

  test("as-of join: same-timestamp view is visible regardless of event_id order") {
    val us = 1000000L
    // view has the SAME ts as the purchase but a HIGHER event_id —
    // ASOF semantics (view.ts <= purchase.ts) must still match it
    val ev = Seq(
      (1L, 1L, "purchase", 20L * us),
      (1L, 2L, "view", 20L * us),
      (2L, 3L, "view", 5L * us),
      (2L, 4L, "purchase", 5L * us)
    ).toDF("user_id", "event_id", "event_type", "us")
      .select($"user_id", $"event_id", $"event_type", timestamp_micros($"us").as("ts"))
    val out = Streams.asOfLastEvent(ev, "view", "purchase")
      .orderBy("event_id")
      .select($"event_id", $"asof_us").as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq((1L, Some(20L * us)), (4L, Some(5L * us))))
  }
  test("streaming OHLC matches the batch single-agg face") {
    val ev = graft.Tables.events(spark, sf0001)
    val in = MemoryStream[org.apache.spark.sql.Row](
      org.apache.spark.sql.Encoders.row(ev.schema), spark)
    val q = Streams.ohlcHourlyStream(in.toDF(), watermark = "10 years")
      .writeStream.format("memory").queryName("ohlc_spec")
      .outputMode("complete").start()
    in.addData(ev.collect().toSeq)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ohlc_spec")
      .select($"user_id", date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("h"),
        $"open", $"high", $"low", $"close", $"n")
    val batch = graft.ext.TimeSeries.ohlcHourly(ev, "user_id", "ts", "event_id", "value")
      .select($"user_id", date_format($"h", "yyyy-MM-dd HH:mm:ss").as("h"),
        $"open", $"high", $"low", $"close", $"n")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
