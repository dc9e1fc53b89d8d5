package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphStoreSpec extends SparkSpec {
  import spark.implicits._

  test("mergeByKey: insert-if-absent keeps existing untouched rows") {
    val existing = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val incoming = Seq(("c", 3)).toDF("k", "v")
    val out = GraphStore.mergeByKey(existing, incoming, Seq("k"))
      .orderBy("k").as[(String, Int)].collect()
    assert(out.toSeq == Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("mergeByKey: last-writer-wins on PK collision (SET semantics)") {
    val existing = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val incoming = Seq(("a", 10), ("a", 11)).toDF("k", "v")
    val out = GraphStore.mergeByKey(existing, incoming, Seq("k"))
      .orderBy("k").as[(String, Int)].collect()
    // within one incoming batch, the later row wins (reference's
    // sequential MERGE..SET loop order)
    assert(out.toSeq == Seq(("a", 11), ("b", 2)))
  }

  test("mergeByKey is idempotent: merge(merge(e,i),i) == merge(e,i)") {
    val existing = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val incoming = Seq(("b", 20), ("d", 4)).toDF("k", "v")
    val once = GraphStore.mergeByKey(existing, incoming, Seq("k"))
    val twice = GraphStore.mergeByKey(once, incoming, Seq("k"))
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }

  test("mergeByKey preserves PK uniqueness invariant") {
    val existing = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v") // dirty input
    val incoming = Seq(("a", 9), ("c", 4)).toDF("k", "v")
    val out = GraphStore.mergeByKey(existing, incoming, Seq("k"))
    assert(out.groupBy("k").count().filter($"count" > 1).count() == 0)
  }

  test("store round-trip: DDL, write, detachDelete, cleanOrphans") {
    val root = java.nio.file.Files.createTempDirectory("graftstore").toString
    val store = new GraphStore(spark, root)
    store.createNodeTable("link", graft.model.GraphSchema.dimension)
    store.createRelTable("BELONGS_TO")
    assert(store.showTables() == Seq(("link", "NODE"), ("BELONGS_TO", "REL")))

    store.writeNodes("link", Seq("u1", "u2", "u3").toDF("name"))
    store.createNodeTable("category", graft.model.GraphSchema.dimension)
    store.writeNodes("category", Seq("c1", "c2").toDF("name"))
    store.writeEdges("BELONGS_TO",
      Seq(("u1", "c1"), ("u2", "c1"), ("u3", "c2")).toDF("src", "dst"))

    // DETACH DELETE u3: node gone, its edge gone
    store.detachDelete("link", "name", Seq("u3").toDF("k"), Seq("BELONGS_TO"))
    assert(store.nodes("link").as[String].collect().sorted.toSeq == Seq("u1", "u2"))
    assert(store.edges("BELONGS_TO").count() == 2)

    // c2 is now an orphan: cleanOrphans removes it
    store.cleanOrphans("category", "BELONGS_TO")
    assert(store.nodes("category").as[String].collect().toSeq == Seq("c1"))
  }

  test("snapshots: versioned copies survive mutation; as-of reads time-travel") {
    val root = java.nio.file.Files.createTempDirectory("graftstore3").toString
    val store = new GraphStore(spark, root)
    store.writeNodes("link", Seq(("u1", 1), ("u2", 2)).toDF("name", "v"))
    val v1 = store.snapshotNodes("link")
    store.writeNodes("link",
      store.merge(store.nodes("link"), Seq(("u2", 20), ("u3", 3)).toDF("name", "v"), "name"))
    val v2 = store.snapshotNodes("link")
    assert(store.listSnapshots("link") == Seq(v1, v2) && v1 == 1 && v2 == 2)
    assert(store.nodesAsOf("link", v1).orderBy("name").as[(String, Int)].collect().toSeq
      == Seq(("u1", 1), ("u2", 2)))
    assert(store.nodesAsOf("link", v2).orderBy("name").as[(String, Int)].collect().toSeq
      == Seq(("u1", 1), ("u2", 20), ("u3", 3)))
    // latest face unaffected by snapshot reads
    assert(store.nodes("link").count() == 3)
  }

  test("compactNodes merges small files without changing contents") {
    val root = java.nio.file.Files.createTempDirectory("graftstore4").toString
    val store = new GraphStore(spark, root)
    // 8 partitions -> 8 files for 16 rows: the micro-batch small-file shape
    store.writeNodes("link", (1 to 16).map(i => (s"u$i", i)).toDF("name", "v").repartition(8))
    def files() = new java.io.File(s"$root/nodes/link").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files() >= 8)
    val before = store.nodes("link").orderBy("name").as[(String, Int)].collect().toSeq
    store.compactNodes("link", targetRows = 100L)
    assert(files() == 1, s"expected 1 file after compaction, got ${files()}")
    assert(store.nodes("link").orderBy("name").as[(String, Int)].collect().toSeq == before)
  }

  test("scd2Apply: changed keys close+reopen, identical updates are no-ops, " +
      "new keys insert; asOf reads the right version") {
    val hist = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
    // a changes, b is byte-identical (no-op), d is new; c untouched
    val upd = Seq(("a", 10), ("b", 2), ("d", 4)).toDF("k", "v")
      .withColumn("ts", lit(100L))
    val out = GraphStore.scd2Apply(hist, upd, Seq("k"), "ts")
    val rows = out.orderBy("k", "valid_from")
      .as[(String, Int, Long, Option[Long])].collect().toSeq
    assert(rows == Seq(
      ("a", 1, 0L, Some(100L)), ("a", 10, 100L, None),
      ("b", 2, 0L, None), ("c", 3, 0L, None), ("d", 4, 100L, None)))
    // point-in-time views straddle the update
    assert(GraphStore.scd2AsOf(out, 50L).orderBy("k")
      .as[(String, Int, Long, Option[Long])].collect().map(r => (r._1, r._2)).toSeq
      == Seq(("a", 1), ("b", 2), ("c", 3)))
    assert(GraphStore.scd2AsOf(out, 100L).orderBy("k")
      .as[(String, Int, Long, Option[Long])].collect().map(r => (r._1, r._2)).toSeq
      == Seq(("a", 10), ("b", 2), ("c", 3), ("d", 4)))
    // idempotent: re-applying the same batch (later ts) changes nothing
    val again = GraphStore.scd2Apply(out, upd.withColumn("ts", lit(200L)), Seq("k"), "ts")
    assert(again.orderBy("k", "valid_from")
      .as[(String, Int, Long, Option[Long])].collect().toSeq == rows)
  }

  test("scd2Lookup: each fact sees exactly the version valid at its own ts") {
    val hist = Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
    val upd = Seq(("a", 10)).toDF("k", "v").withColumn("ts", lit(100L))
    val h = GraphStore.scd2Apply(hist, upd, Seq("k"), "ts")
    val facts = Seq(("a", 50L), ("a", 100L), ("a", 150L), ("b", 50L),
      ("z", 50L)).toDF("k", "ts")
    val out = GraphStore.scd2Lookup(facts, h, Seq("k"), "ts")
      .select($"k", $"ts", $"v").as[(String, Long, Option[Int])]
      .collect().toSet
    assert(out == Set(
      ("a", 50L, Some(1)),    // before the update
      ("a", 100L, Some(10)),  // valid_from inclusive
      ("a", 150L, Some(10)),  // after
      ("b", 50L, Some(2)),    // untouched key
      ("z", 50L, None)))      // unknown key: left join keeps the fact
    // SCD-2 non-overlap => the lookup never fans a fact out
    assert(out.size == facts.count())
  }

  test("detachDelete removes edges where the deleted node is the dst too") {
    val root = java.nio.file.Files.createTempDirectory("graftstore2").toString
    val store = new GraphStore(spark, root)
    store.writeNodes("link", Seq("u1", "u2", "u3").toDF("name"))
    // LINKS_TO points Link→Link, so a deleted node can sit on either end
    store.writeEdges("LINKS_TO",
      Seq(("u1", "u3"), ("u3", "u2"), ("u1", "u2")).toDF("src", "dst"))
    store.detachDelete("link", "name", Seq("u3").toDF("k"), Seq("LINKS_TO"))
    assert(store.nodes("link").as[String].collect().sorted.toSeq == Seq("u1", "u2"))
    // both the outbound (u3→u2) and inbound (u1→u3) edges are gone
    assert(store.edges("LINKS_TO").as[(String, String)].collect().toSeq == Seq(("u1", "u2")))
  }

  test("materialize: reliable-staging override round-trips identically and severs file lineage") {
    // the cluster-reliability gate (r12 advisor item): with the
    // override set, staging goes through scratch parquet instead of
    // localCheckpoint — rows identical, plan reads the scratch copy
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "v")
    spark.conf.set("spark.graft.store.reliableStaging", "true")
    try {
      val m = GraphStore.materialize(spark, df)
      assert(m.collect().map(r => (r.getLong(0), Option(r.getString(1))))
        .sortBy(_._1).toSeq ==
        Seq((1L, Some("a")), (2L, Some("b")), (3L, None)))
      // staged copy must be its own files — re-reading is stable even
      // if the input's source were overwritten
      assert(m.queryExecution.analyzed.collectLeaves()
        .forall(_.toString.contains("parquet")))
    } finally spark.conf.unset("spark.graft.store.reliableStaging")
    // default (local/static) path stays the checkpoint
    val fast = GraphStore.materialize(spark, df)
    assert(fast.collect().length == 3)
  }
}
