package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-pruned upsert (the 100 TB ingest write path): a batch
  * must rewrite ONLY the hash-bucket directories its keys land in —
  * untouched buckets' files stay byte-identical (same paths, same
  * lengths: Spark part-file names are per-write UUIDs, so any rewrite
  * shows as a path change) — while the logical result is exactly the
  * flat mergeByKey. */
class PartitionedUpsertSpec extends SparkSpec {
  import spark.implicits._

  /** (relative path) -> length for every data file under dir. */
  private def fileStamps(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(dir) -> f.length()).toMap
  }

  private def bucketOf(key: String, buckets: Int): Int =
    spark.range(1)
      .select(pmod(xxhash64(lit(key)), lit(buckets)).cast("int"))
      .head().getInt(0)

  test("upsertNodesPartitioned: small batch rewrites only its buckets; result == flat merge") {
    val root = java.nio.file.Files.createTempDirectory("graft_part_spec").toString
    val store = new GraphStore(spark, root)
    val buckets = 16
    val base = (0 until 200)
      .map(i => (s"https://site$i.example/", s"t$i")).toDF("url", "title")
    store.writeNodes("link", base) // flat bootstrap
    // first partitioned upsert migrates flat -> hash-partitioned
    val batch1 = (200 until 210)
      .map(i => (s"https://site$i.example/", s"t$i")).toDF("url", "title")
    store.upsertNodesPartitioned("link", batch1, "url", buckets)
    val before = fileStamps(s"$root/nodes/link")
    assert(before.keys.exists(_.contains("__bucket=")), "layout not partitioned")

    // one-key update: only that key's bucket directory may change
    val key = "https://site5.example/"
    val touched = bucketOf(key, buckets)
    store.upsertNodesPartitioned("link",
      Seq((key, "UPDATED")).toDF("url", "title"), "url", buckets)
    val after = fileStamps(s"$root/nodes/link")

    val untouchedBefore = before.filterNot(_._1.contains(s"/__bucket=$touched/"))
    val untouchedAfter = after.filterNot(_._1.contains(s"/__bucket=$touched/"))
    assert(untouchedBefore == untouchedAfter,
      s"untouched buckets changed:\n${(untouchedBefore.toSet diff untouchedAfter.toSet)}")
    val touchedBefore = before.keySet.filter(_.contains(s"/__bucket=$touched/"))
    val touchedAfter = after.keySet.filter(_.contains(s"/__bucket=$touched/"))
    assert(touchedBefore.nonEmpty && (touchedBefore intersect touchedAfter).isEmpty,
      "touched bucket was not rewritten")

    // logical result identical to the flat J7 merge
    val ref = GraphStore.mergeByKey(
        GraphStore.mergeByKey(base, batch1, Seq("url")),
        Seq((key, "UPDATED")).toDF("url", "title"), Seq("url"))
      .as[(String, String)].collect().toSet
    val got = store.nodes("link").as[(String, String)].collect().toSet
    assert(got == ref, s"diff: ${(got diff ref) ++ (ref diff got)}")
    assert(!store.nodes("link").columns.contains("__bucket"),
      "layout column escaped the store")
  }

  test("upsertEdgesPartitioned: distinct-union merge per touched bucket only") {
    val root = java.nio.file.Files.createTempDirectory("graft_part_spec_e").toString
    val store = new GraphStore(spark, root)
    val buckets = 8
    store.createRelTable("HAS_KEYWORD") // flat empty bootstrap
    val base = (0 until 100).map(i => (s"u$i", s"kw${i % 7}")).toDF("src", "dst")
    store.upsertEdgesPartitioned("HAS_KEYWORD", base, buckets) // migrates
    val before = fileStamps(s"$root/edges/HAS_KEYWORD")
    assert(before.keys.exists(_.contains("__bucket=")), "layout not partitioned")

    val touched = bucketOf("u3", buckets)
    // one duplicate edge + one new edge for the same src
    store.upsertEdgesPartitioned("HAS_KEYWORD",
      Seq(("u3", "kw3"), ("u3", "kwNEW")).toDF("src", "dst"), buckets)
    val after = fileStamps(s"$root/edges/HAS_KEYWORD")
    val untouchedBefore = before.filterNot(_._1.contains(s"/__bucket=$touched/"))
    val untouchedAfter = after.filterNot(_._1.contains(s"/__bucket=$touched/"))
    assert(untouchedBefore == untouchedAfter, "untouched buckets changed")

    val ref = (base.as[(String, String)].collect().toSet + (("u3", "kwNEW")))
    val got = store.edges("HAS_KEYWORD").as[(String, String)].collect().toSet
    assert(got == ref, s"diff: ${(got diff ref) ++ (ref diff got)}")
  }
}
