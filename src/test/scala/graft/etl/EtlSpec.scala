package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EtlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.normalizeUrl($"u").as("n"))
      .as[String].collect().toSeq

  test("normalizeUrl: scheme default, query/fragment strip, host lowercase, trailing slash") {
    assert(norm("example.com/Path/") == Seq("https://example.com/Path"))
    assert(norm("HTTP://Example.COM/A/b?q=1#f") == Seq("http://example.com/A/b"))
    assert(norm("  https://a.b/c/  ") == Seq("https://a.b/c"))
    assert(norm("https://Host.De") == Seq("https://host.de"))
  }

  test("normalizeUrl is idempotent") {
    val urls = Seq("example.com/x/", "HTTPS://A.B/c?q#f", "http://h/p///")
    val once = norm(urls: _*)
    assert(norm(once: _*) == once)
  }

  test("host + registeredDomain: userinfo/port strip, eTLD+1 heuristic") {
    def dom(urls: String*): Seq[String] =
      urls.toDF("u").select(
        UrlFunctions.registeredDomain(UrlFunctions.host($"u")).as("d"))
        .as[String].collect().toSeq
    assert(dom("https://www.Example.COM/a?q=1") == Seq("example.com"))
    assert(dom("user:pw@Sub.Host.org:8080/p") == Seq("host.org"))
    assert(dom("https://a.b.news.co.uk/x") == Seq("news.co.uk"))
    assert(dom("https://deep.sub.example.ac.jp") == Seq("example.ac.jp"))
    assert(dom("localhost/x") == Seq("localhost"))
    assert(dom("example.io") == Seq("example.io"))
    // two-letter TLD without a public second-level label stays eTLD+1=2
    assert(dom("https://www.site.de/p") == Seq("site.de"))
  }

  test("capPerDomain: cap enforced, deterministic, fingerprint-permuted") {
    import graft.ext.Sampling
    val df = (1L to 200L).map(i => (i, if (i % 4 == 0L) "tail" + i else "big.com"))
      .toDF("doc_id", "domain")
    val out = Sampling.capPerDomain(df, "domain", "doc_id", cap = 5)
    val by = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(by("big.com") == 5L)
    assert(by.filter(_._1 != "big.com").forall(_._2 == 1L))
    // columns unchanged, selection deterministic across runs
    assert(out.columns.toSeq == Seq("doc_id", "domain"))
    val again = Sampling.capPerDomain(df, "domain", "doc_id", cap = 5)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // fingerprint permutation, not head-of-crawl bias: the kept five
    // from big.com are not simply the five lowest ids
    val kept = out.filter($"domain" === "big.com")
      .select("doc_id").as[Long].collect().toSet
    assert(kept != Set(1L, 2L, 3L, 5L, 6L), s"kept=$kept")
  }

  test("shardManifest: order-independent, corruption-sensitive") {
    val df = Seq((0, 1L, "alpha"), (0, 2L, "beta"), (1, 3L, "gamma"))
      .toDF("shard", "id", "text")
    def m(d: org.apache.spark.sql.DataFrame) =
      Staging.shardManifest(d, "shard", Seq("id", "text"))
        .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val base = m(df)
    assert(base.map(r => (r._1, r._2)) == Seq((0, 2L), (1, 1L)))
    // row order within a shard doesn't matter (commutative combine)
    val reordered = Seq((0, 2L, "beta"), (1, 3L, "gamma"), (0, 1L, "alpha"))
      .toDF("shard", "id", "text")
    assert(m(reordered) == base)
    // a single changed character changes that shard's checksum only
    val corrupted = Seq((0, 1L, "alphA"), (0, 2L, "beta"), (1, 3L, "gamma"))
      .toDF("shard", "id", "text")
    val c = m(corrupted)
    assert(c.head._3 != base.head._3 && c(1) == base(1))
    // a dropped row changes count and checksum
    val dropped = m(df.filter($"id" =!= 2L))
    assert(dropped.head._2 == 1L && dropped.head._3 != base.head._3)
  }

  test("CSV staging round-trips multi-line quoted content") {
    val dir = java.nio.file.Files.createTempDirectory("graftcsv").toString
    val df = Seq(
      ("https://a", "T1", "line one\nline two, with comma\n\"quoted\""),
      ("https://b", "T2", "plain")).toDF("url", "title", "content")
    Staging.writeCsvSingle(df, dir + "/out")
    val back = Staging.readCsv(spark, dir + "/out", graft.model.GraphSchema.linksWithContentCsv)
    assert(back.count() == 2)
    val c = back.filter($"url" === "https://a").select("content").as[String].head()
    assert(c == "line one\nline two, with comma\n\"quoted\"")
  }

  test("quarantine CSV scan: clean rows parse, malformed rows are " +
      "captured verbatim, nothing is silently nulled") {
    val dir = java.nio.file.Files.createTempDirectory("graftquar").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name\n1,alice\nnotanint,bob\n2,carol\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    val (clean, quarantined) = Staging.readCsvQuarantine(spark, s"$dir/in.csv", schema)
    assert(clean.orderBy("id").as[(Int, String)].collect().toSeq
      == Seq((1, "alice"), (2, "carol")))
    assert(quarantined.as[String].collect().toSeq == Seq("notanint,bob"))
  }

  test("append-mode CSV accumulates across runs (S4)") {
    val dir = java.nio.file.Files.createTempDirectory("graftappend").toString + "/failed"
    Staging.appendCsv(Seq(("https://x", "timeout")).toDF("url", "reason"), dir)
    Staging.appendCsv(Seq(("https://y", "short")).toDF("url", "reason"), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
  }

  test("viz JSON export produces one document per node/edge (S11)") {
    val (nodesJson, edgesJson) = graft.query.GraphQueries.vizJson(
      Seq(("l1", "T")).toDF("url", "title"),
      Seq("A").toDF("name"), Seq("k").toDF("name"),
      Seq(("l1", "A")).toDF("src", "dst"), Seq(("l1", "k")).toDF("src", "dst"))
    val nodes = nodesJson.collect()
    assert(nodes.length == 3 && nodes.forall(_.startsWith("{\"id\":")))
    assert(edgesJson.collect().forall(_.contains("\"from\":")))
  }

  test("keywordArray: trims, drops empties, caps at 3") {
    val out = Seq("a, b , c, d", " x ,, y", "").toDF("k")
      .select(Staging.keywordArray($"k").as("a")).as[Seq[String]].collect()
    assert(out(0) == Seq("a", "b", "c"))
    assert(out(1) == Seq("x", "y"))
    assert(out(2) == Seq())
  }

  test("validRows drops short/uncategorized/none rows (P8)") {
    val long = "x" * 120
    val rows = Seq(
      ("u1", long, "Tech", "kw"),            // valid
      ("u2", "short", "Tech", "kw"),         // too short
      ("u3", long, "uncategorized", "kw"),   // uncategorized
      ("u4", long, "Tech", "none"),          // no keyword
      ("u5", null, "Tech", "kw")             // null content
    ).toDF("url", "content", "category", "keyword")
    assert(Staging.validRows(rows).select("url").as[String].collect().toSeq == Seq("u1"))
  }

  test("validRowsObserved: observe() metrics arrive with the main action, no extra scan") {
    val long = "x" * 120
    val rows = Seq(
      ("u1", long, "Tech", "kw"),
      ("u2", "short", "Tech", "kw"),
      ("u3", long, "uncategorized", "kw"),
      ("u4", long, "Tech", "none"),
      ("u5", null, "Tech", "kw")
    ).toDF("url", "content", "category", "keyword")
    val (valid, obs) = Staging.validRowsObserved(rows)
    assert(valid.select("url").as[String].collect().toSeq == Seq("u1"))
    val m = obs.get
    assert(m("rows_in") == 5L && m("null_content") == 1L &&
      m("short_content") == 1L)
  }

  test("parseFenced: fenced JSON parses; malformed yields null for fallback (F13)") {
    val schema = Enrich.articleClassificationSchema
    val df = Seq(
      """```json
        |{"category":"Tech","keywords":["a","b"],"category_explanation":"e","keyword_explanations":["x"]}
        |```""".stripMargin,
      "not json at all").toDF("raw")
      .select(Enrich.parseFenced($"raw", schema).as("p"))
    val rows = df.collect()
    assert(rows(0).getStruct(0).getString(0) == "Tech")
    assert(rows(0).getStruct(0).getSeq[String](1) == Seq("a", "b"))
    // malformed -> all-null struct (PERMISSIVE) -> caller coalesces
    // each field to the raw-content fallback
    val malformed = rows(1).getStruct(0)
    assert(malformed == null || (0 until malformed.length).forall(malformed.isNullAt))
  }

  test("enrich pipeline: fetch -> clean -> classify with deterministic impls (S5-S7)") {
    val urls = (1 to 20).map(i => s"https://site$i.example/page").toDF("url")
    val fetched = Enrich.fetchStage(spark, urls, new Enrich.DeterministicFetcher(failEvery = 7))
    val failures = fetched.filter($"failureReason".isNotNull)
    val cleaned = Enrich.cleanStage(spark, fetched, new Enrich.PassThroughCleaner)
    val classified = Enrich.classifyStage(spark, cleaned, new Enrich.DeterministicClassifier)
    // failures are captured as data, not thrown (reference routes to review CSV)
    assert(failures.count() + cleaned.count() == 20)
    val row = classified.orderBy("url").head()
    assert(Enrich.SuggestedCategories.contains(row.category))
    assert(row.keyword.split(", ").length <= 3)
    // deterministic: same input -> same output
    val again = Enrich.classifyStage(spark,
      Enrich.cleanStage(spark,
        Enrich.fetchStage(spark, urls, new Enrich.DeterministicFetcher(failEvery = 7)),
        new Enrich.PassThroughCleaner),
      new Enrich.DeterministicClassifier)
    assert(classified.exceptAll(again).count() == 0)
  }

  test("stageMetadata builds nodes and edges with explode semantics (S9)") {
    val meta = Seq(
      ("a.com", "TA", "c" * 120, "Tech", "k1, k2", "ce", "ke"),
      ("b.com", "TB", "c" * 120, "Sci", "k2, k3", "ce", "ke"),
      ("a.com", "TA2", "c" * 120, "Tech", "k1", "ce", "ke") // dup url -> dedup
    ).toDF("url", "title", "content", "category", "keyword",
      "category_explanation", "keyword_explanation")
    val g = Staging.stageMetadata(meta)
    assert(g.links.count() == 2)
    assert(g.categories.as[String].collect().sorted.toSeq == Seq("Sci", "Tech"))
    assert(g.keywords.count() == 3)
    assert(g.hasKeyword.count() >= 3) // a->k1,a->k2 or a->k1 depending on kept dup
    assert(g.belongsTo.count() == 2)
  }
  test("readMergedGenerations unions generation schemas, nulls missing cols") {
    val root = java.nio.file.Files.createTempDirectory("graft_evolve_spec").toString
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$root/gen=1")
    Seq((2L, "b", 9L)).toDF("id", "s", "extra").write.parquet(s"$root/gen=2")
    val m = Staging.readMergedGenerations(spark, root)
    assert(m.columns.toSet == Set("id", "s", "extra", "gen"))
    val rows = m.select($"id", $"extra").as[(Long, Option[Long])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(9L)), rows.toString)
  }
}
