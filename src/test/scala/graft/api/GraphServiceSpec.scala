package graft.api

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{Enrich, Pipeline}
import graft.store.GraphStore

class GraphServiceSpec extends SparkSpec {
  import spark.implicits._

  private def newService(): (GraphService, GraphStore) = {
    val root = java.nio.file.Files.createTempDirectory("graftsvc").toString
    val store = new GraphStore(spark, root)
    val svc = new GraphService(spark, store,
      new Enrich.DeterministicFetcher(failEvery = 0),
      new Enrich.PassThroughCleaner,
      new Enrich.DeterministicClassifier)
    // bootstrap empty tables via the pipeline with zero urls
    new Pipeline(spark,
      new Enrich.DeterministicFetcher(failEvery = 0),
      new Enrich.PassThroughCleaner,
      new Enrich.DeterministicClassifier)
      .run(spark.emptyDataset[String].toDF("url"), store)
    (svc, store)
  }

  test("EP1 pipeline: urls -> enrich -> graph store -> flagship query") {
    val root = java.nio.file.Files.createTempDirectory("graftpipe").toString
    val store = new GraphStore(spark, root)
    val pipeline = new Pipeline(spark,
      new Enrich.DeterministicFetcher(failEvery = 7),
      new Enrich.PassThroughCleaner,
      new Enrich.DeterministicClassifier,
      stagingDir = Some(root + "/staging"))
    val urls = (1 to 30).map(i => s"https://site$i.example/page").toDF("url")
    val result = pipeline.run(urls, store)
    // failures routed to review, not thrown
    assert(result.loadedLinks + result.review.count() == 30)
    assert(result.loadedLinks > 0)
    // staged CSVs exist (restartability contract)
    assert(new java.io.File(root + "/staging/links_with_metadata").exists())
    // flagship query runs over the loaded store
    val inter = graft.query.GraphQueries.interconnections(
      store.edges("HAS_KEYWORD"), store.edges("BELONGS_TO"))
    assert(inter.count() >= 0) // shape check; content depends on hash categories
  }

  test("EP3 write path: upload, duplicate pre-check, delete cascades") {
    val (svc, store) = newService()
    val n1 = svc.uploadUrls(Seq("https://a.example/x", "https://b.example/y").toDF("url"),
      batchSize = 5)
    assert(n1 == 2)
    assert(store.nodes("link").count() == 2)
    // re-upload same urls: pre-check skips them (0 novel)
    val n2 = svc.uploadUrls(Seq("https://a.example/x").toDF("url"), batchSize = 5)
    assert(n2 == 0)
    // delete cascades edges and cleans orphan dims
    svc.deleteLink("https://a.example/x")
    assert(store.nodes("link").count() == 1)
    assert(store.edges("HAS_KEYWORD").filter($"src" === "https://a.example/x").count() == 0)
    val orphans = graft.query.GraphQueries.orphans(
      store.nodes("keyword"), store.edges("HAS_KEYWORD"))
    assert(orphans.count() == 0)
  }

  test("EP2 read path: index and graphData serve from the store") {
    val (svc, store) = newService()
    svc.uploadUrls(Seq("https://c.example/1", "https://d.example/2").toDF("url"), 5)
    val (listing, inter) = svc.index()
    assert(listing.count() == 2)
    assert(inter.columns.toSeq ==
      Seq("url1", "category1", "url2", "category2", "shared_keyword"))
    val (nodes, edges, dups) = svc.graphData()
    assert(nodes.count() >= 4) // 2 links + >=1 category + >=1 keyword
    assert(edges.count() >= 2)
    assert(dups.count() == 0)
    // CSV snapshot round-trips through the 7-col contract
    val tmp = java.nio.file.Files.createTempDirectory("graftcsv").toString
    svc.saveToCsv(tmp + "/snap")
    val back = graft.etl.Staging.readCsv(spark, tmp + "/snap",
      graft.model.GraphSchema.metadataCsv)
    assert(back.count() == 2)
  }

  test("uploadCsv sniffs the header: metadata CSV vs bare-URL CSV") {
    val (svc, store) = newService()
    val longContent = "spark " * 30 // >= 100 chars, passes validity
    val meta = Seq(("https://meta.example/1", "T1", longContent, "Tech",
        "spark, sql", "because", "kw"))
      .toDF("url", "title", "content", "category", "keyword",
        "category_explanation", "keyword_explanation")
    assert(svc.uploadCsv(meta) == 1) // metadata path: no enrich stages
    assert(store.nodes("link").filter($"url" === "https://meta.example/1").count() == 1)
    // bare-URL shape → scrape+clean+classify path
    assert(svc.uploadCsv(Seq("https://bare.example/2").toDF("url")) == 1)
    assert(store.nodes("link").count() == 2)
    // a url-less CSV is rejected like the reference's flash error
    intercept[IllegalArgumentException](
      svc.uploadCsv(Seq("x").toDF("not_url")))
  }

  test("displayListing substitutes the reference's display fallbacks") {
    val (svc, store) = newService()
    val longContent = "words " * 25
    val meta = Seq(("https://fb.example/1", "T", longContent, "Tech",
        "alpha", null, null))
      .toDF("url", "title", "content", "category", "keyword",
        "category_explanation", "keyword_explanation")
    svc.uploadCsv(meta)
    val row = svc.displayListing().collect().head
    assert(row.getAs[String]("suggested_category") == "None") // staged as ""
    assert(row.getAs[String]("category_explanation") == "None") // null in CSV
    assert(row.getAs[String]("keyword_explanation") == "None")
    assert(row.getAs[String]("keywords") == "alpha") // non-falsy passes through
    assert(row.getAs[String]("raw_content").nonEmpty)
    assert(svc.displayListing().columns.toSeq == Seq("url", "title", "category",
      "raw_category", "suggested_category", "raw_content", "cleaned_content",
      "keywords", "category_explanation", "keyword_explanation"))
  }

  test("auto-snapshot: every mutation regenerates the CSV like save_to_csv") {
    val root = java.nio.file.Files.createTempDirectory("graftsnap").toString
    val store = new GraphStore(spark, root)
    val svc = new GraphService(spark, store,
      new Enrich.DeterministicFetcher(failEvery = 0),
      new Enrich.PassThroughCleaner,
      new Enrich.DeterministicClassifier,
      snapshotPath = Some(root + "/snapshot"))
    new Pipeline(spark,
      new Enrich.DeterministicFetcher(failEvery = 0),
      new Enrich.PassThroughCleaner,
      new Enrich.DeterministicClassifier)
      .run(spark.emptyDataset[String].toDF("url"), store)
    svc.uploadUrls(Seq("https://s.example/1", "https://s.example/2").toDF("url"), 5)
    def snapCount() = graft.etl.Staging.readCsv(spark, root + "/snapshot",
      graft.model.GraphSchema.metadataCsv).count()
    assert(snapCount() == 2) // upload snapshotted
    svc.deleteLink("https://s.example/1")
    assert(snapCount() == 1) // delete snapshotted too
  }

  test("batchSize caps ingest like the reference default") {
    val (svc, store) = newService()
    val urls = (1 to 10).map(i => s"https://cap$i.example/p").toDF("url")
    svc.uploadUrls(urls, batchSize = 3)
    assert(store.nodes("link").count() == 3)
  }
}
