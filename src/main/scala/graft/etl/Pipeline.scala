package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.GraphSchema
import graft.store.GraphStore

/** The reference's batch ETL lifecycle (EP1, notebook/Edits.ipynb
  * Cells 1→7) as one restartable Spark pipeline:
  *
  *   links.csv → fetch (S5) → clean (S6) → validity filter (P8) →
  *   classify (S7) → metadata.csv → graph load (S9) → verification
  *   counts.
  *
  * Each stage optionally materializes to the same CSV contracts the
  * reference wrote (SURVEY §1.1) so the pipeline is restartable per
  * stage, exactly like the reference's CSV chain — but each stage is
  * a whole-DataFrame job, and failure rows are captured as data
  * (links_please_review / failed_processing) rather than aborting.
  */
final class Pipeline(
    spark: SparkSession,
    fetcher: Enrich.Fetcher,
    cleaner: Enrich.Cleaner,
    classifier: Enrich.Classifier,
    stagingDir: Option[String] = None) {

  import spark.implicits._

  private def checkpoint(df: DataFrame, name: String): DataFrame =
    stagingDir match {
      case Some(dir) =>
        Staging.writeCsvSingle(df, s"$dir/$name")
        spark.read.option("header", "true").option("multiLine", "true")
          .option("escape", "\"").option("inferSchema", "false")
          .csv(s"$dir/$name")
      case None => df
    }

  /** Full run: url list → staged graph in `store`. Returns the
    * review/failed side-channels alongside the loaded-links count
    * (the reference's verification count, Edits.ipynb:1280). */
  def run(urls: DataFrame, store: GraphStore): PipelineResult = {
    // S5 fetch; failures → links_please_review.csv contract
    val fetched = Enrich.fetchStage(spark, urls, fetcher)
    val review = fetched.filter($"failureReason".isNotNull)
      .select($"url", $"failureReason".as("reason"))
    val fetchedOk = fetched.filter($"failureReason".isNull)
    checkpoint(fetchedOk.select($"url", $"title", $"content"), "links_with_raw_content")

    // S6 clean; cleaning log contract
    val cleaned = Enrich.cleanStage(spark, fetchedOk, cleaner)
    checkpoint(cleaned.select($"url", $"garbageText".as("garbage_text"),
      $"unsureContent".as("unsure_content")), "cleaning_log")

    // S7 classify → 7-col metadata contract
    val classified = Enrich.classifyStage(spark, cleaned, classifier).toDF()
    val meta = checkpoint(classified, "links_with_metadata")

    // P8 validity filter, then S9 set-oriented graph load. Pin the
    // link frame once: the five table writes below each execute their
    // staged plan, and the lazy five-frame form re-ran the whole
    // upstream chain (fetch → clean → classify when unstaged, the
    // multiLine CSV re-parse when staged) once per table.
    val valid = Staging.validRows(meta)
    val links = GraphStore.materialize(spark, Staging.linksFromMetadata(valid))
    val staged = Staging.stageFromLinks(links)

    store.createNodeTable("link", GraphSchema.link)
    store.createNodeTable("category", GraphSchema.dimension)
    store.createNodeTable("keyword", GraphSchema.dimension)
    store.createRelTable(graft.model.EdgeTypes.BelongsTo)
    store.createRelTable(graft.model.EdgeTypes.HasKeyword)

    // empty-batch short-circuit (same rule as GraphService.upsertStaged):
    // merging an empty staged batch is the identity, so skip the five
    // merge + full-table rewrites — the bootstrap `run(empty)` the
    // ingest gates use to create tables otherwise pays a whole
    // merge/rewrite cycle over zero rows.
    if (!links.isEmpty) {
      // five disjoint-table merges from the pinned link frame — run
      // concurrently (guide §2.6; same as GraphService.upsertStaged)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      Await.result(Future.sequence(Seq[() => Unit](
        () => store.writeNodes("link",
          GraphStore.mergeByKey(store.nodes("link"), staged.links, Seq("url"))),
        () => store.writeNodes("category",
          GraphStore.mergeByKey(store.nodes("category"), staged.categories, Seq("name"))),
        () => store.writeNodes("keyword",
          GraphStore.mergeByKey(store.nodes("keyword"), staged.keywords, Seq("name"))),
        () => store.writeEdges(graft.model.EdgeTypes.BelongsTo,
          store.mergeEdges(store.edges(graft.model.EdgeTypes.BelongsTo), staged.belongsTo)),
        () => store.writeEdges(graft.model.EdgeTypes.HasKeyword,
          store.mergeEdges(store.edges(graft.model.EdgeTypes.HasKeyword), staged.hasKeyword)))
        .map(w => Future(w()))), Duration.Inf)
    }

    PipelineResult(store.nodes("link").count(), review)
  }
}

final case class PipelineResult(loadedLinks: Long, review: DataFrame)
