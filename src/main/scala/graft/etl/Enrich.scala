package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{ArticleClassification, ContentClassification}

/** Enrichment stages S5–S7 (fetch / LLM clean / LLM classify) behind
  * traits, so the distributed plumbing is real while the side-effecting
  * client (HTTP, Ollama) is pluggable. The container has no egress, so
  * tests use the deterministic implementations below, which reproduce
  * the reference's *fallback* semantics exactly (Edits.ipynb:461 returns
  * raw content on parse failure; main.py:302-311 regex fallback).
  *
  * Execution model: `mapPartitions` so one client is constructed per
  * partition (per task), not per row — the Spark-idiomatic shape for a
  * connector with expensive setup (reference builds one Ollama client
  * per notebook run; per-partition is the cluster analog).
  */
object Enrich {

  /** S5 contract: url → (title, content) with caps applied
    * (content ≤5000 chars, title ≤255 — Edits.ipynb:251). */
  trait Fetcher extends Serializable {
    def fetch(url: String): Either[String, (String, String)] // Left = failure reason
  }

  /** S6 contract (Edits.ipynb:411-470). */
  trait Cleaner extends Serializable {
    def clean(rawContent: String): ContentClassification
  }

  /** S7 contract (Edits.ipynb:983-1041). */
  trait Classifier extends Serializable {
    def classify(content: String): ArticleClassification
  }

  /** The 10 suggested categories the reference prompts with
    * (Edits.ipynb:989-994). */
  val SuggestedCategories: Seq[String] = Seq(
    "Technology", "Science", "Business", "Health", "Politics",
    "Entertainment", "Sports", "Education", "Travel", "Lifestyle")

  final case class FetchedRow(url: String, title: String, content: String, failureReason: String)

  /** Run the fetch stage over a url column. Failures are captured as
    * data (reference routes them to links_please_review.csv rather
    * than aborting — Edits.ipynb:503-513). */
  def fetchStage(spark: SparkSession, urls: DataFrame, fetcher: Fetcher): Dataset[FetchedRow] = {
    import spark.implicits._
    urls.select("url").as[String].mapPartitions { it =>
      it.map { url =>
        fetcher.fetch(url) match {
          case Right((title, content)) =>
            FetchedRow(url, title.take(255), content.take(5000), null)
          case Left(reason) => FetchedRow(url, null, null, reason)
        }
      }
    }
  }

  final case class CleanedRow(url: String, title: String, content: String,
      garbageText: String, unsureContent: String)

  def cleanStage(spark: SparkSession, fetched: Dataset[FetchedRow], cleaner: Cleaner): Dataset[CleanedRow] = {
    import spark.implicits._
    fetched.filter(_.failureReason == null).mapPartitions { it =>
      it.map { r =>
        val c = cleaner.clean(r.content)
        CleanedRow(r.url, r.title, c.cleanedContent, c.garbageText, c.unsureContent)
      }
    }
  }

  final case class ClassifiedRow(url: String, title: String, content: String,
      category: String, keyword: String, category_explanation: String,
      keyword_explanation: String)

  /** S7 as a stage; output matches the 7-column metadata CSV contract. */
  def classifyStage(spark: SparkSession, cleaned: Dataset[CleanedRow], classifier: Classifier): Dataset[ClassifiedRow] = {
    import spark.implicits._
    cleaned.mapPartitions { it =>
      it.map { r =>
        val a = classifier.classify(r.content)
        ClassifiedRow(r.url, r.title, r.content,
          a.category, a.keywords.take(3).mkString(", "),
          a.categoryExplanation, a.keywordExplanations.mkString("; "))
      }
    }
  }

  // ---- F13: fenced-JSON structured parse ----

  val contentClassificationSchema: StructType = StructType(Seq(
    StructField("garbage_text", StringType),
    StructField("cleaned_content", StringType),
    StructField("unsure_content", StringType)))

  val articleClassificationSchema: StructType = StructType(Seq(
    StructField("category", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("category_explanation", StringType),
    StructField("keyword_explanations", ArrayType(StringType))))

  /** Strip a Markdown ``` / ```json fence (reference checks
    * startswith('```json') and slices — Edits.ipynb:1029-1033). */
  def stripJsonFence(c: Column): Column =
    regexp_replace(regexp_replace(c, "(?s)^\\s*```(?:json)?\\s*", ""), "(?s)\\s*```\\s*$", "")

  /** Fenced LLM output → typed struct; malformed input → all-null
    * struct (from_json PERMISSIVE mode), so callers coalesce each
    * field to the raw-content fallback, matching the reference's
    * except-path (Edits.ipynb:461). Replaces json.loads + Pydantic
    * validate with from_json(schema). */
  def parseFenced(c: Column, schema: StructType): Column =
    from_json(stripJsonFence(c), schema)

  // ---- deterministic no-egress implementations (test doubles that
  //      also serve as the documented fallback semantics) ----

  /** Deterministic "fetch": derives stable pseudo-content from the URL
    * (seeded by its hash). Fails, like the reference, when the "page"
    * yields <100 chars (Edits.ipynb:247). */
  final class DeterministicFetcher(failEvery: Int = 7) extends Fetcher {
    private val words = Vector("graph", "spark", "query", "data", "page",
      "link", "category", "keyword", "engine", "column", "join", "scan")
    def fetch(url: String): Either[String, (String, String)] = {
      val h = url.hashCode
      if (failEvery > 0 && math.floorMod(h, failEvery) == 0)
        Left("Failed to fetch content")
      else {
        val rnd = new scala.util.Random(h)
        val n = 120 + rnd.nextInt(200)
        val body = Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
        Right((s"Title of $url", body))
      }
    }
  }

  /** Pass-through cleaner matching the reference's failure fallback:
    * cleaned = raw (truncated), no garbage detected. */
  final class PassThroughCleaner extends Cleaner {
    def clean(raw: String): ContentClassification =
      ContentClassification("", Option(raw).getOrElse("").take(5000), "")
  }

  /** Deterministic classifier mirroring the regex fallback in
    * main.py:302-311: category from a stable hash over the suggested
    * list, keywords = first 3 distinct capitalizable words. */
  final class DeterministicClassifier extends Classifier {
    def classify(content: String): ArticleClassification = {
      val c = Option(content).getOrElse("")
      val cat = SuggestedCategories(math.floorMod(c.hashCode, SuggestedCategories.length))
      val kws = c.split("\\s+").filter(_.length >= 4).distinct.take(3).toSeq
      val keywords = if (kws.isEmpty) Seq("none") else kws
      ArticleClassification(cat, keywords, s"hash-assigned $cat", keywords.map(k => s"term $k"))
    }
  }
}
