package graft.model

import org.apache.spark.sql.types._

/** Data model of the rebuilt engine.
  *
  * Mirrors the reference's labeled property graph — node tables `Link`,
  * `Category`, `Keyword` and rel tables `BELONGS_TO`, `HAS_KEYWORD`
  * (reference: notebook/Edits.ipynb:1147-1151 and
  * dockerapp/app/main.py:20-24) — re-expressed as Spark case classes +
  * StructTypes. The reference stores every property as STRING; we keep
  * that, except `keywords`, which the reference denormalizes to a
  * comma-separated string (dockerapp/app/main.py:116,271). Here it is a
  * proper ArrayType(StringType) column and the comma-string is derived
  * on export (etl.Staging).
  */

/** A web page node. PK = url (reference notebook/Edits.ipynb:1147).
  * Superset schema of the dockerapp variant (main.py:20-24). */
final case class Link(
    url: String,
    category: String,
    title: String,
    keywords: Seq[String],
    categoryExplanation: String,
    keywordExplanation: String,
    rawCategory: String,
    suggestedCategory: String,
    rawContent: String,
    cleanedContent: String)

/** Dimension node: a topic. PK = name (Edits.ipynb:1148). */
final case class Category(name: String)

/** Dimension node: an extracted term. PK = name (Edits.ipynb:1149). */
final case class Keyword(name: String)

/** A directed edge. `src`/`dst` are node PKs; `relType` is one of
  * [[EdgeTypes]]. The reference declares edges as separate rel tables;
  * we keep separate DataFrames per rel type with this shared shape. */
final case class Edge(src: String, dst: String)

object EdgeTypes {
  val BelongsTo = "BELONGS_TO" // Link -> Category
  val HasKeyword = "HAS_KEYWORD" // Link -> Keyword
}

/** Typed contract of the LLM content-cleaning stage
  * (reference Edits.ipynb:417-420, Pydantic ContentClassification). */
final case class ContentClassification(
    garbageText: String,
    cleanedContent: String,
    unsureContent: String)

/** Typed contract of the LLM classification stage
  * (reference Edits.ipynb:983-988, Pydantic ArticleClassification).
  * `keywords` is 1..3 items — the only true array type in the
  * reference before flattening. */
final case class ArticleClassification(
    category: String,
    keywords: Seq[String],
    categoryExplanation: String,
    keywordExplanations: Seq[String])

object GraphSchema {
  val link: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("category", StringType),
    StructField("title", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("categoryExplanation", StringType),
    StructField("keywordExplanation", StringType),
    StructField("rawCategory", StringType),
    StructField("suggestedCategory", StringType),
    StructField("rawContent", StringType),
    StructField("cleanedContent", StringType)))

  val dimension: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false)))

  val edge: StructType = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("dst", StringType, nullable = false)))

  /** CSV staging contracts (SURVEY §1.1): each ETL stage materializes
    * one of these. Header row + multiLine content. */
  val linksCsv: StructType = StructType(Seq(StructField("url", StringType)))

  val linksWithContentCsv: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("content", StringType)))

  /** 7-column metadata CSV — the golden interchange format
    * (reference notebook/links_with_metadata.csv, main.py:82-178). */
  val metadataCsv: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("content", StringType),
    StructField("category", StringType),
    StructField("keyword", StringType),
    StructField("category_explanation", StringType),
    StructField("keyword_explanation", StringType)))

  val reviewCsv: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("reason", StringType)))

  val cleaningLogCsv: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("garbage_text", StringType),
    StructField("unsure_content", StringType)))
}
