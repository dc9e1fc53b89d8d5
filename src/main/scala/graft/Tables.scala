package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet dataset per table; Catalyst sees the parquet footer
  * stats, so filters/projections in the queries push down into the
  * scan (verify with .explain: PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two physical forms across testdata
    * generations: parquet TIMESTAMP(NANOS) (which vanilla Spark
    * rejects, [PARQUET_TYPE_ILLEGAL] — read as raw nanos via the
    * legacy conf and convert) and plain TIMESTAMP(MICROS) without
    * the UTC flag (which Spark reads as TIMESTAMP_NTZ). Normalize
    * both to a session-TZ TimestampType column so every downstream
    * face (windows, watermarks, to_date) sees one type; the session
    * TZ is pinned to UTC, so NTZ→TZ is a pure relabel. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // integral `div`, NOT `/`: epoch-nanos (~1.7e18) exceed double
        // mantissa precision, so float division is off by ±1us
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
