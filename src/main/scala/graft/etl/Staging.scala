package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV staging reader/writer honoring the reference's stage contracts
  * (SURVEY §1.1). The golden CSVs embed newlines inside quoted
  * `content` cells (links_with_metadata.csv: 170 raw lines ≈ 63
  * records), so `multiLine` + quote escaping are load-bearing.
  */
object Staging {

  /** S2: CSV scan with header, multi-line quoted cells, `"`-escape —
    * the options that make Spark agree with pandas' csv dialect on the
    * reference's golden files. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .schema(schema)
      .csv(path)

  /** S2 hardened: the same scan with malformed-row CAPTURE instead of
    * silent nulling — PERMISSIVE mode routes each unparseable line
    * into `_corrupt_record` while clean rows parse normally. At 100 TB
    * a crawler feed always contains breakage; failing the whole job
    * (FAILFAST) or nulling silently (plain PERMISSIVE) both lose
    * information, so this face returns (clean, quarantined) — the
    * quarantine goes to the reject sink ([[appendCsv]] is the
    * reference's failed-urls pattern) for replay. */
  def readCsvQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType, nullable = true))
    // cached: Spark's CSV parser forbids filtering on _corrupt_record
    // alone from a lazy scan (the column is only populated for rows
    // the parser actually touched in the same pass)
    val parsed = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = parsed.filter(col("_corrupt_record").isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantined = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    (clean, quarantined)
  }

  /** S3: CSV sink (overwrite), single-file contract (df.to_csv) —
    * only for small exports; large tables should go to Parquet via
    * GraphStore. `repartition(1)`, NOT `coalesce(1)`: coalesce folds
    * the entire producing stage into one task (serializing the scan
    * and transforms), while repartition keeps the producer parallel
    * and only the file-writing task is single. */
  def writeCsvSingle(df: DataFrame, path: String): Unit =
    df.repartition(1).write
      .mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  /** S4: append-mode sink (failed URLs accumulated across runs,
    * reference Edits.ipynb:512). */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write.mode("append").option("header", "true").option("escape", "\"").csv(path)

  /** JSON-lines staging faces — the interchange format LLM training
    * pipelines actually move documents in. One JSON object per line,
    * so the files split cleanly (unlike multiLine CSV) and schema
    * travels with the data. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Gzip-compressed JSONL faces — the shape crawl dumps actually
    * arrive in (CommonCrawl WET/WARC derivatives are .gz line-JSON).
    * Spark's codec layer makes read transparent (any mix of .gz and
    * plain files in one directory scans fine); the caveat that matters
    * at 100 TB: gzip is NOT splittable, so one .gz file = one task —
    * exports must keep files at a sane size (the writer's partition
    * count is the parallelism floor for every future reader). */
  def writeJsonlGz(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** ORC staging faces — second columnar format beside Parquet, for
    * interop with ORC-based warehouses. Same pushdown/pruning story
    * via the native ORC reader. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Sharded training-data writer — the pipeline's output face: the
    * corpus range-partitioned into `numShards` key-ordered shards,
    * rows sorted within each shard, files capped at
    * `maxRecordsPerFile` rows. A downstream tokenizer/trainer streams
    * each shard sequentially and shards are mutually key-disjoint
    * (range partitioning), so readers scale horizontally without
    * overlap. At 100 TB this is the standard layout: range exchange +
    * local sort + rolling file writer, no driver involvement. */
  def writeShards(df: DataFrame, path: String, shardCols: Seq[String],
      numShards: Int, maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartitionByRange(numShards, shardCols.map(col): _*)
      .sortWithinPartitions(shardCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  def readShards(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Seeded GLOBAL SHUFFLE shard writer — the training-order face of
    * [[writeShards]]. Range-partitioned key-sorted shards are exactly
    * what a dataloader does NOT want (adjacent examples correlate);
    * training wants a deterministic global permutation. Each row's
    * shuffle key is the polynomial fingerprint of `idCol:seed` — a
    * seeded pseudo-random 31-bit draw that is (a) uniform, (b) stable
    * across runs/layouts, (c) bit-replayable by the DuckDB oracle
    * (same `list_reduce` recurrence, see q_g13's precedent). Shard =
    * key mod numShards (uniform row split), within-shard order = key
    * (ties broken by id) — together a deterministic permutation of
    * the corpus. New seed → new permutation, zero data movement
    * beyond the one shuffle every epoch-reshuffle pays by definition.
    *
    * Layout: `shard=N/` hive dirs so a per-worker reader targets its
    * shards by path (partition pruning); row order inside each file
    * is the shuffle order (parquet preserves it). One exchange + one
    * local sort, no driver involvement — scale shape identical to
    * [[writeShards]]. */
  def writeShuffledShards(df: DataFrame, path: String, idCol: String,
      seed: Long, numShards: Int, maxRecordsPerFile: Long = 1000000L): Unit = {
    val key = graft.functions.TextStats.fingerprint(
      concat(col(idCol).cast("string"), lit(s":$seed")))
    df.withColumn("__shuffle_key", key)
      .withColumn("shard", pmod(col("__shuffle_key"), lit(numShards.toLong)).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__shuffle_key"), col(idCol))
      .drop("__shuffle_key")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Per-shard integrity manifest — (shard, n_rows, checksum) for a
    * sharded export, where `checksum` is the ORDER-INDEPENDENT sum of
    * per-row polynomial fingerprints over `contentCols`, mod 2^31-1.
    * This is the artifact a 100 TB export ships alongside the data so
    * any consumer (or a later re-run) can re-derive shard integrity
    * without trusting file counts: commutative combine ⇒ the check
    * never depends on read order or file split, and the fingerprint
    * recurrence replays in any engine (same kernel as q_o10's shuffle
    * key). The sum accumulates in decimal(38,0) — Spark's long sum
    * would wrap at corpus scale while SQL engines promote to wide
    * integers, so decimal keeps the two sides bit-identical. */
  def shardManifest(shards: DataFrame, shardCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must not be empty")
    val rowFp = graft.functions.TextStats.fingerprint(
      concat_ws("|", contentCols.map(c => col(c).cast("string")): _*))
    shards.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(rowFp.cast("decimal(38,0)")), lit(2147483647L))
          .cast("long").as("checksum"))
  }

  /** Schema-evolution read: one logical table whose parquet
    * generations were written with different (compatible) schemas —
    * the standard long-lived-pipeline situation where a column was
    * added or dropped mid-stream. `mergeSchema` makes the footer
    * union the read schema; generations missing a column yield NULLs.
    *
    * Scale note: schema merging reads every file's FOOTER on the
    * driver side before planning. At 100 TB that is a metadata scan
    * of every generation — acceptable once (cache the merged schema /
    * pin it in a catalog), wrong per-query. This face is the
    * write-side contract; the read-side steady state should pass the
    * pinned schema via `.schema(...)` and skip merging. */
  def readMergedGenerations(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** P8: validity filter before graph load (reference
    * Edits.ipynb:515,1212-1216): content is a non-trivial string and
    * the row was actually classified. */
  def validRows(df: DataFrame): DataFrame =
    df.filter(
      col("content").isNotNull &&
      length(trim(col("content"))) >= 100 &&
      lower(col("category")) =!= "uncategorized" &&
      lower(col("keyword")) =!= "none")

  /** P8 with ZERO-extra-pass metrics (`Dataset.observe`): the validity
    * filter plus an Observation carrying rows_in / null_content /
    * short_content counters, collected as a side effect of whatever
    * action the pipeline runs anyway. At 100 TB this is the only
    * affordable way to get stage-level data-quality counters — a
    * separate `count()` per metric would re-scan the input per
    * counter. Read `observation.get` AFTER an action on the returned
    * frame. */
  def validRowsObserved(df: DataFrame)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("rows_in"),
      count(when(col("content").isNull, 1)).as("null_content"),
      count(when(col("content").isNotNull &&
        length(trim(col("content"))) < 100, 1)).as("short_content"))
    (validRows(observed), obs)
  }

  /** F3: comma-string → array of ≤3 trimmed keywords (reference
    * Edits.ipynb:1072,1240; main.py:76 slices `[:3]`). */
  def keywordArray(keyword: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    slice(filter(transform(split(keyword, ","), k => trim(k)), k => k =!= ""), 1, 3)

  /** F4: array → display string (reference `', '.join(keywords)`). */
  def keywordString(keywords: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(keywords, ", ")

  /** Metadata CSV (7 cols) → Link node DataFrame + edge DataFrames.
    * The set-oriented rewrite of the reference's per-row MERGE load
    * loop (S9, Edits.ipynb:1231-1277): distinct dimensions first, then
    * edges derived by explode — one job each, no driver iteration. */
  def stageMetadata(meta: DataFrame): StagedGraph =
    stageFromLinks(linksFromMetadata(meta))

  /** The link-node half of [[stageMetadata]]: 7-col metadata → the
    * 10-col Link node frame (normalize, keyword split, display
    * defaults, url dedup). Split out so a caller that materializes
    * the staged tables one by one ([[graft.api.GraphService]]'s
    * upsert, the EP1 store build) can pin THIS frame once and derive
    * the four downstream tables from the pinned copy — the lazy
    * five-frame form re-ran the whole upstream chain (novel
    * anti-join, validity filter, dedup window) once per staged
    * table. */
  def linksFromMetadata(meta: DataFrame): DataFrame = meta
    .withColumn("url", UrlFunctions.normalizeUrl(col("url")))
    .withColumn("keywords", keywordArray(col("keyword")))
    .select(
      col("url"),
      coalesce(col("category"), lit("Uncategorized")).as("category"),
      coalesce(col("title"), col("url")).as("title"),
      col("keywords"),
      coalesce(col("category_explanation"), lit("")).as("categoryExplanation"),
      coalesce(col("keyword_explanation"), lit("")).as("keywordExplanation"),
      lit("").as("rawCategory"),
      lit("").as("suggestedCategory"),
      col("content").as("rawContent"),
      col("content").as("cleanedContent"))
    .dropDuplicates("url")

  /** The derived-table half of [[stageMetadata]]: dimensions and
    * edges as pure functions of the (possibly pinned) link frame. */
  def stageFromLinks(links: DataFrame): StagedGraph = {
    val categories = links.select(col("category").as("name")).distinct()
    val keywords = links.select(explode(col("keywords")).as("name")).distinct()
    val belongsTo = links.select(col("url").as("src"), col("category").as("dst")).distinct()
    val hasKeyword = links
      .select(col("url").as("src"), explode(col("keywords")).as("dst")).distinct()
    StagedGraph(links, categories, keywords, belongsTo, hasKeyword)
  }

  /** Small-file compaction — the table-maintenance pass every long-
    * lived 100 TB dataset needs (streaming sinks and per-epoch
    * appends accrete thousands of KB-scale files; each costs a task
    * + an open + a footer read, so scan latency degrades linearly in
    * FILE count, not byte count). Rewrites a parquet directory into
    * ⌈total_bytes / targetBytes⌉ files: the rewrite streams through
    * a round-robin repartition (parallel, no skew — compaction has
    * no key), lands in `<dir>.__compact_tmp`, and swaps in via two
    * renames. Data is preserved as a multiset; row order is NOT
    * (compaction is a layout operation — order-bearing exports use
    * the sharded writers). Returns (files_before, files_after, bytes).
    *
    * CONCURRENCY CONTRACT — compaction requires EXCLUSIVE access to
    * the directory (the maintenance-window discipline every
    * rename-based table format shares short of a transaction log):
    * the two-rename swap has a window between rename(path→old) and
    * rename(tmp→path) where `dir` does not exist, so a concurrent
    * reader can fail, and files appended to `dir` between the
    * snapshot read and the swap are dropped with the old copy.
    * Crash recovery: if the process dies inside the window, the full
    * pre-compaction data survives at `<dir>.__compact_old` — rename
    * it back (this method does so automatically on the next run over
    * the same dir when `dir` is missing but the `.__compact_old`
    * sibling exists). */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long): (Int, Int, Long) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(dir + ".__compact_old")
    // crash recovery: a previous run died mid-swap → restore the
    // moved-aside original before proceeding
    if (!fs.exists(path) && fs.exists(old))
      require(fs.rename(old, path), s"compact: could not restore $old")
    def dataFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).toSeq.filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true)
    require(fs.rename(path, old), s"compact: could not move $dir aside")
    require(fs.rename(tmp, path), s"compact: could not swap in $tmp")
    fs.delete(old, true)
    (before.size, dataFiles(path).size, totalBytes)
  }
}

final case class StagedGraph(
    links: DataFrame,
    categories: DataFrame,
    keywords: DataFrame,
    belongsTo: DataFrame,
    hasKeyword: DataFrame)
