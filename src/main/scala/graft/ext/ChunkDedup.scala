package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) deduplication — the storage-dedup
  * face of the dedup family (Muthitacharoen et al., SOSP '01 "LBFS";
  * the FastCDC lineage): instead of fixed token shingles
  * ([[SubstringDedup]]) or whole-document signatures ([[Dedup]]), the
  * text is cut at CONTENT-DEFINED boundaries — positions where a
  * mixed rolling window hash satisfies `h·Mix mod M mod divisor == 0`
  * — so an insertion
  * or deletion only reshapes the chunks around the edit while every
  * other chunk keeps its identity. That shift-resilience is exactly
  * what byte-level snapshot dedup needs (re-crawled pages, near-
  * identical boilerplate shells) and what fixed-offset blocking
  * cannot give.
  *
  * Determinism contract (oracle-replayable on both engines): text is
  * normalized to lowercase `[a-z0-9 ]` so every char code is plain
  * ASCII; the window hash over the last `w` chars and the chunk
  * fingerprint are the same base-31 polynomial fold mod 2^31−1
  * (Mersenne), computable as a left fold on either engine. Chunk
  * identity is `(fp, clen)` — carrying the length disambiguates the
  * (astronomically rare) 31-bit fingerprint collision between
  * different-length chunks instead of silently merging them.
  *
  * Scale shape: chunking is a pure map-side explode (per-doc O(n·w)
  * array reads, no shuffle — the O(n) rolling-update form is a
  * constant-factor refinement the declarative fold does not need at
  * w = 8); the only corpus-scale shuffles key on the chunk identity
  * (one hash aggregate builds the global chunk table with map-side
  * partial combine) and on the doc id (per-doc stat rollup). The
  * chunk table joins back to the occurrence stream on its own key —
  * equi-joins AQE can broadcast when the corpus is small and shuffle
  * when it is not. No windows, no driver-side state.
  *
  * Reference scope: `/root/reference` has no dedup of any kind
  * (dockerapp/app/main.py:358-433 keeps one node per URL via MERGE);
  * this is part of the training-data extension surface the charter
  * asks for.
  */
object ChunkDedup {

  /** 2^31 − 1, the Mersenne prime both fold hashes reduce by — small
    * enough that `acc * 31 + c` never leaves the Long range. */
  val Mod = 2147483647L

  /** Multiplicative mixer applied to the window hash BEFORE the
    * boundary modulus. Necessary, not cosmetic: 31 ≡ −1 (mod 32), so
    * the raw fold's low 5 bits are essentially an alternating char
    * sum — on English text `h % 32 == 0` fires ~1/300 instead of
    * 1/32 (measured), making chunks ~10× the intended length. One
    * multiply by an odd constant (the classic LCG multiplier) before
    * reducing restores ~1/divisor. `h < 2^31` keeps `h * Mix < 2^61`
    * inside Long under ANSI. */
  val Mix = 1103515245L

  /** Lowercase ASCII normal form: the char-code alphabet both engines
    * agree on byte-for-byte. Docs whose text is entirely non-ASCII
    * symbols normalize to empty and take no part in chunking. */
  def normalizeAscii(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "")

  private def foldHash(codes: Column): Column =
    aggregate(codes, lit(0L), (acc, c) => (acc * 31L + c) % Mod)

  /** One row per chunk occurrence: (doc_id, chunk_idx, fp, clen).
    * `chunk_idx` is 1-based within the doc; `fp` the base-31 fold of
    * the chunk's char codes; `clen` its length. A boundary sits after
    * position i (i ≥ w) whenever the [[Mix]]-mixed fold of chars
    * (i−w+1 .. i) is ≡ 0 (mod divisor); expected chunk length
    * ≈ divisor. Docs that normalize to empty emit nothing. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, divisor: Int = 32): DataFrame = {
    require(w >= 2, s"window must be >= 2: $w")
    require(divisor >= 2, s"divisor must be >= 2: $divisor")
    // the rolling-hash fold is the most CPU-dense per-row kernel in the
    // repo — spread a sub-parallelism scan before it (Par.spreadToCores
    // is a no-op once the corpus spans ≥ cores splits)
    val base = Par.spreadToCores(docs)
      .select(col(idCol).as("doc_id"), normalizeAscii(col(textCol)).as("__t"))
      .filter(length(col("__t")) > 0)
      .select(col("doc_id"), length(col("__t")).cast("long").as("__n"),
        transform(sequence(lit(1), length(col("__t"))),
          j => ascii(col("__t").substr(j, lit(1))).cast("long")).as("__c"))
    // boundary end-positions: guarded so sequence() never runs backwards
    // on docs shorter than the window (those become one whole-doc chunk)
    val bounds = when(col("__n") >= w,
      filter(sequence(lit(w.toLong), col("__n")), i =>
        (foldHash(slice(col("__c"), i - (w - 1), lit(w))) * Mix % Mod)
          % divisor === 0L))
      .otherwise(array().cast("array<bigint>"))
    // cut list 0, b1, …, n — skipping the final n when it is already a
    // boundary, so no empty chunk is minted and idx stays contiguous.
    // The −1 sentinel prepend keeps element_at in-bounds under ANSI
    // when a doc has no interior boundary at all.
    val lastBound = element_at(concat(array(lit(-1L)), col("__b")), -1)
    val cuts = when(lastBound === col("__n"), concat(array(lit(0L)), col("__b")))
      .otherwise(concat(array(lit(0L)), col("__b"), array(col("__n"))))
    // hash every chunk INSIDE the row (indexed transform over the cut
    // list), then explode only the (fp, clen) structs. Exploding the
    // cut positions first and slicing afterwards copied the doc's
    // whole char array into EVERY chunk row (GenerateExec materializes
    // generator output ⊗ required child columns), i.e. ~len²/divisor
    // bytes per doc — and ScaleGen's decade corpora lengthen docs, so
    // the sf10 smoke measured q_c8 super-linear (17×) from exactly
    // this write amplification. In-row hashing keeps the char array
    // transient in codegen; per-doc output is chunks × 16 B.
    val chunkStructs = transform(
      expr("slice(__cuts, 1, size(__cuts) - 1)"),
      (lo, j) => struct(
        foldHash(slice(col("__c"), (lo + 1).cast("int"),
          (element_at(col("__cuts"), j + 2) - lo).cast("int"))).as("fp"),
        (element_at(col("__cuts"), j + 2) - lo).as("clen")))
    base.withColumn("__b", bounds)
      .withColumn("__cuts", cuts)
      .select(col("doc_id"), posexplode(chunkStructs).as(Seq("__j", "__s")))
      .select(col("doc_id"), (col("__j") + 1).as("chunk_idx"),
        col("__s.fp").as("fp"), col("__s.clen").as("clen"))
  }

  /** The global chunk table: one row per distinct chunk identity
    * (fp, clen) with its occurrence count and first owner (min doc).
    * One hash aggregate over the occurrence stream. */
  def chunkTable(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("fp"), col("clen"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("owner"))

  /** Per-document CDC dedup profile: (doc_id, n_chunks, total_len,
    * n_owned, dup_len) — `n_owned` counts distinct chunk identities
    * whose globally-first owner is this doc (the mass a dedup store
    * would attribute here), `dup_len` the length of this doc's chunks
    * that occur more than once corpus-wide. Docs that normalize to
    * empty report all-zero. */
  def docDedupStats(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, divisor: Int = 32): DataFrame = {
    val ch = cdcChunks(docs, idCol, textCol, w, divisor)
    val g = chunkTable(ch)
    val per = ch.join(g, Seq("fp", "clen"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("clen")).as("total_len"),
        sum(when(col("cnt") > 1, col("clen")).otherwise(0L)).as("dup_len"))
    val owned = g.groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_owned"))
    docs.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .join(owned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("total_len"), lit(0L)).as("total_len"),
        coalesce(col("n_owned"), lit(0L)).as("n_owned"),
        coalesce(col("dup_len"), lit(0L)).as("dup_len"))
  }

  /** Incremental snapshot transfer accounting — the re-crawl question
    * a chunk store answers per new document: how much of it is
    * already held? Chunks the batch, probes the STORE's distinct
    * chunk identities with one equi-join, and reports per batch doc
    * (doc_id, n_chunks, hit_len, new_len) — `hit_len` the mass the
    * store already has (not re-transferred), `new_len` the genuinely
    * new mass. O(batch + matches) like the incremental MinHash index
    * probe ([[Dedup]] q_d8): the store is touched only through its
    * chunk table, never re-chunked per batch in a real deployment
    * (here both sides chunk from text so the oracle can replay). */
  def incrementalStats(store: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      w: Int = 8, divisor: Int = 32): DataFrame = {
    val held = cdcChunks(store, idCol, textCol, w, divisor)
      .select(col("fp"), col("clen")).distinct()
      .withColumn("__hit", lit(1L))
    val per = cdcChunks(batch, idCol, textCol, w, divisor)
      .join(held, Seq("fp", "clen"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__hit").isNotNull, col("clen")).otherwise(0L)).as("hit_len"),
        sum(when(col("__hit").isNull, col("clen")).otherwise(0L)).as("new_len"))
    batch.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("hit_len"), lit(0L)).as("hit_len"),
        coalesce(col("new_len"), lit(0L)).as("new_len"))
  }

  /** Corpus-level dedup savings, the single-row accounting a chunk
    * store quotes: chunk/distinct counts, raw vs deduplicated char
    * mass, and the savings ratio 1 − distinct/raw (6 dp). */
  def corpusSavings(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, divisor: Int = 32): DataFrame =
    chunkTable(cdcChunks(docs, idCol, textCol, w, divisor))
      .agg(sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("clen")).as("raw_mass"),
        sum(col("clen")).as("dedup_mass"))
      .select(col("n_chunks"), col("n_distinct"), col("raw_mass"),
        col("dedup_mass"),
        round(lit(1.0) - col("dedup_mass").cast("double") / col("raw_mass"), 6)
          .as("savings"))
}
