package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines (driver
  * extension, SURVEY §7 module 6): image/audio/video as opaque
  * `binary` columns plus typed metadata, processed in per-partition
  * batches.
  *
  * The container ships no image/audio codecs, so the decode kernel is
  * STUBBED with a deterministic fake ([[StubDecoder]]) — but the
  * Spark-side plumbing is real and tested: schema, binary column
  * semantics, partition-batch iteration (the Scala analog of
  * `mapInPandas` batches), and the feature-extraction output contract.
  * Swapping in a real decoder means replacing one trait impl.
  */
object Multimodal {

  /** Typed media row: the storage contract for a multimodal table.
    * `media` is the opaque payload; metadata travels beside it so
    * filters on format/size prune without touching bytes. */
  final case class MediaRow(
      media_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Decoded-feature row produced by the decode/extract stage. */
  final case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      checksum: String,
      // stub "embedding": 16-bin byte histogram, L1-normalized
      histogram: Seq[Double])

  /** Decode kernel contract. Real impls wrap an image/audio library;
    * batch-oriented so codec state is reused across a partition. */
  trait Decoder extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** Deterministic fake decoder: features derived purely from the
    * bytes, so tests are stable with no codec installed. */
  final class StubDecoder extends Decoder {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val bytes = Option(r.media).getOrElse(Array.emptyByteArray)
        val hist = new Array[Double](16)
        bytes.foreach(b => hist((b & 0xFF) / 16) += 1.0)
        val total = math.max(1.0, bytes.length.toDouble)
        MediaFeatures(
          r.media_id,
          bytes.length.toLong,
          java.security.MessageDigest.getInstance("SHA-256")
            .digest(bytes).map("%02x".format(_)).mkString,
          hist.map(_ / total).toSeq)
      }
  }

  /** Build a media table from any (id, payload-string) source —
    * the stand-in ingest while real blobs aren't available. Width /
    * height / frames are synthesized deterministically from the id. */
  def mediaTableFromText(spark: SparkSession, src: DataFrame,
      idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    src.select(
        col(idCol).cast("long").as("media_id"),
        col(textCol).cast("binary").as("media"),
        element_at(typedLit(Seq("jpeg", "png", "wav", "mp4")),
          (col(idCol) % 4 + 1).cast("int")).as("format"),
        (col(idCol) % 640 + 16).cast("int").as("width"),
        (col(idCol) % 480 + 16).cast("int").as("height"),
        (col(idCol) % 30 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** The decode / feature-extract stage: repartition for batch-size
    * control, then per-partition batched decode — exactly the
    * `mapInPandas` execution shape (one decoder per task, streaming
    * batches, no driver collect). */
  def decodeStage(spark: SparkSession, media: Dataset[MediaRow],
      decoder: Decoder, partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val repart = if (partitions > 0) media.repartition(partitions) else media
    repart.mapPartitions(rows => decoder.decodeBatch(rows))
  }

  /** Frame sampling for video-like media: keep every `stride`-th
    * frame index up to n_frames — pure metadata op, no decode. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
      filter(sequence(lit(0), col("n_frames") - 1),
        i => i % stride === 0).as("frame_ids"))

  /** Resize kernel contract: batch-oriented like [[Decoder]], one
    * codec instance per task. */
  trait Resizer extends Serializable {
    def resizeBatch(rows: Iterator[MediaRow], targetWidth: Int): Iterator[MediaRow]
  }

  /** Deterministic fake resizer (no codec in the container): clamps
    * width to the target (never upscales), scales height by the same
    * integer ratio, and truncates the payload to the new pixel count —
    * so every output field is a pure arithmetic function of the input
    * and the gate can oracle-check the whole stage. */
  final class StubResizer extends Resizer {
    def resizeBatch(rows: Iterator[MediaRow], targetWidth: Int): Iterator[MediaRow] =
      rows.map { r =>
        val bytes = Option(r.media).getOrElse(Array.emptyByteArray)
        val w = math.min(targetWidth, r.width)
        val h = math.max(1, r.height * w / r.width)
        r.copy(
          media = bytes.take(math.min(bytes.length, w * h)),
          width = w, height = h)
      }
  }

  /** The resize stage: same per-partition batched execution shape as
    * [[decodeStage]] (mapInPandas analog — codec reuse per task, no
    * driver involvement). */
  def resizeStage(spark: SparkSession, media: Dataset[MediaRow],
      resizer: Resizer, targetWidth: Int, partitions: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val repart = if (partitions > 0) media.repartition(partitions) else media
    repart.mapPartitions(rows => resizer.resizeBatch(rows, targetWidth))
  }

  // ---- cross-modal pairing + composite dedup ----

  /** Cross-modal pair construction: media rows joined with their text
    * captions by a shared document key — the image-caption-pair shape
    * every multimodal training corpus is built from. Plain equi-join
    * on the key: Catalyst broadcasts the smaller side or shuffles
    * co-partitioned, and the opaque payload bytes ride through
    * untouched. Caption lands as `caption`. */
  def pairWithText(media: DataFrame, texts: DataFrame, mediaKey: String,
      textKey: String, captionCol: String): DataFrame =
    media.join(
      texts.select(col(textKey).as(mediaKey), col(captionCol).as("caption")),
      Seq(mediaKey))

  /** Composite near-dup pairs over (payload, caption): the union of
    *  - EXACT payload duplicates — sha256(payload) equality, found by
    *    electing a min-id representative per hash and pairing every
    *    other member to it (star pairs: linear in group size, never
    *    the quadratic self-join, and exactly what the component
    *    resolution needs);
    *  - NEAR caption duplicates — [[Dedup.simHashDupPairs]] LSH.
    * This is the standard multimodal dedup key: re-encoded images keep
    * their caption (caught by text SimHash), re-captioned images keep
    * their bytes (caught by payload hash).
    * @return (id1, id2) with id1 < id2
    */
  def pairDupPairs(pairs: DataFrame, idCol: String, payloadCol: String,
      captionCol: String, maxHamming: Int = 3): DataFrame = {
    val h = pairs.select(col(idCol).as("id"), sha2(col(payloadCol), 256).as("ph"))
    val rep = h.groupBy(col("ph"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("ph"), col("rep"))
    val exact = h.join(rep, Seq("ph"))
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id1"), col("id").as("id2")) // rep = min ⇒ id1 < id2
    val near = Dedup.simHashDupPairs(
        pairs.select(col(idCol), col(captionCol)), idCol, captionCol, maxHamming)
      .select(col("id1"), col("id2"))
    exact.unionByName(near).distinct()
  }

  /** Composite pair dedup: drop every pair row that is an exact-payload
    * or near-caption duplicate of an earlier (min-id representative)
    * row — duplicate components resolve via
    * [[Dedup.resolveDupGroups]]'s min-label propagation. */
  def dedupPairs(pairs: DataFrame, idCol: String, payloadCol: String,
      captionCol: String, maxHamming: Int = 3): DataFrame =
    Dedup.dropNearDups(pairs, idCol,
      pairDupPairs(pairs, idCol, payloadCol, captionCol, maxHamming))
}
