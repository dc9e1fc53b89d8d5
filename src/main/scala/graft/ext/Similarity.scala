package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (driver extension, SURVEY §7 module 6).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact top-k by cosine. The query set is
  *    broadcast, so the big side streams once with a codegen'd cosine
  *    kernel and a per-query top-k window — correct at any corpus
  *    size, O(|corpus|·|queries|·d).
  *  - [[lshTopK]]: random-hyperplane LSH. Sign-bit signatures are
  *    computed map-side against a fixed seeded hyperplane set,
  *    bucketed by signature band; only same-bucket candidates are
  *    scored. At 100 TB this turns the cross product into a
  *    bucket-local join at some recall cost.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Deterministic tie-break on
    * (cos desc, candidate id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(scored, k)
  }

  /** Shared tail of the top-k searches: the native bounded-heap
    * TopKPerKey operator (no per-partition sort), then row_number
    * over the surviving ≤ k rows per query for the rank column. */
  private[ext] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = graft.plans.TopK.topKPerKey(scored,
      Seq(col("query_id")), Seq(col("cos").desc, col("cand_id")), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    topk.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** Sign-bit LSH signature of a float vector: bit j = sign of
    * dot(v, hyperplane_j), packed into a long (nBits <= 63).
    * Hyperplanes are seeded-deterministic; the codegen'd
    * [[graft.functions.HyperplaneSig]] kernel computes all bits in one
    * pass (the per-bit HOF formulation was interpreted and duplicated
    * by projection collapse). */
  def lshSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column =
    graft.functions.Hyperplane.hyperplaneSig(vec, dim, nBits, seed)

  /** Bucket assignment for the scale path: corpus partitioned by LSH
    * signature bands. Two vectors agreeing on any band land in a
    * shared bucket. Returns (id, band_idx, band_val). */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    val bitsPerBand = nBits / bands
    val mask = (1L << bitsPerBand) - 1
    val sig = lshSignature(col(vecCol), dim, nBits, seed)
    df.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("sig"))
      .select(col("id"), col("v"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)): _*))
          .as(Seq("band_idx", "band_val")))
  }

  /** Train IVF centroids: deterministic (seeded) k-means over a
    * sample of the corpus. Centroids come back to the driver — they
    * are k × dim floats, tiny by construction — and get baked into
    * the assignment expression. */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String, k: Int,
      seed: Long = 42L, sampleFraction: Double = 1.0): Array[Array[Float]] = {
    val sample = if (sampleFraction < 1.0)
      corpus.sample(withReplacement = false, sampleFraction, seed) else corpus
    val feats = sample.select(
      org.apache.spark.ml.functions.array_to_vector(
        col(vecCol).cast("array<double>")).as("features"))
    // maxIter 10: IVF cells only need a stable, roughly balanced
    // partition of the space — k-means convergence past ~10 rounds
    // moves recall by noise while doubling training jobs.
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(10).fit(feats)
    model.clusterCenters.map(_.toArray.map(_.toFloat))
  }

  /** IVF-style ANN top-k: corpus vectors are assigned to their
    * nearest centroid (nprobe=1) map-side; each query probes its
    * `nprobe` nearest cells and scores only vectors in those cells.
    * The inverted index is just a DataFrame keyed by cell id —
    * shuffle-partitioned (or bucketed at rest) by cell, so a query
    * touches nprobe/k of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Float]], k: Int,
      nprobe: Int = 2): DataFrame = {
    val cellOf = graft.functions.Centroids.nearestCentroids(col(vecCol), centroids, 1)
    val probeCells = graft.functions.Centroids.nearestCentroids(col(vecCol), centroids, nprobe)
    val indexed = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v"),
      explode(cellOf).as("cell"))
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"),
      explode(probeCells).as("cell"))
    // each candidate lives in exactly one cell (nprobe=1 assignment),
    // so a (query, cand) pair matches at most once — no dedup needed
    val scored = indexed.join(probed, Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(scored, k)
  }

  /** ANN top-k via LSH buckets: score only same-bucket candidates,
    * then per-query top-k. Approximate — recall depends on nBits /
    * bands; the ScalaTest suite measures it against brute force. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nBits: Int = 16, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    val cB = lshBuckets(corpus, idCol, vecCol, dim, nBits, bands, seed)
      .select(col("id").as("cand_id"), col("band_idx"), col("band_val"))
    val qB = lshBuckets(queries, idCol, vecCol, dim, nBits, bands, seed)
      .select(col("id").as("query_id"), col("band_idx"), col("band_val"))
    // dedup on the id PAIR, then join the vectors back — a distinct
    // over rows carrying the embeddings would shuffle and compare the
    // full arrays once per band agreement
    val candidates = cB.join(qB, Seq("band_idx", "band_val"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id")).distinct()
    val scored = candidates
      .join(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v")),
        Seq("cand_id"))
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v")),
        Seq("query_id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    rankTopK(scored, k)
  }
}
