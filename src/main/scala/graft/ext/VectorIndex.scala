package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Persisted IVF vector index — the build-once / query-many face of
  * [[Similarity.ivfTopK]] (which recomputes cell assignments per
  * call). The vector analog of the store's bucketed edge layout:
  *
  *  - `<label>_centroids`: the k × dim codebook (tiny, driver-sized
  *    by construction — the IVF precedent).
  *  - `<label>_postings`: every corpus vector assigned to its nearest
  *    cell, written HIVE-PARTITIONED BY CELL. A query collects its
  *    nprobe probe cells (a few ints), and the `isin` filter prunes
  *    whole cell directories at planning time (`PartitionFilters` in
  *    the scan) — each query touches ~nprobe/k of the corpus ON DISK,
  *    not just post-scan.
  *
  * At 100 TB the postings table is the index: rebuilding it is one
  * linear pass (assignment is an expression over a broadcast
  * codebook), and queries never scan outside their probed cells. */
final class VectorIndex(spark: SparkSession, store: graft.store.GraphStore,
    label: String = "ivf") {

  private val centroidsLabel = s"${label}_centroids"
  private val postingsLabel = s"${label}_postings"

  /** Train the codebook (seeded k-means) and write both tables. */
  def build(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, seed: Long = 42L): Unit = {
    import spark.implicits._
    val centroids = Similarity.trainIvfCentroids(embeddings, vecCol, k, seed)
    store.writeNodes(centroidsLabel,
      centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid"))
    val cellOf = graft.functions.Centroids.nearestCentroids(
      col(vecCol), centroids, 1)
    store.writeNodesPartitioned(postingsLabel,
      embeddings.select(col(idCol).as("cand_id"), col(vecCol).as("cand_v"),
        explode(cellOf).as("cell")),
      partitionCol = "cell")
  }

  /** The stored codebook, back as the driver-side array the
    * assignment/probe expressions bake in. */
  def centroids(): Array[Array[Float]] = {
    import spark.implicits._
    store.nodes(centroidsLabel)
      .orderBy("cell").select("centroid")
      .as[Seq[Float]].collect().map(_.toArray)
  }

  /** ANN top-k against the persisted index. The probe-cell set of the
    * (small) query batch is collected and applied as an `isin`
    * partition filter BEFORE the join, so pruned cells are never read
    * from disk. */
  def query(queries: DataFrame, idCol: String, vecCol: String,
      topK: Int, nprobe: Int = 2): DataFrame = {
    val cents = centroids()
    val probeCells = graft.functions.Centroids.nearestCentroids(
      col(vecCol), cents, nprobe)
    val probed = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_v"), explode(probeCells).as("cell"))
    val cells = probed.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val postings = store.nodes(postingsLabel)
      .filter(col("cell").isin(cells: _*))
    val scored = postings.join(probed, Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos",
        round(VectorFunctions.cosine(col("query_v"), col("cand_v")), 6))
    Similarity.rankTopK(scored, topK)
  }
}
