package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{AnnGeometry, Similarity}

/** Raw-recall probe for the ANN faces: prints the measured IVF / LSH
  * / NN-descent recall (not just the gates' booleans) at the SF dir
  * in SPARK_GRAFT_SF_DIR, using the gates' exact geometry via the
  * shared [[graft.ext.AnnGeometry]] (one derivation for gate and
  * probe — a formula change cannot leave this instrument measuring a
  * different index than the gate asserts).
  *
  * Two query regimes, selected by SPARK_GRAFT_PROBE_QUERIES:
  *  - `self` (default): the q_n21 gate's own regime — the stride
  *    sample of the corpus queries the corpus. At sf1/sf10 ScaleGen's
  *    family replicas ARE each vector's true 5-NN and share its cells
  *    and buckets by construction, so self-recall is trivially ~1.0
  *    there (disclosed in COVERAGE round-11 item 5); it stays the
  *    gate-comparable number.
  *  - `fresh`: ~2000 DECORRELATED seeded query vectors (xxhash64-
  *    derived uniform components, ids disjoint from the corpus by
  *    sign) retrieve from the corpus. No family membership, no shared
  *    buckets by construction — the honest recall margin at every
  *    scale, the round-11 "what's missing #2".
  *
  * `nnd` (the NN-descent kNN-graph face) is a self-graph builder, so
  * it is probed only in `self` mode — in `fresh` mode the ivf/lsh
  * query-time indexes are probed with the fresh queries.
  */
object RecallProbe {

  /** Deterministic decorrelated query set: `n` unit-free vectors with
    * components uniform in [−1, 1) from xxhash64(id, dim, seed) —
    * reproducible on any engine, correlated with nothing. Negative
    * ids keep them disjoint from every corpus id, so the faces'
    * `cand_id =!= query_id` guard never drops a corpus vector. */
  def freshQueries(spark: SparkSession, n: Int, dim: Int,
      seed: Long = 42L): DataFrame =
    spark.range(1, n + 1L).select((-col("id")).as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        ((pmod(xxhash64(col("id"), i, lit(seed)), lit(2000000L))
          .cast("double") / 1000000.0) - 1.0).cast("float")).as("embedding"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val mode = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "self")
    require(mode == "self" || mode == "fresh",
      s"SPARK_GRAFT_PROBE_QUERIES must be self|fresh: $mode")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
    val total = e.count()
    val queries = mode match {
      case "fresh" => freshQueries(spark, n = 2000, dim = 64)
      case _ =>
        val every = AnnGeometry.sampleEvery(total)
        e.filter(col("vec_id") % every === 0)
    }
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id",
        "embedding", k = 5)
      .select(col("query_id"), col("cand_id")).localCheckpoint(true)
    val nExact = exact.count()
    val nCells = AnnGeometry.nCells(total)
    val nprobe = AnnGeometry.nprobe(nCells)
    def recallOf(ann: DataFrame): Double =
      ann.select(col("query_id"), col("cand_id"))
        .join(exact, Seq("query_id", "cand_id"), "left_semi")
        .count().toDouble / nExact
    val faces: Seq[(String, () => DataFrame)] = mode match {
      case "fresh" => Seq(
        "ivf" -> (() => Similarity.ivfTopK(e, queries, "vec_id",
          "embedding", Similarity.trainIvfCentroids(e, "embedding",
            k = nCells), k = 5, nprobe = nprobe)),
        "lsh" -> (() => Similarity.lshTopK(e, queries, "vec_id",
          "embedding", dim = 64, k = 5,
          nBits = AnnGeometry.lshBits(total), bands = 4,
          multiProbe = true)))
      case _ => Seq("ivf", "lsh", "nnd").map(via =>
        via -> (() => Similarity.knnGraph(e, "vec_id", "embedding",
          k = 5, via = via, nCells = nCells, nprobe = nprobe,
          knownN = total)))
    }
    val recalls = faces.map { case (via, fn) => via -> recallOf(fn()) }
    val body = recalls.map { case (v, r) => f""""$v":$r%.4f""" }.mkString(",")
    println(s"""{"recall_probe":"$sfDir","mode":"$mode","n":$total,"n_exact":$nExact,"nCells":$nCells,"nprobe":$nprobe,$body}""")
    spark.stop()
  }
}
