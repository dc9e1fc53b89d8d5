package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Raw-recall probe for the q_n21 kNN-graph gate: prints the measured
  * IVF/LSH recall (not just the gate's boolean) at the SF dir in
  * SPARK_GRAFT_SF_DIR, using the gate's exact geometry (nCells ~ √N,
  * nprobe ~ log₂ nCells, fixed-count ~2000-query exact baseline).
  * The gate asserts recall ≥ {ivf: 0.3, lsh: 0.6}; this records the
  * HEADROOM at each smoked sf, so a scale point where the margin
  * thins is visible before the boolean ever flips (the q_n21 nprobe
  * scaling made recall a property of index geometry, not corpus size
  * — this is the instrument that checks that claim per decade).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
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
    val every = math.max(1L, total / 2000L)
    val sample = e.filter(col("vec_id") % every === 0)
    val exact = graft.ext.Similarity.bruteForceTopK(e, sample, "vec_id",
        "embedding", k = 5)
      .select(col("query_id"), col("cand_id")).localCheckpoint(true)
    val nExact = exact.count()
    val nCells = math.min(4096, math.max(16,
      math.ceil(math.sqrt(total.toDouble)).toInt))
    val nprobe = math.max(2, math.ceil(
      math.log(nCells.toDouble) / math.log(2.0)).toInt)
    val recalls = Seq("ivf", "lsh").map { via =>
      val hits = graft.ext.Similarity.knnGraph(e, "vec_id", "embedding",
          k = 5, via = via, nCells = nCells, nprobe = nprobe,
          knownN = total)
        .select(col("query_id"), col("cand_id"))
        .join(exact, Seq("query_id", "cand_id"), "left_semi").count()
      via -> hits.toDouble / nExact
    }
    val body = recalls.map { case (v, r) => f""""$v":$r%.4f""" }.mkString(",")
    println(s"""{"recall_probe":"$sfDir","n":$total,"n_exact":$nExact,"nCells":$nCells,"nprobe":$nprobe,$body}""")
    spark.stop()
  }
}
