package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for the density-clustering LSH face: measures
  * [[graft.ext.Density.epsNeighborPairs]]`(via="lsh")` recall against
  * the brute-force oracle on a SAMPLED universe (the q_n21 convention:
  * the quadratic face runs on the sample as ground truth, the LSH face
  * is the same code the scale path runs), then runs [[graft.ext
  * .Density.dbscan]] on BOTH pair sets and reports role agreement.
  * Because the LSH face verifies candidates exactly, its pair set is a
  * strict subset of brute — recall is |lsh| / |brute| on the sample.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_SAMPLE_MOD=5
  *        SPARK_GRAFT_SIMMIN=0.92 runMain graft.ScaleProbe
  * Prints one JSON line.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_SAMPLE_MOD", "5").toInt
    val simMin = sys.env.getOrElse("SPARK_GRAFT_SIMMIN", "0.92").toDouble
    val minPts = sys.env.getOrElse("SPARK_GRAFT_MINPTS", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val u = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % mod === 0)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val nU = u.count()
    val brute = graft.ext.Density.epsNeighborPairs(u, "vec_id",
      "embedding", simMin, via = "brute").localCheckpoint(true)
    val lsh = graft.ext.Density.epsNeighborPairs(u, "vec_id",
      "embedding", simMin, via = "lsh").localCheckpoint(true)
    val nB = brute.count()
    val nL = lsh.count()
    val recall = if (nB == 0) 1.0 else nL.toDouble / nB
    val dbB = graft.ext.Density.dbscan(u, "vec_id", brute, minPts)
      .select(col("id"), col("role").as("role_b"), col("cluster").as("cl_b"))
    val dbL = graft.ext.Density.dbscan(u, "vec_id", lsh, minPts)
      .select(col("id"), col("role").as("role_l"), col("cluster").as("cl_l"))
    val agree = dbB.join(dbL, Seq("id"))
      .agg(avg(when(col("role_b") === col("role_l"), 1.0).otherwise(0.0))
        .as("role_agree"))
      .head().getDouble(0)
    println(s"""{"probe":"dbscan_lsh_recall","sf":"$sfDir","sample_mod":$mod,""" +
      s""""n_universe":$nU,"sim_min":$simMin,"min_pts":$minPts,""" +
      s""""brute_pairs":$nB,"lsh_pairs":$nL,""" +
      f""""pair_recall":$recall%.4f,"role_agreement":$agree%.4f}""")
    spark.stop()
  }
}
