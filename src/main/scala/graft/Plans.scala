package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit dump: prints `explain("formatted")` for the engine's
  * load-bearing queries so the physical shapes (pushdown, broadcast,
  * codegen spans, exchange count) can be reviewed as a document.
  * `PLANS.md` in the repo is this tool's output; PlanShapeSpec pins
  * the same properties as assertions.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Plans"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_j3_interconnect", "q_j3_bucketed", "q_motif_j3", "q_j9_delta_interconnect",
      "q_d2_minhash_lsh", "q_d7_drop_dups", "q_x1_langid", "q_n1_cosine_topk",
      "q_o6_topk_per_key", "q_t2_sessionize",
      "q_ept_training_pipeline", "q_x8_pack", "q_t5_sliding", "q_v1_normalize",
      "q_z1_zorder_scan", "q_ep2_report", "q_a13_cms", "q_j10_bloom_join",
      "q_g6_scd2", "q_n5_pq_ann", "q_f16_fuzzy_join", "q_x16_bigram_lm",
      "q_a19_hll_merge", "q_d9_prefix_jaccard", "q_j11_dpp",
      "q_x17_chunks", "q_j12_cogroup",
      "q_x20_pack_sequences", "q_x21_domain_cap", "q_o13_dsir",
      "q_n6_rrf_fusion", "q_d11_keep_best")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // Execute THIS QueryExecution (toRdd) — a derived count() or a
      // df.write command builds its own QueryExecution, leaving this
      // one un-finalized (isFinalPlan=false, no codegen ids).
      val qe = df.queryExecution
      qe.toRdd.foreach(_ => ())
      println(s"\n## $name\n")
      println("```")
      println(qe.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}
