package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-scale INPUT measurement for the decade table — the round-11
  * meta-lesson made executable: ScaleGen's "decade" is not uniformly
  * 10× (measured: 506× distinct bigram edges, 18.7× chars between
  * sf1 and sf10), so a raw runtime ratio is uninterpretable until
  * the gate's actual work driver is measured at both scales. This
  * main prints ONE JSON line of the drivers the decade gates key on;
  * `tools/ratio_table.py --datacheck` joins two of these lines (via
  * `tools/gate_inputs.json`) into input-normalized verdicts, and
  * `tools/assemble_sf10.py` embeds them per row in BENCH_SF10.json.
  *
  * Measures (each shares its derivation with the gate it normalizes):
  *  - doc_rows / doc_chars — corpus size; chars drive everything
  *    shingle-/chunk-shaped (CDC q_c8, BPE q_x15, minhash chains);
  *  - bigram_edges — DISTINCT canonical co-occurrence edges via
  *    [[graft.ext.TextAnalysis.bigramEdges]], q_x42's graph size;
  *  - kw_pairs2 — Σ_keyword df² over EP1's keyword derivation
  *    (source + first token, `SparkEntry.ep1Metadata`): the flagship
  *    J3 self-join's pair-work driver, the q_ep1 regime statistic
  *    (fixed-vocab replication grows it quadratically, constant-
  *    density linearly);
  *  - emb_rows — ANN corpus size (q_n21's designed cost is
  *    N^1.5·log N of this; q_n25's is linear);
  *  - event_rows / li_rows — the time-series and TPC-H gate drivers;
  *  - copurchase_edges — the community-detection graph built from
  *    the l_orderkey%50 lineitem slice (`SparkEntry.coPurchaseEdges`
  *    shape): scale-INVARIANT under ScaleGen by construction (the
  *    key shift is ≡0 mod 50 and suppkey/partkey replicate
  *    unchanged), which is exactly why Louvain/Leiden decade ratios
  *    sit near 1× — this measure makes that statement checkable.
  */
object DataCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_LOCAL_DIR")
      .foreach(v => builder.config("spark.local.dir", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val docStats = docs.agg(count(lit(1)).as("n"),
      sum(length(col("text")).cast("long")).as("chars")).head()
    val (docRows, docChars) = (docStats.getLong(0), docStats.getLong(1))
    val bigramEdges = graft.ext.TextAnalysis.bigramEdges(docs, "text")
      .distinct().count()
    // EP1's keyword derivation (SparkEntry.ep1Metadata): each doc
    // contributes its source and its first token; J3 pair work is
    // Σ df² over that multiset
    val kwPairs2 = docs.select(explode(array(col("source"),
        element_at(split(col("text"), " "), 1))).as("kw"))
      .groupBy(col("kw")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("p2"))
      .head().getDecimal(0).longValueExact()
    val embRows = Tables.embeddings(spark, sfDir).count()
    val eventRows = Tables.events(spark, sfDir).count()
    val li = Tables.lineitem(spark, sfDir)
    val liRows = li.count()
    val hk = li.filter(col("l_orderkey") % 50 === 0)
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
    val coEdges = hk.as("a").join(hk.as("b"),
        col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
      .select(col("a.sk"), col("b.sk")).distinct().count()

    println(s"""{"datacheck":"$sfDir","doc_rows":$docRows,"doc_chars":$docChars,"bigram_edges":$bigramEdges,"kw_pairs2":$kwPairs2,"emb_rows":$embRows,"event_rows":$eventRows,"li_rows":$liRows,"copurchase_edges":$coEdges}""")
    spark.stop()
  }
}
