package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up test-data generator: replicates the driver's sf0.1 tables
  * REPLICAS× with shifted keys into a scratch dir, so the heavy gates
  * can be smoke-run at ~sf1 without touching `/root/testdata`
  * (read-only). Text rows get a per-replica unique suffix so exact
  * dedup doesn't collapse the corpus to 10-dup groups while near-dup
  * machinery still sees realistic clusters; embeddings get a tiny
  * per-replica perturbation for the same reason.
  *
  * Usage: SPARK_GRAFT_SRC=/root/testdata/sf0.1 SPARK_GRAFT_OUT=/tmp/sf1
  *        SPARK_GRAFT_REPLICAS=10 runMain graft.ScaleGen
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/sf1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    // per-replica key shift MUST exceed the source's max id, or replicas
    // collide — chaining ScaleGen (sf1 → sf10) needs 10× the default
    val Shift = sys.env.getOrElse("SPARK_GRAFT_SHIFT", "10000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // read events.ts as raw nanos LONG and write it back as LONG, so
    // Tables.events' nanos→micros conversion works on the output too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // SPARK_GRAFT_FAMSIZE: dup-FAMILY size for multi-decade scale-up.
    // Naive replication makes every replica a near-dup of every other
    // (suffix-only text edits, 1e-3 embedding shifts), so chaining
    // decades grows family SIZE: at replicas=100 each doc sits in a
    // 100-member near-dup family and pair machinery (LSH buckets, eps
    // graphs) pays Σ size² — the interrupted first sf10 run measured
    // the cardPairs build at 2819 s vs 18.9 s at sf1 (~150×) from
    // exactly this. Real 10× web growth adds more families, not
    // deeper ones. With famSize = F, replica r joins family r/F:
    // family 0 keeps today's near-dup construction byte-for-byte
    // (replicas < F are IDENTICAL to the sf1 output, so sf10 ⊃ sf1),
    // and each family f > 0 is DEcorrelated from all others —
    //  • text: a token unique per (family, doc, position) is spliced
    //    after every 2nd word, so no word 3-gram survives across
    //    families (the minhash chains shingle at n = 3) while
    //    within-family members still differ only by the light suffix;
    //  • embeddings: a per-family sign-flip of a hash-chosen half of
    //    the dimensions — an isometry, so within-family geometry is
    //    EXACT while cross-family cosines collapse to ~0.
    // Default famSize = replicas ⇒ one family ⇒ today's behavior.
    val famSize = sys.env.getOrElse("SPARK_GRAFT_FAMSIZE", replicas.toString).toInt
    require(famSize >= 1 && replicas % famSize == 0,
      s"famSize must divide replicas: $famSize / $replicas")

    // SPARK_GRAFT_KEYVOCAB=grow: grow the EP1 keyword vocabulary ∝
    // corpus instead of ∝ 1. EP1 derives its keywords from `source`
    // and the FIRST word of `text` — under plain replication both
    // vocabularies stay fixed (20 sources + 30 first words at every
    // scale), so each keyword's document count multiplies 10× per
    // decade and the flagship J3 self-join's pair work grows
    // QUADRATICALLY in scale — a generator artifact: real 10× web
    // growth adds new topics/sites (keys) at roughly constant
    // per-keyword density, not 10×-deeper keyword buckets. `grow`
    // gives each replica its own keyword vocabulary (source suffixed
    // `_g<r>`, first token prefixed `k<r>v`), holding per-keyword
    // density at the source scale's — the regime the q_ep1 decade
    // experiment measures. Default `fixed` keeps today's byte-exact
    // output.
    val growKeyVocab =
      sys.env.getOrElse("SPARK_GRAFT_KEYVOCAB", "fixed") == "grow"

    def replicate(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(r => f(df, r)).reduce(_ unionByName _)

    def decorrelateText(text: org.apache.spark.sql.Column,
        id: org.apache.spark.sql.Column, fam: Int): org.apache.spark.sql.Column =
      if (fam == 0) text
      else array_join(flatten(transform(split(text, " "), (w, i) =>
        when(i % 2 === 1, array(w, concat(lit(s"uf${fam}x"),
          pmod(xxhash64(id, i, lit(fam)), lit(999983)))))
          .otherwise(array(w)))), " ")

    val docs = Tables.documents(spark, src)
    replicate(docs, (d, r) =>
      if (r == 0) d
      else {
        val fam = r / famSize
        val body = concat(decorrelateText(col("text"), col("doc_id"), fam),
          lit(s" uniq$r"), col("doc_id"))
        d.select((col("doc_id") + r * Shift).as("doc_id"),
          (if (growKeyVocab) concat(lit(s"k${r}v"), body) else body).as("text"),
          col("lang"),
          (if (growKeyVocab) concat(col("source"), lit(s"_g$r"))
           else col("source")).as("source"),
          col("n_chars"))
      })
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    def flipDims(emb: org.apache.spark.sql.Column, fam: Int): org.apache.spark.sql.Column =
      if (fam == 0) emb
      else transform(emb, (x, i) =>
        when(pmod(xxhash64(lit(fam), i), lit(2)) === 0, x).otherwise(-x))

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    replicate(emb, (e, r) =>
      if (r == 0) e
      else e.select((col("vec_id") + r * Shift).as("vec_id"),
        transform(flipDims(col("embedding"), r / famSize),
          x => x + lit((r % famSize) * 1e-3f)).as("embedding"),
        col("label")))
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    replicate(ev, (e, r) =>
      if (r == 0) e
      else e.select((col("event_id") + r * Shift).as("event_id"), col("ts"),
        (col("user_id") + r * Shift).as("user_id"),
        col("event_type"), col("value"), col("props")))
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    replicate(li, (l, r) =>
      if (r == 0) l
      else l.withColumn("l_orderkey", col("l_orderkey") + r * Shift))
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // small dims copy through unchanged (gates join them by key ranges
    // the replication does not disturb)
    for (t <- Seq("orders", "customer", "part", "supplier", "nation", "region")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"""{"scalegen":"$out","replicas":$replicas}""")
    spark.stop()
  }
}
