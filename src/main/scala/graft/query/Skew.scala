package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the hot-key joins (SURVEY §4: the
  * keyword self-join J3 is the one real physical risk at 100 TB —
  * a few viral keywords can dominate a shuffle partition).
  *
  * First line of defense is AQE's skew-join splitting (on by
  * default); [[saltedJoin]] is the explicit fallback for when the
  * skew is known ahead of time or AQE can't split (e.g. a broadcast
  * can't apply and one key exceeds a single executor's memory).
  */
object Skew {

  /** Salted equi-join of `big` (skewed) against `small` on `key`:
    * big side gets a random salt in [0, parts); small side is
    * replicated `parts` times; the join key becomes (key, salt). The
    * hot key's rows then spread over `parts` partitions at the cost
    * of replicating the small side.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      parts: Int, joinType: String = "inner"): DataFrame = {
    // Right/full outer would emit `parts` duplicates of every unmatched
    // replicated small-side row — reject join types the salt scheme
    // can't honor rather than silently corrupting the result.
    val normalized = joinType.toLowerCase.replaceAll("[_\\s]", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(normalized),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, not '$joinType' " +
        "(the replicated small side would duplicate unmatched rows)")
    val salted = big.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(parts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(parts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N heavy-hitter keys of a column — feed the result into a
    * split-and-union plan (hot keys via broadcast, the long tail via
    * the normal shuffle join). */
  def heavyHitters(df: DataFrame, key: Column, topN: Int): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key")).limit(topN)

  /** Child session configured for Catalyst's runtime bloom-filter
    * semi-join reduction (InjectRuntimeFilter): a selective dimension
    * filter becomes a `bloom_filter_agg` on the build side and a
    * `might_contain` predicate pushed into the big side's SCAN, so
    * non-matching fact rows die before the shuffle instead of after
    * it — at 100 TB that is the difference between shuffling the full
    * fact table and ~the matching fraction. The stock thresholds
    * assume a >10 GB application-side scan; this session drops that
    * floor (and disables auto-broadcast, which would otherwise win at
    * test scale and skip injection), leaving the 100 TB-shaped plan
    * visible and assertable at any SF. Conf is per-session, so the
    * shared session's settings are untouched. */
  def runtimeBloomSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2
  }
}
