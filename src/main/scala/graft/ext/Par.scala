package graft.ext

import org.apache.spark.sql.DataFrame

/** CPU-density parallelism guard (guide §2: scan parallelism follows
  * input SPLITS, i.e. bytes — it is blind to per-row compute). A
  * corpus that fits one parquet split runs any per-row kernel over it
  * in ONE task (q_c8's FastCDC chunker measured 5.9 s of task time on
  * 2 of 32 cores; q_v4 and q_n16 hit the same wall). Spreading to the
  * session's parallelism is placement-independent for per-row work and
  * a no-op at scale, where the scan already yields ≥ cores splits. */
private[graft] object Par {

  /** Round-robin `df` to the session's default parallelism when the
    * current plan yields fewer partitions; identity otherwise. Only
    * legal before PER-ROW work (map-side kernels) — never to "fix" a
    * keyed operation's layout. */
  def spreadToCores(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
