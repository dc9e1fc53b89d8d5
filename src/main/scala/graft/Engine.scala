package graft

import org.apache.spark.sql.SparkSession

/** Recommended session factory for the engine: AQE on (skew-join
  * handling for the keyword self-join), shuffle partitions sized for
  * the deployment, UTC, nanos-parquet tolerance, and the engine's SQL
  * functions registered. `local[32]` defaults mirror the test rig;
  * on a cluster pass the master/partitions the deployment needs.
  */
object Engine {
  def builder(
      master: String = "local[32]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Let AQE size a CACHED plan's output partitioning too (the flag
      // is false by default only to keep cached output partitioning
      // stable for downstream exchange reuse, which nothing here relies
      // on). Without it every DerivedCache frame pins the static
      // shuffle-partition count forever and every scan of it — and
      // every stage downstream of it — runs at that width regardless of
      // data size; measured at sf0.1 this was 300+ near-empty cache-scan
      // tasks and 25-45 s of pure per-task overhead per dedup/CC gate
      // (q_d7 task-time 34 s → 0.4 s with the flag). Scale-adaptive by
      // construction: partition count follows AQE's byte advisory at
      // every scale.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // standard GraphX deployment setting; SQL/Tungsten unaffected
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .withExtensions(new GraftExtensions)

  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
