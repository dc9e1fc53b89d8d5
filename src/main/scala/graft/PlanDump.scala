package graft

import org.apache.spark.sql.SparkSession

/** Exemplar-plan dumper for PLANS.md: for each gate named in
  * SPARK_GRAFT_ONLY (comma-separated), runs the query once (so AQE
  * final plans and runtime statistics materialize) and prints its
  * formatted physical plan under a `## <name>` header — the exact
  * shape PLANS.md curates. Reads SPARK_GRAFT_SF_DIR / _CPUS like
  * Bench; prints to stdout, redirect as needed. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "SPARK_GRAFT_ONLY must name at least one gate")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // match Bench's cached-plan AQE partitioning so dumped plans
      // show the shape the bench actually runs (see Engine.scala)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count() // execute so AQE finalizes and stages carry statistics
      println(s"## $n\n")
      println("```")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      println("```")
    }
    spark.stop()
  }
}
