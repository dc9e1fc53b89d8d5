package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints `explain("formatted")` for the named
  * gates (the PLANS.md source of truth).
  *
  * Usage: SPARK_GRAFT_ONLY=q_a,q_b runMain graft.Explain [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "set SPARK_GRAFT_ONLY=q_a,q_b")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"## $n")
      println()
      println("```")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      println("```")
    }
    spark.stop()
  }
}
