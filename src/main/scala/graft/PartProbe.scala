package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_suppkey").as("src"), col("l_partkey").as("dst")).distinct()
    val cp = df.localCheckpoint(true)
    println("distinct+checkpoint partitions: " + cp.rdd.getNumPartitions)
    val agg = cp.groupBy("src").count().localCheckpoint(true)
    println("agg+checkpoint partitions: " + agg.rdd.getNumPartitions)
    val j = cp.join(agg, Seq("src")).localCheckpoint(true)
    println("join+checkpoint partitions: " + j.rdd.getNumPartitions)
    spark.stop()
  }
}
