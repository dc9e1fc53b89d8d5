package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DebugKmvSpec extends SparkSpec {

  test("debug kmv intersect internals") {
    val a = spark.range(1, 1001).toDF("k")
      .select(lit("A").as("grp"), col("k").as("__k"))
    val b = spark.range(501, 1501).toDF("k")
      .select(lit("B").as("grp"), col("k").as("__k"))
    val sk = Sketches.kmvSketch(a.unionByName(b), "grp", "__k", 256)
    sk.groupBy("grp").agg(count(lit(1)), min("h"), max("h")).show()
    val merged = Sketches.kmvMerge(sk, 256)
    merged.agg(count(lit(1)), min("h"), max("h")).show()
    val skA = sk.filter(col("grp") === "A").select(col("h"))
    val skB = sk.filter(col("grp") === "B").select(col("h"))
    println("A∩B sketch hashes: " + skA.join(skB, Seq("h")).count())
    println("merged∩A: " + merged.select(col("h")).join(skA, Seq("h")).count())
    println("merged∩B: " + merged.select(col("h")).join(skB, Seq("h")).count())
    // how many of the 500 common KEYS have hashes in each bottom set?
    val common = spark.range(501, 1001).toDF("k")
      .select(Sketches.kmvHash(col("k")).as("h"))
    println("common keys in A's sketch: " + common.join(skA, Seq("h")).count())
    println("common keys in B's sketch: " + common.join(skB, Seq("h")).count())
  }
}
