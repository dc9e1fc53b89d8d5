package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = (1 to 200).map(i => (if (i % 2 == 0) "hot" else s"k$i", i)).toDF("key", "v")
  private lazy val small = Seq(("hot", "H"), ("k1", "A"), ("missing", "Z")).toDF("key", "tag")

  test("saltedJoin inner matches the plain join") {
    val plain = big.join(small, Seq("key"), "inner")
    val salted = Skew.saltedJoin(big, small, "key", parts = 8, joinType = "inner")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin left_outer keeps every big-side row exactly once") {
    val plain = big.join(small, Seq("key"), "left_outer")
    val salted = Skew.saltedJoin(big, small, "key", parts = 8, joinType = "left_outer")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin rejects right/full outer (replication would duplicate unmatched rows)") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "key", parts = 8, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "key", parts = 8, joinType = "full")
    }
  }

  test("heavyHitters surfaces the hot key first") {
    val top = Skew.heavyHitters(big, col("key"), 1).select("key").as[String].collect()
    assert(top.toSeq == Seq("hot"))
  }

  test("flagship self-join under a viral keyword: AQE splits the skewed partition") {
    // one keyword with 800 members dwarfing a 100-keyword tail — the
    // exact skew SURVEY §4 names as the flagship's one physical risk.
    // Thresholds are lowered so the skew machinery engages at test
    // scale; at real scale the defaults play the same role.
    val hot = (1 to 800).map(i => (s"l$i", "viral"))
    val tail = (1 to 100).flatMap(k => Seq((s"t${k}a", s"k$k"), (s"t${k}b", s"k$k")))
    val hk = (hot ++ tail).toDF("src", "dst")
    val bt = ((1 to 800).map(i => (s"l$i", s"c${i % 4}")) ++
      (1 to 100).flatMap(k => Seq((s"t${k}a", "cA"), (s"t${k}b", "cB")))).toDF("src", "dst")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = GraphQueries.interconnections(hk, bt,
        canonicalPairs = true, limit = Int.MaxValue)
      // execute through q itself: with AQE the final (adaptively
      // re-planned) physical plan lives on the executed instance
      val n = q.collect().length.toLong
      // expected pair count, reference-computed on the driver
      def pairs(members: Seq[(String, String)]): Long = {
        val sorted = members.sortBy(_._1)
        (for {
          i <- sorted.indices; j <- (i + 1) until sorted.length
          if sorted(i)._2 != sorted(j)._2
        } yield 1L).sum
      }
      val cats = bt.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val expected =
        pairs(hot.map { case (l, _) => (l, cats(l)) }) + 100L // tail: 1 pair/keyword
      assert(n == expected, s"got $n expected $expected")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed self-join partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
