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
}
