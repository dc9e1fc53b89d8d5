package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Data-quality expectations (Profiling) + CDC snapshot diff. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkRowRules: one pass, null counts as violation") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (5L, "b"), (null, "c"))
      .toDF("v", "s")
    val r = Profiling.checkRowRules(df, Seq(
        "v_small" -> (col("v") <= 3), // 5 violates; null violates
        "s_nonempty" -> (length(col("s")) > 0)))
      .as[(String, Long, Long, Boolean)].collect().map(x => x._1 -> x).toMap
    assert(r("v_small") == (("v_small", 3L, 2L, false)))
    assert(r("s_nonempty") == (("s_nonempty", 3L, 0L, true)))
  }

  test("uniquenessViolations counts rows beyond the first per key") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "s")
    val r = Profiling.uniquenessViolations(df, Seq("k"), "k_unique")
      .as[(String, Long, Long, Boolean)].head()
    assert(r == (("k_unique", 3L, 1L, false)))
  }

  test("orphanCount: child keys missing from parent") {
    val child = Seq(1, 2, 9).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Profiling.orphanCount(child, "fk", parent, "pk", "fk_ok")
      .as[(String, Long, Long, Boolean)].head()
    assert(r == (("fk_ok", 3L, 1L, false)))
  }

  test("snapshotDiff classifies inserts, deletes, updates; drops unchanged") {
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "t", "l")
    val neu = Seq((2L, "b", "y"), (3L, "C2", "z"), (4L, "d", "w"))
      .toDF("id", "t", "l")
    val d = ChangeCapture.snapshotDiff(old, neu, Seq("id"), Seq("t", "l"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "D", 3L -> "U", 4L -> "I"), d.toString)
  }

  test("snapshotDiff is null-safe on compare columns") {
    val old = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("id", "t")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "t")
    val d = ChangeCapture.snapshotDiff(old, neu, Seq("id"), Seq("t"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "U"), d.toString) // 2: null == null ⇒ unchanged
  }
}
