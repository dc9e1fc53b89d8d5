package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionKeys: string plus every single-char deletion; empty safe") {
    val keys = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionKeys($"s").as("k")).as[Seq[String]].head()
    assert(keys.toSet == Set("abc", "bc", "ac", "ab"))
    val empty = Seq("").toDF("s")
      .select(FuzzyJoin.deletionKeys($"s").as("k")).as[Seq[String]].head()
    assert(empty == Seq(""))
  }

  test("selfJoinWithin1 finds substitution, insertion, and exact-dup pairs; rejects distance 2") {
    val df = Seq(
      (1L, "kitten"), (2L, "mitten"),   // substitution -> pair
      (3L, "kitte"),                    // deletion of 1 -> pairs with kitten
      (4L, "kitten"),                   // exact dup of 1
      (5L, "sitten"),                   // substitution of kitten; vs mitten ed=2
      (6L, "bitter")                    // ed 2 from kitten -> no pair
    ).toDF("id", "name")
    val pairs = FuzzyJoin.selfJoinWithin1(df, "id", "name")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 4L), (2L, 5L), (3L, 4L), (4L, 5L)))
  }

  test("blocking is exact-recall vs brute-force levenshtein on real names") {
    val c = Tables.customer(spark, sf0001)
      .select($"c_custkey".as("id"), $"c_name".as("s"))
    val blocked = FuzzyJoin.selfJoinWithin1(c, "id", "s")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val brute = c.as("a").join(c.as("b"),
        $"a.id" < $"b.id" && levenshtein($"a.s", $"b.s") <= 1)
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    assert(blocked == brute, s"blocked ${blocked.size} vs brute ${brute.size}")
    assert(brute.nonEmpty) // the TPC-H name grid guarantees ed-1 pairs
  }
}
