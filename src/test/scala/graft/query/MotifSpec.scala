package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MotifSpec extends SparkSpec {
  import spark.implicits._

  private lazy val hk = Seq(("l1", "k1"), ("l2", "k1"), ("l3", "k2"))
    .toDF("src", "dst")
  private lazy val bt = Seq(("l1", "A"), ("l2", "B"), ("l3", "A"))
    .toDF("src", "dst")

  test("parse accepts the grammar, rejects junk and self-loops") {
    val pats = Motif.parse("(a)-[:HAS_KEYWORD]->(k); (b)-[ :HAS_KEYWORD ]->(k)")
    assert(pats == Seq(
      Motif.Pattern("a", "HAS_KEYWORD", "k"),
      Motif.Pattern("b", "HAS_KEYWORD", "k")))
    intercept[IllegalArgumentException](Motif.parse("(a)-[:X]-(b)"))
    intercept[IllegalArgumentException](Motif.parse("(a)-[:X]->(a)"))
    intercept[IllegalArgumentException](
      Motif.find(Map("X" -> hk), "(a)-[:NOPE]->(b)"))
  }

  test("two-pattern motif equi-joins on the shared variable") {
    val out = Motif.find(Map("HAS_KEYWORD" -> hk),
        "(a)-[:HAS_KEYWORD]->(k); (b)-[:HAS_KEYWORD]->(k)")
      .filter($"a" < $"b")
      .select("a", "b", "k").as[(String, String, String)].collect().toSet
    assert(out == Set(("l1", "l2", "k1")))
  }

  test("anonymous vertices: existence form binds hidden vars, drops them") {
    val out = Motif.find(Map("HAS_KEYWORD" -> hk), "(a)-[:HAS_KEYWORD]->()")
    assert(out.columns.toSeq == Seq("a"))
    assert(out.count() == 3) // one row per matched edge (bag semantics)
    // two anonymous endpoints stay distinct variables (no accidental join)
    val both = Motif.find(Map("HAS_KEYWORD" -> hk), "()-[:HAS_KEYWORD]->()")
    assert(both.columns.isEmpty && both.count() == 3)
  }

  test("disconnected patterns cross-join (Cypher comma semantics)") {
    val out = Motif.find(Map("HK" -> hk, "BT" -> bt),
      "(a)-[:HK]->(k); (c)-[:BT]->(cat)")
    assert(out.count() == hk.count() * bt.count())
    assert(out.columns.sorted.toSeq == Seq("a", "c", "cat", "k"))
  }

  test("join order: disconnected TEXTUAL order still avoids cross joins " +
      "when a connecting pattern exists") {
    val lt = Seq(("l1", "l3")).toDF("src", "dst")
    // textually, elements 1 and 2 share no variable — the naive
    // left-to-right fold cross-joined them; the greedy connected
    // ordering must route through element 3 instead
    val out = Motif.find(Map("HK" -> hk, "BT" -> bt, "LT" -> lt),
      "(a)-[:HK]->(k); (c)-[:BT]->(cat); (a)-[:LT]->(c)")
    val plan = { out.collect(); out.queryExecution.executedPlan.toString }
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cross join despite connected motif:\n$plan")
    val rows = out.select("a", "k", "c", "cat")
      .as[(String, String, String, String)].collect().toSet
    assert(rows == Set(("l1", "k1", "l3", "A")))
  }

  test("flagship J3 as a motif string matches the hand-written join DAG") {
    val motif = Motif.find(Map("HAS_KEYWORD" -> hk, "BELONGS_TO" -> bt),
        "(url1)-[:HAS_KEYWORD]->(kw); (url2)-[:HAS_KEYWORD]->(kw); " +
          "(url1)-[:BELONGS_TO]->(c1); (url2)-[:BELONGS_TO]->(c2)")
      .filter($"url1" < $"url2" && $"c1" =!= $"c2")
      .select($"url1", $"c1".as("category1"), $"url2", $"c2".as("category2"),
        $"kw".as("shared_keyword"))
    val direct = GraphQueries.interconnections(hk, bt,
      canonicalPairs = true, limit = 1000)
    assert(motif.exceptAll(direct).count() == 0 &&
      direct.exceptAll(motif).count() == 0)
  }

  test("variable-length element: distinct 1..k-hop pairs, cycle safe") {
    assert(Motif.parse("(a)-[:R*..3]->(b)") ==
      Seq(Motif.Pattern("a", "R", "b", Some(3))))
    intercept[IllegalArgumentException](Motif.parse("(a)-[:R*..0]->(b)"))
    // chain with a back-edge making a 3-cycle: a→b→c→a, plus c→d
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")).toDF("src", "dst")
    val two = Motif.find(Map("R" -> e), "(x)-[:R*..2]->(y)")
      .as[(String, String)].collect().toSet
    assert(two == Set(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("a", "c"), ("b", "a"), ("b", "d"), ("c", "b")))
    // *..3 closes the cycle: every node reaches itself — and the pair
    // set is DISTINCT pairs, not paths
    val three = Motif.find(Map("R" -> e), "(x)-[:R*..3]->(y)")
      .as[(String, String)].collect().toSet
    assert(three.contains(("a", "a")) && three.contains(("a", "d")))
    assert(three.size == 12)
    // composes with a 1-hop element on a shared variable
    val combo = Motif.find(Map("R" -> e), "(x)-[:R*..2]->(y); (y)-[:R]->(z)")
      .filter($"x" === "a").select("y", "z")
      .as[(String, String)].collect().toSet
    assert(combo == Set(("b", "c"), ("c", "a"), ("c", "d")))
  }
}
