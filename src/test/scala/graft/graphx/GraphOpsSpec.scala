package graft.graphx

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // two components: {l1,l2,k1} and {l3,k2}
  private lazy val edges = Seq(("l1", "k1"), ("l2", "k1"), ("l3", "k2")).toDF("src", "dst")
  private lazy val dict = GraphOps.vertexDictionary(Seq(
    "link" -> edges.select($"src").distinct(),
    "kw" -> edges.select($"dst").distinct()))
  private lazy val graph = GraphOps.buildGraph(spark, dict,
    Seq(("has", "link", "kw", edges)))

  test("vertex dictionary has no surrogate collisions") {
    assert(GraphOps.collisionCount(dict) == 0)
  }

  test("label-qualified ids keep same-valued nodes distinct") {
    val d = GraphOps.vertexDictionary(Seq(
      "link" -> Seq("42").toDF("id"),
      "kw" -> Seq("42").toDF("id")))
    assert(d.select("vid").distinct().count() == 2)
  }

  test("degrees by original id") {
    val deg = GraphOps.degreesByOrigId(spark, dict, graph)
      .select(concat_ws(":", $"label", $"orig_id").as("n"), $"degree")
      .as[(String, Long)].collect().toMap
    assert(deg == Map("link:l1" -> 1L, "link:l2" -> 1L, "link:l3" -> 1L,
      "kw:k1" -> 2L, "kw:k2" -> 1L))
  }

  test("connected components labeled by min member id") {
    val cc = GraphOps.connectedComponentsByOrigId(spark, dict, graph)
      .select(concat_ws(":", $"label", $"orig_id").as("n"), $"component")
      .as[(String, String)].collect().toMap
    assert(cc("link:l1") == "kw:k1") // 'kw' < 'link' lexicographically
    assert(cc("link:l2") == "kw:k1")
    assert(cc("kw:k1") == "kw:k1")
    assert(cc("link:l3") == "kw:k2")
    assert(cc("kw:k2") == "kw:k2")
  }

  test("distributed (GraphX) and local (union-find) CC paths agree") {
    val local = GraphOps.connectedComponentsByOrigId(spark, dict, graph)
    val dist = GraphOps.connectedComponentsByOrigId(spark, dict, graph,
      localEdgeThreshold = 0L) // force the Pregel path
    assert(local.exceptAll(dist).count() == 0 && dist.exceptAll(local).count() == 0)
  }

  test("pagerank mass sums to ~N and favors the hub") {
    val pr = GraphOps.pageRankByOrigId(spark, dict, graph)
      .select(concat_ws(":", $"label", $"orig_id").as("n"), $"rank")
      .as[(String, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 5.0) < 0.3)
    assert(pr("kw:k1") > pr("kw:k2")) // two in-links vs one
  }

  test("aggregateMessages flagship variant matches DataFrame J3 on a fixture") {
    val hk = Seq(("l1", "k1"), ("l2", "k1"), ("l3", "k2")).toDF("src", "dst")
    val bt = Seq(("l1", "A"), ("l2", "B"), ("l3", "A")).toDF("src", "dst")
    val am = GraphOps.interconnectionsViaAggregateMessages(spark, hk, bt)
      .as[(String, String, String, String, String)].collect().toSeq
    assert(am == Seq(("l1", "A", "l2", "B", "k1")))
  }

  test("shortest paths: undirected BFS hops from the min-id landmark") {
    // chain 1-10-2-11 plus a disconnected pair 3-12
    val e = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L)).toDF("src", "dst")
    val d = GraphOps.vertexDictionary(Seq(
      "supplier" -> e.select($"src").distinct(),
      "part" -> e.select($"dst").distinct()))
    val g = GraphOps.buildGraph(spark, d, Seq(("has", "supplier", "part", e)))
    val sp = GraphOps.shortestPathsByOrigId(spark, d, g)
      .select(concat_ws(":", $"label", $"orig_id").as("n"), $"dist")
      .as[(String, Int)].collect().toMap
    assert(sp == Map("supplier:1" -> 0, "part:10" -> 1,
      "supplier:2" -> 2, "part:11" -> 3))
  }

  test("heavy-hitter split: hot-key path and tail path agree on real data") {
    val hk = graft.Tables.lineitem(spark, sf0001)
      .select($"l_suppkey".as("src"), $"l_partkey".as("dst")).distinct()
    val bt = graft.Tables.supplier(spark, sf0001)
      .select($"s_suppkey".as("src"), $"s_nationkey".as("dst"))
    // threshold 0 routes EVERY keyword through the DataFrame hot path;
    // the default routes (at this scale) everything through the tail —
    // identical output proves both branches implement the same pairs
    val allHot = GraphOps.interconnectionsViaAggregateMessages(spark, hk, bt,
      hotKeyThreshold = 0)
    val allTail = GraphOps.interconnectionsViaAggregateMessages(spark, hk, bt)
    assert(allHot.count() > 0)
    assert(allHot.exceptAll(allTail).count() == 0 &&
      allTail.exceptAll(allHot).count() == 0)
  }
  test("label propagation: labels stay inside their component, count bracketed") {
    val lpa = GraphOps.labelPropagationByOrigId(spark, dict, graph, maxSteps = 5)
    // every vertex labeled
    assert(lpa.count() == dict.count())
    // each community label is a vid of a vertex in the SAME component
    val cc = GraphOps.connectedComponentsByOrigId(spark, dict, graph)
    val nodeCc = lpa.join(cc, Seq("label", "orig_id"))
    val commCc = lpa.select($"comm_vid").distinct()
      .join(dict, $"comm_vid" === dict("vid")).select($"comm_vid", $"label", $"orig_id")
      .join(cc.withColumnRenamed("component", "comm_component"), Seq("label", "orig_id"))
      .select($"comm_vid", $"comm_component")
    val crossers = nodeCc.join(commCc, Seq("comm_vid"))
      .filter($"component" =!= $"comm_component").count()
    assert(crossers == 0)
    val nComm = lpa.select("comm_vid").distinct().count()
    assert(nComm >= 2 && nComm <= 5, s"nComm=$nComm") // 2 components, 5 vertices
  }
  test("strongly connected components: 2-cycle merges, acyclic stays singleton") {
    // l1 <-> k1 is a 2-cycle; l2 -> k2 is acyclic
    val fwd = Seq(("l1", "k1"), ("l2", "k2")).toDF("src", "dst")
    val back = Seq(("k1", "l1")).toDF("src", "dst")
    val d2 = GraphOps.vertexDictionary(Seq(
      "link" -> fwd.select($"src").distinct(),
      "kw" -> fwd.select($"dst").distinct()))
    val g2 = GraphOps.buildGraph(spark, d2, Seq(
      ("has", "link", "kw", fwd), ("rev", "kw", "link", back)))
    val scc = GraphOps.stronglyConnectedByOrigId(spark, d2, g2)
      .select(concat_ws(":", $"label", $"orig_id").as("n"), $"scc")
      .as[(String, String)].collect().toMap
    assert(scc("link:l1") == "kw:k1" && scc("kw:k1") == "kw:k1") // merged, min label
    assert(scc("link:l2") == "link:l2" && scc("kw:k2") == "kw:k2") // singletons
  }
}
