package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CommunitySpec extends SparkSpec {
  import spark.implicits._

  /** Two 4-cliques joined by one bridge edge — the textbook two-
    * community graph. */
  private def twoCliques = {
    val c1 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val c2 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    (c1 ++ c2 :+ ((3L, 10L))).toDF("src", "dst")
  }

  private def gateGraph = {
    val hk = Tables.lineitem(spark, sf0001)
      .filter($"l_orderkey" % 50 === 0)
      .select($"l_suppkey".as("sk"), $"l_partkey".as("pk")).distinct()
    hk.as("a").join(hk.as("b"),
        $"a.pk" === $"b.pk" && $"a.sk" < $"b.sk")
      .select($"a.sk".as("src"), $"b.sk".as("dst")).distinct()
  }

  private def modularityOf(edges: org.apache.spark.sql.DataFrame,
      mem: org.apache.spark.sql.DataFrame): Double =
    GraphQueries.modularity(edges, mem)
      .agg(sum($"q_term")).as[Double].head()

  test("louvain separates two cliques joined by a bridge") {
    val mem = Community.louvainLocal(twoCliques)
      .as[(Long, Long)].collect().toMap
    assert(mem.size == 8)
    val left = (0L to 3L).map(mem)
    val right = (10L to 13L).map(mem)
    assert(left.distinct.size == 1, s"clique 1 split: $mem")
    assert(right.distinct.size == 1, s"clique 2 split: $mem")
    assert(left.head != right.head, s"cliques merged: $mem")
  }

  test("louvain is deterministic across runs and layouts") {
    val a = Community.louvainLocal(gateGraph)
      .as[(Long, Long)].collect().toSet
    val b = Community.louvainLocal(gateGraph.repartition(7))
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("louvain modularity beats the q_g35-style label-prop partition") {
    val e = gateGraph.cache()
    val mem = Community.louvainLocal(e)
      .select($"node", $"community")
    val qLouvain = modularityOf(e, mem)
    // the q_g35 partition: nation seeds on every 5th supplier + one
    // propagation round; unlabeled nodes fall back to singletons
    val e2 = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
    val nodes = e2.select($"src".as("node")).distinct()
    val seeds = Tables.supplier(spark, sf0001)
      .select($"s_suppkey".as("node"), $"s_nationkey".cast("long").as("label"))
      .filter($"node" % 5 === 0)
      .join(nodes, Seq("node"))
    val lpa = GraphQueries.labelPropRound(e2, seeds)
      .select($"node", (-$"label").as("community"))
    val lpaFull = nodes.join(lpa, Seq("node"), "left")
      .select($"node", coalesce($"community", $"node").as("community"))
    val qLpa = modularityOf(e, lpaFull)
    info(s"modularity: louvain=$qLouvain lpa=$qLpa")
    assert(qLouvain >= qLpa,
      s"louvain $qLouvain must not lose to label-prop $qLpa")
    assert(qLouvain > 0.0)
    e.unpersist()
  }

  test("merge phase is monotone: more merge rounds never lower modularity") {
    val e = gateGraph.cache()
    val n = e.select($"src".as("n")).unionByName(e.select($"dst".as("n")))
      .distinct().count()
    val qs = Seq(1, 3, 6).map { r =>
      val mem = Community.louvainLocal(e, mergeRounds = r, refineRounds = 0)
      assert(mem.count() == n, "every node must be labeled exactly once")
      assert(mem.groupBy($"node").count().filter($"count" > 1).count() == 0)
      modularityOf(e, mem)
    }
    info(s"modularity by merge rounds 1/3/6: $qs")
    assert(qs == qs.sorted, s"merge rounds must be monotone in Q: $qs")
    e.unpersist()
  }

  test("weighted louvain: a heavy bridge overrides the clique split") {
    // two triangles, weight-1 intra edges, one bridge edge
    val tri = Seq((0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 1L),
      (10L, 11L, 1L), (11L, 12L, 1L), (10L, 12L, 1L))
    val light = (tri :+ ((2L, 10L, 1L))).toDF("src", "dst", "w")
    val heavy = (tri :+ ((2L, 10L, 50L))).toDF("src", "dst", "w")
    val mLight = Community.louvainWeighted(light, "w")
      .as[(Long, Long)].collect().toMap
    val mHeavy = Community.louvainWeighted(heavy, "w")
      .as[(Long, Long)].collect().toMap
    assert(mLight(0L) != mLight(12L),
      s"weight-1 bridge must not merge the triangles: $mLight")
    assert(mHeavy(2L) == mHeavy(10L),
      s"a weight-50 bridge dominates the graph and must bind its endpoints: $mHeavy")
  }

  test("leidenRefine splits a planted disconnected community; Q never drops") {
    // two separate triangles + a far-away edge, membership FORCED to
    // lump both triangles into one community (the Louvain defect
    // Leiden fixes: label-together, graph-apart)
    val tri1 = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val tri2 = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (tri1 ++ tri2 :+ ((20L, 21L))).toDF("src", "dst")
    val planted = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L),
      (10L, 0L), (11L, 0L), (12L, 0L),   // disconnected from {0,1,2}
      (20L, 20L), (21L, 20L)).toDF("node", "community")
    val refined = Community.leidenRefine(edges, planted)
      .as[(Long, Long)].collect().toMap
    assert((0L to 2L).map(refined).distinct == Seq(0L), refined.toString)
    assert((10L to 12L).map(refined).distinct == Seq(10L), refined.toString)
    assert(refined(20L) == refined(21L))
    // modularity must not decrease (components share zero edges, so
    // splitting strictly adds 2·d_a·d_b/(2m)² per separated pair)
    val qBefore = modularityOf(edges, planted)
    val qAfter = modularityOf(edges,
      Community.leidenRefine(edges, planted))
    assert(qAfter >= qBefore, s"Q dropped: $qBefore -> $qAfter")
    assert(qAfter > qBefore, "planted split must strictly raise Q here")
  }

  test("leidenRefine is identity on an already-connected membership; gate face sane") {
    val e = gateGraph.localCheckpoint(true)
    val mem = Community.louvainLocal(e, mergeRounds = 6, refineRounds = 2)
      .localCheckpoint(true)
    val refined = Community.leidenRefine(e, mem).localCheckpoint(true)
    // refinement can relabel (component min-id) but never lowers Q
    val qBefore = modularityOf(e, mem)
    val qAfter = modularityOf(e, refined)
    assert(qAfter >= qBefore, s"Q dropped on the gate graph: $qBefore -> $qAfter")
    // same node universe, and every refined community is a subset of
    // one original community (refinement only ever SPLITS)
    assert(refined.count() == mem.count())
    val crossed = refined.select($"node", $"community".as("rc"))
      .join(mem.select($"node", $"community".as("oc")), Seq("node"))
      .groupBy($"rc").agg(countDistinct($"oc").as("k"))
      .filter($"k" > 1).count()
    assert(crossed == 0L, "a refined community crossed an original boundary")
  }

  test("louvain handles self-contained degenerate input") {
    val single = Seq((1L, 2L)).toDF("src", "dst")
    val mem = Community.louvainLocal(single, mergeRounds = 2, refineRounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(mem.keySet == Set(1L, 2L))
    assert(mem(1L) == mem(2L), "an isolated pair is one community")
  }
}
