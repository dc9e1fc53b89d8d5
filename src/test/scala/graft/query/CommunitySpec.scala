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

  test("louvain handles self-contained degenerate input") {
    val single = Seq((1L, 2L)).toDF("src", "dst")
    val mem = Community.louvainLocal(single, mergeRounds = 2, refineRounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(mem.keySet == Set(1L, 2L))
    assert(mem(1L) == mem(2L), "an isolated pair is one community")
  }
}
