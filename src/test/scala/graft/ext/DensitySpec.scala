package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DensitySpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).map { case (a, b) => (a, b, 1.0) }
      .toDF("a", "b", "cos")

  test("dbscan roles: chain A-B-C at minPts=2 makes B core, A/C border") {
    val universe = Seq(1L, 2L, 3L, 9L).toDF("id")
    val out = Density.dbscan(universe, "id",
        sym(Seq((1L, 2L), (2L, 3L))), minPts = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(2L) == (("core", 2L)), out.toString)   // isolated core → own id
    assert(out(1L) == (("border", 2L)) && out(3L) == (("border", 2L)),
      out.toString)
    assert(out(9L) == (("noise", -1L)), out.toString)
  }

  test("dbscan clusters: two cliques stay separate, bridge-by-border does not merge") {
    // 4-cliques {1..4} and {10..13}; 5 touches one point of each.
    // At minPts=3, 5 has degree 2 → BORDER, so no core-core edge
    // crosses the bridge and the clusters must not merge (the
    // textbook asymmetry: density-REACHABLE, not just connected).
    val clique = (ids: Seq[Long]) =>
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((5L, 1L), (5L, 10L))
    val universe = (Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 13L)).toDF("id")
    val out = Density.dbscan(universe, "id", sym(edges), minPts = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == (("core", 1L))), out.toString)
    assert(Seq(10L, 11L, 12L, 13L).forall(out(_) == (("core", 10L))),
      out.toString)
    // border 5 attaches to its SMALLEST core neighbor's cluster
    assert(out(5L) == (("border", 1L)), out.toString)
    // a core bridge WOULD merge: same graph at minPts=2 makes 5 core
    // and density-connects the cliques through it (correct DBSCAN)
    val merged = Density.dbscan(universe, "id", sym(edges), minPts = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(merged.values.toSet == Set(1L), merged.toString)
  }

  test("dbscan border does not chain: minPts=3 keeps satellites border") {
    // star: center 0 adjacent to 1,2,3; satellites not adjacent
    val universe = Seq(0L, 1L, 2L, 3L).toDF("id")
    val out = Density.dbscan(universe, "id",
        sym(Seq((0L, 1L), (0L, 2L), (0L, 3L))), minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "core")
    assert(Seq(1L, 2L, 3L).forall(out(_) == "border"), out.toString)
  }

  test("epsNeighborPairs: lsh face finds the planted near-identical pairs") {
    val base = Tables.embeddings(spark, sf0001).filter($"vec_id" < 60)
      .select($"vec_id", $"embedding")
    val u = base.unionByName(base.select(($"vec_id" + 1000).as("vec_id"),
      transform($"embedding", x => x + lit(0.001f)).as("embedding")))
    val brute = Density.epsNeighborPairs(u, "vec_id", "embedding",
        simMin = 0.999, via = "brute")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val lsh = Density.epsNeighborPairs(u, "vec_id", "embedding",
        simMin = 0.999, via = "lsh")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(brute.size >= 120, s"planted pairs missing from brute: ${brute.size}")
    assert(lsh.subsetOf(brute), "lsh must never emit a non-neighbor (exact verify)")
    val recall = (lsh & brute).size.toDouble / brute.size
    info(s"lsh eps-pair recall: $recall (${lsh.size}/${brute.size})")
    assert(recall >= 0.9, s"near-identical pairs collide in every band: $recall")
  }

  test("dbscan on the gate universe: triples are core clusters, singles noise") {
    val base = Tables.embeddings(spark, sf0001).filter($"vec_id" < 150)
      .select($"vec_id", $"embedding")
    val u = base
      .unionByName(base.filter($"vec_id" % 3 =!= 0)
        .select(($"vec_id" + 1000).as("vec_id"),
          transform($"embedding", x => x + lit(0.001f)).as("embedding")))
      .unionByName(base.filter($"vec_id" % 3 === 1)
        .select(($"vec_id" + 2000).as("vec_id"),
          transform($"embedding", x => x + lit(0.002f)).as("embedding")))
    val pairs = Density.epsNeighborPairs(u, "vec_id", "embedding",
      simMin = 0.999, via = "brute")
    val out = Density.dbscan(u, "vec_id", pairs, minPts = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // %3==1 triples: all three replicas core (mutual cos ≈ 1)
    val triples = out.keys.filter(id => id < 150 && id % 3 == 1)
    assert(triples.nonEmpty && triples.forall(id =>
      out(id) == "core" && out(id + 1000) == "core" && out(id + 2000) == "core"),
      "triple cliques must be all-core")
  }
}
