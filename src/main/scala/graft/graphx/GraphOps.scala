package graft.graphx

import org.apache.spark.graphx.{Edge => GxEdge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX projection of the property graph (BASELINE.json
  * spark_approach: "GraphX for analytics").
  *
  * GraphX requires Long vertex ids; node PKs here are strings (urls /
  * names) or longs. The dictionary keeps the original id alongside a
  * stable 64-bit surrogate (xxhash64 of the label-qualified id —
  * label-qualified so a Link "42" and a Keyword "42" don't collide),
  * with a duplicate-surrogate check mirroring the reference's
  * duplicate-node-id warning (dockerapp/app/main.py:475-478).
  */
object GraphOps {

  /** Stable vertex surrogate: xxhash64 over "label:id". */
  def vertexId(label: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column) =
    xxhash64(concat_ws(":", label, id))

  /** Build the vertex dictionary (vid, label, orig_id) from per-label
    * node DataFrames of shape (id). Fails fast on hash collisions —
    * at 64 bits a collision needs ~5·10⁹ nodes (birthday bound), but
    * the check is one tiny agg so it stays on. */
  def vertexDictionary(nodes: Seq[(String, DataFrame)]): DataFrame = {
    val dict = nodes.map { case (label, df) =>
      val idCol = df.columns.head
      df.select(
        vertexId(lit(label), col(idCol)).as("vid"),
        lit(label).as("label"),
        col(idCol).cast("string").as("orig_id"))
    }.reduce(_ unionByName _)
    dict
  }

  /** Assert no two distinct nodes share a surrogate (A6 analog). */
  def collisionCount(dict: DataFrame): Long =
    dict.groupBy("vid").count().filter(col("count") > 1).count()

  /** Property graph → GraphX graph. Edges of shape (src, dst) with a
    * (srcLabel, dstLabel) per rel type.
    *
    * Partition count is sized to the edge count (`numPartitions`,
    * 0 = auto ≈ one partition per 500k edges): iterative GraphX
    * algorithms run a job per superstep, so a small graph spread over
    * the session's default 32 shuffle partitions pays ~32× per-stage
    * overhead for nothing. At 100 TB the same auto-sizing yields
    * thousands of partitions — the knob scales both ways. */
  def buildGraph(spark: SparkSession, dict: DataFrame,
      edges: Seq[(String, String, String, DataFrame)],
      numPartitions: Int = 0): Graph[String, String] = {
    val edgeRdd: RDD[GxEdge[String]] = edges.map { case (relType, srcLabel, dstLabel, df) =>
      df.select(
        vertexId(lit(srcLabel), col("src")).as("s"),
        vertexId(lit(dstLabel), col("dst")).as("d"))
        .rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), relType))
    }.reduce(_ union _)
    // No defaultParallelism cap: at 100 TB edge-count/500k legitimately
    // exceeds the session's core count, and supersteps want partitions
    // sized to data, not to the driver's local thread pool.
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(1,
        (edgeRdd.countApprox(1000L, 0.9).getFinalValue().mean / 500000.0).ceil.toInt)
    // coalesce can only shrink — growing the partition count (the
    // scale-up path) needs a real repartition shuffle.
    def sized[T: scala.reflect.ClassTag](rdd: RDD[T]): RDD[T] =
      if (parts < rdd.getNumPartitions) rdd.coalesce(parts)
      else if (parts > rdd.getNumPartitions) rdd.repartition(parts)
      else rdd
    val vertices: RDD[(VertexId, String)] = sized(dict
      .select(col("vid"), concat_ws(":", col("label"), col("orig_id")))
      .rdd.map(r => (r.getLong(0), r.getString(1))))
    Graph(vertices, sized(edgeRdd))
  }

  /** Per-node degree joined back to original string ids — the GraphX
    * path for the orphan/degree analysis (reference G3). Nodes with no
    * edges get degree 0 (GraphX omits them from `degrees`). */
  def degreesByOrigId(spark: SparkSession, dict: DataFrame,
      graph: Graph[String, String]): DataFrame = {
    import spark.implicits._
    val deg = graph.degrees.toDF("vid", "degree")
    dict.join(deg, Seq("vid"), "left")
      .select(col("label"), col("orig_id"),
        coalesce(col("degree"), lit(0)).cast("long").as("degree"))
  }

  /** Connected components, labeled by the *minimum original id* in
    * each component (GraphX's internal min-VertexId label is hash
    * order — meaningless outside; re-labeling by min orig id makes the
    * result stable and oracle-checkable). Returns (label, orig_id,
    * component) rows. */
  def connectedComponentsByOrigId(spark: SparkSession, dict: DataFrame,
      graph: Graph[String, String],
      localEdgeThreshold: Long = 5000000L): DataFrame = {
    import spark.implicits._
    // Size-gated physical strategy, same spirit as Catalyst's broadcast
    // threshold: below `localEdgeThreshold` edges (~80 MB collected),
    // a driver-side union-find beats tens of Pregel supersteps whose
    // per-superstep job overhead dwarfs the work. Above it, the
    // distributed GraphX fixpoint runs — that's the 100 TB path.
    val edgeCount = graph.edges.count()
    val cc =
      if (edgeCount <= localEdgeThreshold) {
        val edges = graph.edges.map(e => (e.srcId, e.dstId)).collect()
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // min root wins → component label = min vid, as GraphX
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
            parent.getOrElseUpdate(math.min(ra, rb), math.min(ra, rb))
          }
        }
        val touched = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
        spark.createDataset(touched.toSeq.map(v => (v, find(v)))).toDF("vid", "cc_vid")
      } else {
        val ccGraph = graph.connectedComponents()
        val v = ccGraph.vertices.toDF("vid", "cc_vid")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        v.count() // O(V) labels; free the Pregel iteration graphs
        ccGraph.unpersistVertices(blocking = false)
        ccGraph.edges.unpersist(blocking = false)
        v
      }
    val labeled = dict.join(cc, Seq("vid"), "left")
      .select(col("label"), col("orig_id"),
        coalesce(col("cc_vid"), col("vid")).as("cc_vid"))
    val rep = labeled.groupBy("cc_vid")
      .agg(min(struct(col("label"), col("orig_id"))).as("rep"))
      .select(col("cc_vid"), concat_ws(":", col("rep.label"), col("rep.orig_id")).as("component"))
    labeled.join(rep, Seq("cc_vid")).select(col("label"), col("orig_id"), col("component"))
  }

  /** PageRank over the graph, back on original ids. Fixed-iteration
    * (`staticPageRank`) so the result is deterministic and
    * oracle-checkable: DuckDB replays the same recurrence
    * (rank₀ = 1; rankᵢ₊₁(v) = 0.15 + 0.85·Σ rankᵢ(u)/outDeg(u)) for
    * the same number of iterations and the values hash-match at
    * round(,4).
    *
    * The iteration graphs GraphX caches internally are released once
    * the O(V) rank vector is materialized — without this, every
    * PageRank call leaks a cached graph into the block manager for
    * the rest of the session. */
  def pageRankByOrigId(spark: SparkSession, dict: DataFrame,
      graph: Graph[String, String], numIter: Int = 10): DataFrame = {
    import spark.implicits._
    val prGraph = graph.staticPageRank(numIter)
    val pr = prGraph.vertices.toDF("vid", "rank")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pr.count() // materialize the O(V) ranks so the iteration state can go
    prGraph.unpersistVertices(blocking = false)
    prGraph.edges.unpersist(blocking = false)
    dict.join(pr, Seq("vid"))
      .select(col("label"), col("orig_id"), col("rank"))
  }

  /** Personalized PageRank from a single source vertex — "important
    * relative to THIS page", the reference-shaped ranking for a
    * focused crawl frontier. Fixed-iteration
    * (`staticPersonalizedPageRank`) like [[pageRankByOrigId]], so the
    * recurrence is oracle-replayable: teleport mass goes only to the
    * source (rankᵢ₊₁(v) = 0.15·δ(v=src) + 0.85·Σ rankᵢ(u)/outDeg(u)),
    * and GraphX normalizes the final ranks to sum 1. Same cache
    * hygiene: iteration graphs are released once the rank vector
    * materializes. */
  def personalizedPageRankByOrigId(spark: SparkSession, dict: DataFrame,
      graph: Graph[String, String], srcVid: Long, numIter: Int = 10): DataFrame = {
    import spark.implicits._
    val prGraph = graph.staticPersonalizedPageRank(srcVid, numIter)
    val pr = prGraph.vertices.toDF("vid", "rank")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pr.count()
    prGraph.unpersistVertices(blocking = false)
    prGraph.edges.unpersist(blocking = false)
    dict.join(pr, Seq("vid"))
      .select(col("label"), col("orig_id"), col("rank"))
  }

  /** Unweighted shortest-path distances (BFS hops) over the
    * UNDIRECTED view of the graph, from the `landmarkLabel` node with
    * the smallest numeric original id (deterministic, so a recursive-
    * CTE oracle can replay it). GraphX `ShortestPaths` propagates
    * dst→src along edge direction, so the edge set is symmetrized
    * first. Unreachable nodes are omitted (empty landmark map). The
    * landmark vid is a single driver-held long (tiny by construction,
    * like the IVF centroids). */
  def shortestPathsByOrigId(spark: SparkSession, dict: DataFrame,
      graph: Graph[String, String], landmarkLabel: String = "supplier"): DataFrame = {
    import spark.implicits._
    val lmVid = dict.filter(col("label") === landmarkLabel)
      .select(col("vid"), col("orig_id").cast("long").as("oid"))
      .orderBy(col("oid")).limit(1)
      .select(col("vid")).as[Long].collect()(0)
    val undirected = Graph(graph.vertices,
      graph.edges.union(graph.edges.map(e => GxEdge(e.dstId, e.srcId, e.attr))))
    val sp = org.apache.spark.graphx.lib.ShortestPaths.run(undirected, Seq(lmVid))
    val dists = sp.vertices
      .flatMap { case (vid, m) => m.get(lmVid).map(dd => (vid, dd)) }
      .toDF("vid", "dist")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dists.count() // materialize the O(V) result so the Pregel state can go
    sp.unpersistVertices(blocking = false)
    sp.edges.unpersist(blocking = false)
    dict.join(dists, Seq("vid"))
      .select(col("label"), col("orig_id"), col("dist"))
  }

  /** The flagship interconnection query (J3) on GraphX primitives:
    * gather the (link, category) member set per keyword vertex, then
    * per-keyword pair expansion — the "collect-then-expand"
    * alternative to the DataFrame self-join. Kept for
    * parity/benchmark comparison.
    *
    * Bounded by a heavy-hitter split so a viral keyword can never
    * materialize an unbounded member array (the skew OOM the
    * DataFrame plan avoids via AQE): keywords with more than
    * `hotKeyThreshold` members are routed through a DataFrame
    * self-join (shuffled on keyword, AQE skew-split applies); only
    * the long tail takes the gather-to-vertex path, so its per-key
    * arrays are ≤ `hotKeyThreshold` entries by construction. Both
    * branches produce identical pair semantics (url1 < url2 by string
    * order, categories differ), so the union is exactly the unsplit
    * result. */
  def interconnectionsViaAggregateMessages(spark: SparkSession,
      hasKeyword: DataFrame, belongsTo: DataFrame,
      hotKeyThreshold: Int = 1024): DataFrame = {
    import spark.implicits._
    val triples = hasKeyword.as("hk")
      .join(belongsTo.as("bt"), col("hk.src") === col("bt.src"))
      .select(col("hk.dst").cast("string").as("kw"),
        col("hk.src").cast("string").as("url"),
        col("bt.dst").cast("string").as("cat"))
    // member count per keyword: one cheap partial-agg shuffle; the hot
    // set is tiny by construction (≤ |triples| / hotKeyThreshold keys)
    val hot = triples.groupBy("kw").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotKeyThreshold).select("kw")
    val tailRdd = triples.join(broadcast(hot), Seq("kw"), "left_anti")
      .as[(String, String, String)].rdd
      .map { case (kw, url, cat) => (kw, (url, cat)) }
    // the default partitioner inherits the parent's count — AQE sizes
    // that by input BYTES, but the pair loop below is quadratic CPU per
    // key (measured: the whole stage on 5 of 32 cores). Never go below
    // the session's parallelism; at scale the parent already exceeds it
    val tail = tailRdd
      .groupByKey(math.max(tailRdd.getNumPartitions,
        spark.sparkContext.defaultParallelism))
      .flatMap { case (kw, members) =>
        val arr = members.toArray.sortBy(_._1) // ≤ hotKeyThreshold entries
        for {
          i <- arr.indices.iterator
          j <- (i + 1) until arr.length
          if arr(i)._2 != arr(j)._2
        } yield (arr(i)._1, arr(i)._2, arr(j)._1, arr(j)._2, kw)
      }
      .toDF("url1", "category1", "url2", "category2", "shared_keyword")
    val hotMembers = triples.join(broadcast(hot), Seq("kw"), "left_semi")
    val hotPairs = hotMembers.as("x").join(hotMembers.as("y"),
        col("x.kw") === col("y.kw") && col("x.url") < col("y.url") &&
        col("x.cat") =!= col("y.cat"))
      .select(col("x.url").as("url1"), col("x.cat").as("category1"),
        col("y.url").as("url2"), col("y.cat").as("category2"),
        col("x.kw").as("shared_keyword"))
    tail.unionByName(hotPairs)
  }

  /** Label-propagation community detection (LPA) on original ids.
    * Communities are labeled by the vid that won the propagation;
    * exact membership depends on tie-break order inside GraphX's
    * map-merge (and LPA famously oscillates on bipartite graphs), so
    * the oracle-checkable surface is the set of INVARIANTS every LPA
    * run satisfies — labels only travel along edges, so a vertex's
    * community label always belongs to its own connected component,
    * and the community count is bracketed by [#components,
    * #vertices]. The q_gx_lpa gate checks exactly those; membership
    * stability is spec territory.
    *
    * Same Pregel-state hygiene as PageRank: materialize the O(V)
    * label vector, then release the iteration graphs. */
  def labelPropagationByOrigId(spark: SparkSession, dict: DataFrame,
      graph: Graph[String, String], maxSteps: Int = 5): DataFrame = {
    val lp = org.apache.spark.graphx.lib.LabelPropagation.run(graph, maxSteps)
    import spark.implicits._
    val labels = lp.vertices.toDF("vid", "comm_vid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    labels.count()
    lp.unpersistVertices(blocking = false)
    lp.edges.unpersist(blocking = false)
    dict.join(labels, Seq("vid"))
      .select(col("label"), col("orig_id"), col("vid"), col("comm_vid"))
  }

  /** Strongly connected components on the DIRECTED graph, relabeled
    * by each SCC's minimum "label:orig_id" member (same stable-label
    * trick as [[connectedComponentsByOrigId]] — GraphX's internal
    * min-vid label is hash order). Unlike LPA, SCC membership is a
    * graph property: mutual reachability is deterministic, so the
    * full assignment is oracle-checkable against a reachability-
    * closure oracle.
    *
    * numIter bounds GraphX's outer trim/color loop; component
    * diameter here is tiny (2-cycles + short chains), and the q_gx
    * gates verify convergence empirically at every testdata sf. */
  def stronglyConnectedByOrigId(spark: SparkSession, dict: DataFrame,
      graph: Graph[String, String], numIter: Int = 10): DataFrame = {
    import spark.implicits._
    val sccGraph = graph.stronglyConnectedComponents(numIter)
    val scc = sccGraph.vertices.toDF("vid", "scc_vid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scc.count() // O(V) labels; release the iteration graphs
    sccGraph.unpersistVertices(blocking = false)
    sccGraph.edges.unpersist(blocking = false)
    val labeled = dict.join(scc, Seq("vid"))
      .select(col("label"), col("orig_id"), col("scc_vid"))
    val rep = labeled.groupBy("scc_vid")
      .agg(min(struct(col("label"), col("orig_id"))).as("rep"))
      .select(col("scc_vid"),
        concat_ws(":", col("rep.label"), col("rep.orig_id")).as("scc"))
    labeled.join(rep, Seq("scc_vid"))
      .select(col("label"), col("orig_id"), col("scc"))
  }

  /** Per-vertex triangle counts of an undirected simple graph given
    * as numeric edge pairs. GraphX's TriangleCount canonicalizes and
    * dedups internally, then intersects adjacent neighbor sets — each
    * edge's work is bounded by the smaller endpoint's degree
    * (effectively O(E^1.5) total), the standard distributed triangle
    * algorithm; a DataFrame 3-way self-join would shuffle the edge
    * list twice and explode on high-degree vertices. Vertices are all
    * edge endpoints; a vertex in no triangle reports 0. */
  def triangleCounts(spark: SparkSession, edges: DataFrame): DataFrame = {
    import org.apache.spark.graphx.PartitionStrategy
    val edgeRdd: RDD[GxEdge[Int]] = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), 1))
    val g = Graph.fromEdges(edgeRdd, 0)
      .partitionBy(PartitionStrategy.EdgePartition2D)
    import spark.implicits._
    g.triangleCount().vertices.toDF("id", "t")
      .select(col("id"), col("t").cast("long").as("triangles"))
  }
}
