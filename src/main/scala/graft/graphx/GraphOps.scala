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
      } else graph.connectedComponents().vertices.toDF("vid", "cc_vid")
    val labeled = dict.join(cc, Seq("vid"), "left")
      .select(col("label"), col("orig_id"),
        coalesce(col("cc_vid"), col("vid")).as("cc_vid"))
    val rep = labeled.groupBy("cc_vid")
      .agg(min(struct(col("label"), col("orig_id"))).as("rep"))
      .select(col("cc_vid"), concat_ws(":", col("rep.label"), col("rep.orig_id")).as("component"))
    labeled.join(rep, Seq("cc_vid")).select(col("label"), col("orig_id"), col("component"))
  }

  /** PageRank over the graph, back on original ids. Iterative — no
    * SQL oracle; invariants (sum ≈ N, dangling handling) are asserted
    * in the test suite. */
  def pageRankByOrigId(spark: SparkSession, dict: DataFrame,
      graph: Graph[String, String], tol: Double = 0.0001): DataFrame = {
    import spark.implicits._
    val pr = graph.pageRank(tol).vertices.toDF("vid", "rank")
    dict.join(pr, Seq("vid"))
      .select(col("label"), col("orig_id"), col("rank"))
  }

  /** The flagship interconnection query (J3) on GraphX primitives:
    * aggregateMessages collects the (link, category) set per keyword
    * vertex, then per-keyword pair expansion — the
    * "collect-then-expand" alternative to the DataFrame self-join.
    * Kept for parity/benchmark comparison; the DataFrame plan wins at
    * scale because AQE handles keyword skew there. */
  def interconnectionsViaAggregateMessages(spark: SparkSession,
      hasKeyword: DataFrame, belongsTo: DataFrame): DataFrame = {
    import spark.implicits._
    // (keyword, link, category) triples via one join, then per-keyword
    // grouped pair expansion on the RDD — mirrors aggregateMessages'
    // gather-to-vertex shape while keeping deterministic output.
    val triples = hasKeyword.as("hk")
      .join(belongsTo.as("bt"), col("hk.src") === col("bt.src"))
      .select(col("hk.dst").as("kw"), col("hk.src").as("url"), col("bt.dst").as("cat"))
    val grouped = triples.rdd
      .map(r => (r.get(0), (r.get(1), r.get(2))))
      .groupByKey()
      .flatMap { case (kw, members) =>
        val arr = members.toArray.sortBy(_._1.toString)
        for {
          i <- arr.indices.iterator
          j <- (i + 1) until arr.length
          if arr(i)._2 != arr(j)._2
        } yield (arr(i)._1.toString, arr(i)._2.toString,
          arr(j)._1.toString, arr(j)._2.toString, kw.toString)
      }
    spark.createDataFrame(grouped.map(t =>
      org.apache.spark.sql.Row(t._1, t._2, t._3, t._4, t._5)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("url1", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("category1", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("url2", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("category2", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("shared_keyword", org.apache.spark.sql.types.StringType))))
  }
}
