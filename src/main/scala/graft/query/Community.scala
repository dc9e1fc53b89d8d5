package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Modularity-optimizing community detection — the Louvain-family
  * optimizer (Blondel et al. 2008) built from the two phases that
  * parallelize SAFELY, each deterministic and oracle-replayable:
  *
  *  1. MERGE rounds (greedy agglomeration, Clauset–Newman–Moore '04,
  *     parallelized Borůvka-style): communities that are each
  *     other's best modularity-gain partner merge simultaneously.
  *     Merging DISJOINT pairs is exactly additive in Q — each merge
  *     touches only its own two communities' terms — so every round
  *     strictly increases modularity, and the mutual-best handshake
  *     guarantees progress (the globally best pair is always
  *     mutual, Borůvka's argument). A fully synchronous local-move
  *     sweep, by contrast, lets adjacent nodes make jointly
  *     inconsistent moves and measurably DECREASED Q on the gate
  *     graph (label-swap oscillation).
  *  2. REFINE rounds (the Louvain local-moving step, made
  *     semi-synchronous per Cordasco & Gargano 2010): alternating
  *     node-id-parity classes, each active node moves to the
  *     strict-gain argmax over its neighbors' communities (ties →
  *     stay, then smallest community id).
  *
  * Both phases compare gains EXACTLY: merging c1,c2 changes Q by
  * e12/m − d1·d2/(2m²), and moving u into c by k(u,c)/m −
  * s_u·Σtot(c\u)/(2m²); scaled by 2m² both reduce to integer
  * arithmetic (2m·e12 − d1·d2 and 2m·k − s_u·Σtot), carried as
  * DECIMAL(19,0) factors → DECIMAL(38,0) products so no product
  * overflows at any realistic edge count. Both engines compute the
  * identical integers, so every membership replays bit-for-bit;
  * [[louvainOracleSql]] generates the unrolled round chain.
  *
  * Fixed round counts, not fixpoints — the replayability discipline
  * of `q_t48`/`q_g35`. Merge rounds that find no positive mutual
  * pair are identity, so extra rounds are harmless.
  *
  * Scale: per merge round, two edge⋈membership equi-joins + three
  * hash aggregations + a bounded-heap argmax per community — O(E)
  * work, no window over data-sized partitions, nothing broadcast but
  * the 1-row 2m scalar; community count can halve per round, so
  * O(log n) rounds coalesce any hierarchy. Refine rounds are the
  * same shape keyed by node. Membership localCheckpoints per round
  * to cut lineage.
  *
  * Reference behavior: the reference repo has no community operator;
  * this extends its graph-analytics surface (SURVEY §2.9) next to
  * label propagation (`q_g35`) and the modularity scorer (`q_g29`).
  */
object Community {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")

  /** Louvain-family community detection over an unweighted undirected
    * graph: `mergeRounds` mutual-best agglomeration rounds, then
    * `refineRounds` semi-synchronous local-moving rounds. Edges are
    * canonicalized and deduped; every node starts in its own
    * community. Returns (node, community) for every node with at
    * least one edge; community labels are min-winning node ids. */
  def louvainLocal(edges: DataFrame, mergeRounds: Int = 6,
      refineRounds: Int = 2): DataFrame =
    louvainWeighted(edges.select(col("src"), col("dst"))
        .distinct().withColumn("w", lit(1L)),
      "w", mergeRounds, refineRounds)

  /** The WEIGHTED face: modularity over integral edge weights — the
    * form co-occurrence projections actually need (an edge "shared
    * 12 parts" must pull 12x harder than "shared 1"). Identical
    * two-phase engine with every count replaced by a weight sum —
    * node strength s(u) = sum of incident w, 2W = sum of strengths,
    * merge gain 2W*w12 - s1*s2, move gain 2W*k_w - s_u*tot_excl.
    * Parallel input edges collapse by SUMMING weights. All exact
    * integers, same oracle generator ([[louvainOracleSql]] takes a
    * (src, dst, w) CTE). */
  def louvainWeighted(edges: DataFrame, weightCol: String,
      mergeRounds: Int = 6, refineRounds: Int = 2): DataFrame = {
    require(mergeRounds >= 1 && mergeRounds <= 12,
      s"mergeRounds must be in [1,12]: $mergeRounds")
    require(refineRounds >= 0 && refineRounds <= 8,
      s"refineRounds must be in [0,8]: $refineRounds")
    val canon = edges.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint(true)
    val e2 = canon.select(col("src").as("u"), col("dst").as("v"), col("w"))
      .unionByName(canon.select(col("dst").as("u"), col("src").as("v"),
        col("w")))
      .localCheckpoint(true)
    val deg = e2.groupBy(col("u").as("node")).agg(sum(col("w")).as("s"))
      .localCheckpoint(true)
    // the 1-row 2W scalar (= sum of strengths): collected ONCE to the
    // driver and inlined as a literal (bounded-smalls convention, like
    // the IVF centroids). The r12 shape crossJoin(broadcast(tm))'d a
    // lazy 1-row agg in every round, which re-ran the deg aggregation
    // AND built a fresh broadcast per round — per-round jobs at gate
    // scale, a per-round O(V) pass at 100 TB. Cast back to the exact
    // decimal type the lazy sum carried so every product/compare in
    // the gain arithmetic keeps its old type (values are exact
    // integers either way).
    val tmRow = deg.agg(dec(sum(col("s"))).as("tm")).head()
    val tmLit = (if (tmRow.isNullAt(0)) lit(null)
      else lit(tmRow.getDecimal(0))).cast("decimal(29,0)").as("tm")
    // membership CARRIES the node strength: every round needs per-
    // community strength sums (ds/tot) and the refine scorer needs
    // per-node s — keeping s on the membership row makes those one
    // aggregation / zero extra joins, where the r12 shape re-joined
    // the static deg table once per round per consumer (2-3 exchanges
    // and their AQE stage-jobs per round, pure overhead at gate scale
    // and a data-sized join per round at 100 TB)
    var cur = deg.select(col("node"), col("node").as("comm"), col("s"))
    var r = 0
    while (r < mergeRounds) {
      val ds = cur.groupBy(col("comm")).agg(dec(sum(col("s"))).as("ds"))
      val ee = canon
        .join(cur.select(col("node").as("src"), col("comm").as("ca")),
          Seq("src"))
        .join(cur.select(col("node").as("dst"), col("comm").as("cb")),
          Seq("dst"))
        .filter(col("ca") =!= col("cb"))
        .groupBy(least(col("ca"), col("cb")).as("c1"),
          greatest(col("ca"), col("cb")).as("c2"))
        .agg(sum(col("w")).as("w"))
      // merge gain ∝ 2m·e12 − d1·d2, strictly positive only
      val sp = ee
        .join(ds.select(col("comm").as("c1"), col("ds").as("d1")), Seq("c1"))
        .join(ds.select(col("comm").as("c2"), col("ds").as("d2")), Seq("c2"))
        .withColumn("tm", tmLit)
        .select(col("c1"), col("c2"),
          (col("tm") * dec(col("w")) - col("d1") * col("d2")).as("sc"))
        .filter(col("sc") > 0)
      val dir = sp.select(col("c1").as("c"), col("c2").as("p"), col("sc"))
        .unionByName(sp.select(col("c2").as("c"), col("c1").as("p"),
          col("sc")))
      val best = graft.plans.TopK.topKPerKey(dir, Seq(col("c")),
          Seq(col("sc").desc, col("p")), 1)
        .select(col("c"), col("p"))
      // handshake: merge only mutual best pairs, label = smaller id
      val merge = best.as("x").join(best.as("y"),
          col("x.p") === col("y.c") && col("y.p") === col("x.c") &&
            col("x.p") < col("x.c"))
        .select(col("x.c").as("comm"), col("x.p").as("newc"))
      cur = cur.join(merge, Seq("comm"), "left")
        .select(col("node"), coalesce(col("newc"), col("comm")).as("comm"),
          col("s"))
        .localCheckpoint(true)
      r += 1
    }
    r = 0
    while (r < refineRounds) {
      val tot = cur.groupBy(col("comm")).agg(dec(sum(col("s"))).as("tot"))
      val kuc = e2.join(cur.select(col("node").as("v"), col("comm")),
          Seq("v"))
        .groupBy(col("u").as("node"), col("comm"))
        .agg(dec(sum(col("w"))).as("k"))
      val stay = cur.join(kuc, Seq("node", "comm"), "left_anti")
        .select(col("node"), col("comm"), dec(lit(0)).as("k"))
      // semi-synchronous: only this round's parity class may move
      val active = lit((r + 1) % 2)
      val sc = kuc.unionByName(stay)
        .filter(pmod(col("node"), lit(2)) === active)
        .join(cur.select(col("node"), col("comm").as("c0"), col("s")),
          Seq("node"))
        .join(tot, Seq("comm"))
        .withColumn("tm", tmLit)
        .select(col("node"), col("comm"), col("s"),
          (col("tm") * col("k") - dec(col("s")) *
            (col("tot") - when(col("comm") === col("c0"), dec(col("s")))
              .otherwise(dec(lit(0))))).as("score"),
          when(col("comm") === col("c0"), lit(1)).otherwise(lit(0))
            .as("is_cur"))
      // strict-gain moves only: a tie prefers the CURRENT community
      cur = graft.plans.TopK.topKPerKey(sc, Seq(col("node")),
          Seq(col("score").desc, col("is_cur").desc, col("comm")), 1)
        .select(col("node"), col("comm"), col("s"))
        .unionByName(cur.filter(pmod(col("node"), lit(2)) =!= active))
        .localCheckpoint(true)
      r += 1
    }
    cur.select(col("node"), col("comm").cast("long").as("community"))
  }

  /** Leiden-style connectivity refinement (the Traag et al. 2019 fix
    * for the Louvain-family defect: agglomerative merges can leave a
    * community internally DISCONNECTED — its parts are only "together"
    * through the label, not the graph). Post-pass over any membership:
    * split every community into the connected components of its
    * induced subgraph, relabeling each node with its component's
    * minimum node id (a node sharing a community but no intra-
    * community path becomes its own singleton community).
    *
    * Modularity can only go UP: separated parts share zero edges, so
    * splitting a community into components a, b changes Q by
    * +2·d_a·d_b/(2m)² ≥ 0 per separated pair (e_ab = 0 and
    * −(d_a+d_b)² → −d_a²−d_b²) — asserted with [[GraphQueries
    * .modularity]] in CommunitySpec on a planted disconnected
    * community. Scale: two edge⋈membership equi-joins to keep intra
    * edges + [[GraphQueries.connectedComponentsStar]] (O(log n)
    * alternating-star rounds) — no window, nothing driver-side.
    * Returns (node, community) for every membership row. */
  def leidenRefine(edges: DataFrame, membership: DataFrame): DataFrame = {
    val m = membership.select(col("node"), col("community"))
      .localCheckpoint(true)
    val canon = edges.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val intra = canon
      .join(m.select(col("node").as("src"), col("community").as("ca")),
        Seq("src"))
      .join(m.select(col("node").as("dst"), col("community").as("cb")),
        Seq("dst"))
      .filter(col("ca") === col("cb"))
      .select(col("src").as("u"), col("dst").as("v"))
    val comp = graft.query.GraphQueries.connectedComponentsStar(intra)
    m.join(comp.select(col("node"), col("component")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).cast("long").as("community"))
  }

  /** The shared unrolled CTE chain behind [[louvainOracleSql]] and
    * [[leidenOracleSql]]: returns the CTE text (starting at `canon`,
    * no WITH keyword) and the name of the final membership CTE. */
  private def louvainChainSql(mergeRounds: Int, refineRounds: Int,
      graphSql: String): (String, String) = {
    val sb = new StringBuilder
    sb.append(
      s"""canon AS MATERIALIZED (SELECT src, dst,
         |    CAST(sum(w) AS BIGINT) AS w
         |  FROM ($graphSql) GROUP BY src, dst),
         |e2 AS MATERIALIZED (SELECT src AS u, dst AS v, w FROM canon
         |  UNION ALL SELECT dst, src, w FROM canon),
         |deg AS MATERIALIZED (SELECT u AS node,
         |    CAST(sum(w) AS BIGINT) AS s FROM e2 GROUP BY u),
         |mm AS (SELECT CAST(sum(s) AS HUGEINT) AS tm FROM deg),
         |cur0 AS (SELECT node, node AS comm FROM deg)""".stripMargin)
    for (i <- 1 to mergeRounds) {
      val p = i - 1
      sb.append(
        s""",
           |ds$i AS MATERIALIZED (SELECT comm, CAST(sum(s) AS HUGEINT) AS ds
           |  FROM cur$p JOIN deg USING (node) GROUP BY comm),
           |ee$i AS MATERIALIZED (SELECT least(a.comm, b.comm) AS c1,
           |    greatest(a.comm, b.comm) AS c2, CAST(sum(e.w) AS HUGEINT) AS w
           |  FROM canon e JOIN cur$p a ON e.src = a.node
           |  JOIN cur$p b ON e.dst = b.node
           |  WHERE a.comm <> b.comm GROUP BY 1, 2),
           |sp$i AS MATERIALIZED (SELECT c1, c2, mm.tm * w - d1.ds * d2.ds AS sc
           |  FROM ee$i JOIN ds$i d1 ON ee$i.c1 = d1.comm
           |  JOIN ds$i d2 ON ee$i.c2 = d2.comm, mm
           |  WHERE mm.tm * w - d1.ds * d2.ds > 0),
           |dir$i AS MATERIALIZED (SELECT c1 AS c, c2 AS p, sc FROM sp$i
           |  UNION ALL SELECT c2, c1, sc FROM sp$i),
           |best$i AS MATERIALIZED (SELECT c, p FROM (
           |    SELECT c, p, row_number() OVER (PARTITION BY c
           |      ORDER BY sc DESC, p) AS rn FROM dir$i)
           |  WHERE rn = 1),
           |mg$i AS MATERIALIZED (SELECT x.c AS comm, x.p AS newc
           |  FROM best$i x JOIN best$i y
           |    ON x.p = y.c AND y.p = x.c AND x.p < x.c),
           |cur$i AS MATERIALIZED (SELECT c.node, coalesce(m.newc, c.comm) AS comm
           |  FROM cur$p c LEFT JOIN mg$i m ON c.comm = m.comm)""".stripMargin)
    }
    for (j <- 1 to refineRounds) {
      val i = mergeRounds + j
      val p = i - 1
      val par = j % 2
      sb.append(
        s""",
           |tot$i AS MATERIALIZED (SELECT comm, CAST(sum(s) AS HUGEINT) AS tot
           |  FROM cur$p JOIN deg USING (node) GROUP BY comm),
           |kuc$i AS MATERIALIZED (SELECT e2.u AS node, c.comm AS comm,
           |    CAST(sum(e2.w) AS HUGEINT) AS k
           |  FROM e2 JOIN cur$p c ON e2.v = c.node GROUP BY 1, 2),
           |cand$i AS MATERIALIZED (SELECT node, comm, k FROM kuc$i
           |  UNION ALL
           |  SELECT c.node, c.comm, CAST(0 AS HUGEINT)
           |  FROM cur$p c LEFT JOIN kuc$i x
           |    ON c.node = x.node AND c.comm = x.comm
           |  WHERE x.node IS NULL),
           |sc$i AS MATERIALIZED (SELECT a.node, a.comm,
           |    mm.tm * a.k - CAST(d.s AS HUGEINT) * (t.tot -
           |      CASE WHEN a.comm = c.comm THEN CAST(d.s AS HUGEINT)
           |           ELSE CAST(0 AS HUGEINT) END) AS score,
           |    CASE WHEN a.comm = c.comm THEN 1 ELSE 0 END AS is_cur
           |  FROM cand$i a JOIN cur$p c USING (node)
           |  JOIN deg d ON a.node = d.node
           |  JOIN tot$i t ON a.comm = t.comm, mm
           |  WHERE ((a.node % 2) + 2) % 2 = $par),
           |cur$i AS MATERIALIZED (SELECT node, comm FROM (
           |    SELECT node, comm, row_number() OVER (PARTITION BY node
           |      ORDER BY score DESC, is_cur DESC, comm) AS rn FROM sc$i)
           |  WHERE rn = 1
           |  UNION ALL
           |  SELECT node, comm FROM cur$p
           |  WHERE ((node % 2) + 2) % 2 <> $par)""".stripMargin)
    }
    (sb.toString, s"cur${mergeRounds + refineRounds}")
  }

  /** DuckDB replay of [[louvainLocal]] / [[louvainWeighted]]: the
    * unrolled merge + refine round chain over a caller-supplied
    * canonical-edge CTE body producing (src, dst, w) with src < dst
    * (unweighted graphs pass `1 AS w`; parallel edges are summed
    * here). HUGEINT carries the exact score products. */
  def louvainOracleSql(mergeRounds: Int, refineRounds: Int,
      graphSql: String): String = {
    require(mergeRounds >= 1 && mergeRounds <= 12)
    require(refineRounds >= 0 && refineRounds <= 8)
    val (chain, last) = louvainChainSql(mergeRounds, refineRounds, graphSql)
    s"""WITH $chain
       |SELECT node, CAST(comm AS BIGINT) AS community
       |FROM $last ORDER BY node""".stripMargin
  }

  /** DuckDB replay of louvain + [[leidenRefine]]: the louvain chain,
    * then intra-community edges and a recursive min-label reachability
    * (the q_gx_connected_components oracle pattern — sound here
    * because the symmetric edge set only contains INTRA-community
    * edges, so labels never leak across communities). */
  def leidenOracleSql(mergeRounds: Int, refineRounds: Int,
      graphSql: String): String = {
    require(mergeRounds >= 1 && mergeRounds <= 12)
    require(refineRounds >= 0 && refineRounds <= 8)
    val (chain, last) = louvainChainSql(mergeRounds, refineRounds, graphSql)
    s"""WITH RECURSIVE $chain,
       |lmem AS MATERIALIZED (SELECT node, comm FROM $last),
       |lintra AS MATERIALIZED (SELECT e.src AS a, e.dst AS b
       |  FROM canon e JOIN lmem x ON e.src = x.node
       |  JOIN lmem y ON e.dst = y.node WHERE x.comm = y.comm),
       |lsym AS MATERIALIZED (SELECT a, b FROM lintra
       |  UNION SELECT b AS a, a AS b FROM lintra),
       |lreach AS (SELECT node AS id, node AS lbl FROM lmem
       |  UNION
       |  SELECT e.b AS id, r.lbl FROM lreach r JOIN lsym e ON e.a = r.id)
       |SELECT id AS node, CAST(min(lbl) AS BIGINT) AS community
       |FROM lreach GROUP BY id ORDER BY node""".stripMargin
  }
}
