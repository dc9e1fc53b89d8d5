package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planner-less textual pattern front-end — the reference's entire
  * query interface is Cypher strings (notebook/Edits.ipynb:1345-1351,
  * dockerapp/app/main.py:185,199-204); this is the minimal motif
  * layer SURVEY §4 scoped ("motif string → join DAG, like
  * GraphFrames"), sitting ABOVE Catalyst: it only declares joins, so
  * broadcast selection, join reordering, AQE skew handling and
  * filter pushdown through the motif's columns all come from the
  * optimizer, exactly as with hand-written joins.
  *
  * Grammar (one element per `;`):
  * {{{
  *   (a)-[:REL_TYPE]->(b)        // one hop
  *   (a)-[:REL_TYPE*..3]->(b)    // variable length: 1..3 hops
  * }}}
  * Variables bind an edge table's `src`/`dst`; elements sharing a
  * variable are equi-joined on it; disconnected groups cross-join
  * (Cypher comma semantics). Predicates/projection/ordering stay
  * plain DataFrame ops on the variable columns — matching how the
  * reference's Cypher composes MATCH + WHERE + RETURN.
  *
  * A variable-length element binds (a, b) to the DISTINCT pairs
  * reachable in 1..k hops over that rel (Cypher `-[:R*..k]->`
  * semantics without path multiplicity) — computed as bounded
  * frontier joins, the same shape as
  * [[GraphQueries.kHopNeighborhood]].
  */
object Motif {

  private val Elem =
    """\(\s*(\w*)\s*\)\s*-\s*\[\s*:?\s*(\w+)\s*(?:\*\s*\.\.\s*(\d+)\s*)?\]\s*->\s*\(\s*(\w*)\s*\)""".r

  final case class Pattern(src: String, rel: String, dst: String,
      maxHops: Option[Int] = None)

  /** Parse the motif. Anonymous vertices `()` (Cypher's existence
    * form, e.g. `(l)-[:HAS_KEYWORD]->()`) bind fresh hidden variables
    * `__anonN` that are dropped from the result. */
  def parse(pattern: String): Seq[Pattern] = {
    var anon = 0
    def fresh(v: String): String =
      if (v.nonEmpty) v else { anon += 1; s"__anon$anon" }
    pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case Elem(a, r, hops, b) =>
        val (va, vb) = (fresh(a), fresh(b))
        require(va != vb, s"self-loop variables not supported: ($a)-[:$r]->($b)")
        val mh = Option(hops).map(_.toInt)
        mh.foreach(k => require(k >= 1, s"*..$k needs k >= 1"))
        Pattern(va, r, vb, mh)
      case other => throw new IllegalArgumentException(
        s"cannot parse motif element '$other' (expected '(a)-[:REL]->(b)' or '(a)-[:REL*..k]->(b)')")
    }
  }

  /** Distinct (a, b) pairs connected by a 1..maxHops directed path.
    * Bounded frontier expansion with per-round dedup against the
    * accumulated closure (new pairs only — cycles can't loop) and
    * localCheckpoint lineage truncation. */
  private[query] def reachPairs(e: DataFrame, maxHops: Int): DataFrame = {
    val base = e.select(col("src").as("a"), col("dst").as("b"))
      .distinct().localCheckpoint(true)
    var all = base
    var frontier = base
    var i = 2
    while (i <= maxHops) {
      val next = frontier
        .join(base.select(col("a").as("b"), col("b").as("c")), Seq("b"))
        .select(col("a"), col("c").as("b")).distinct()
        .join(all, Seq("a", "b"), "left_anti")
        .localCheckpoint(true)
      all = all.unionByName(next).localCheckpoint(true)
      frontier = next
      i += 1
    }
    all
  }

  /** Translate a motif to a DataFrame whose columns are the motif's
    * variables (each holding the matched node key).
    *
    * Join ORDER is chosen by the motif layer (Catalyst reorders inner
    * joins only with CBO stats, which ad-hoc DataFrames lack): start
    * from the pattern with the smallest estimated edge table
    * (Catalyst's `sizeInBytes` — file-size based, no counting job),
    * then greedily attach the smallest pattern that shares a variable
    * with what's bound so far. A disconnected group therefore
    * cross-joins only when no connected pattern remains (true Cypher
    * comma semantics) — never just because the motif STRING listed
    * elements in an unfortunate order. All joins are inner equi-joins
    * on shared variables, so the chosen order cannot change the
    * result set, only the plan. */
  def find(edges: Map[String, DataFrame], pattern: String): DataFrame = {
    val pats = parse(pattern)
    require(pats.nonEmpty, "empty motif")
    val relSize: Map[String, BigInt] = pats.map(_.rel).distinct.map { r =>
      val e = edges.getOrElse(r, throw new IllegalArgumentException(
        s"unknown rel type '$r' (have: ${edges.keys.toSeq.sorted.mkString(", ")})"))
      r -> e.queryExecution.optimizedPlan.stats.sizeInBytes
    }.toMap
    def bind(p: Pattern): DataFrame = p.maxHops match {
      case None => edges(p.rel).select(col("src").as(p.src), col("dst").as(p.dst))
      case Some(k) => reachPairs(edges(p.rel), k)
        .select(col("a").as(p.src), col("b").as(p.dst))
    }
    // stable sort: size, then textual position as the tiebreak
    var remaining = pats.zipWithIndex
      .sortBy { case (p, i) => (relSize(p.rel), i) }.map(_._1).toList
    var acc = bind(remaining.head)
    var accVars = Set(remaining.head.src, remaining.head.dst)
    remaining = remaining.tail
    while (remaining.nonEmpty) {
      val next = remaining.find(p => accVars(p.src) || accVars(p.dst))
        .getOrElse(remaining.head) // no connected pattern left: new group
      remaining = remaining.filterNot(_ eq next)
      val df = bind(next)
      val common = acc.columns.intersect(df.columns).toSeq
      acc = if (common.isEmpty) acc.crossJoin(df) else acc.join(df, common)
      accVars ++= Seq(next.src, next.dst)
    }
    val visible = acc.columns.filterNot(_.startsWith("__anon"))
    acc.select(visible.toIndexedSeq.map(col): _*)
  }
}
