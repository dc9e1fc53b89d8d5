package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Enrich, Staging, UrlFunctions}
import graft.query.GraphQueries
import graft.store.GraphStore

/** Driver contract (see builder prompt + SURVEY.md §7).
  *
  * Every operator family from SURVEY.md §2 is exercised as a named
  * query over the driver testdata, with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible. The reference's graph domain
  * (Link/Category/Keyword + BELONGS_TO/HAS_KEYWORD) is mapped onto the
  * TPC-H-ish star schema:
  *
  *   Link ≙ supplier, Category ≙ nation (BELONGS_TO ≙ s_nationkey),
  *   Keyword ≙ part (HAS_KEYWORD ≙ distinct (l_suppkey, l_partkey)
  *   pairs from lineitem) — so the flagship interconnection query J3
  *   ("links sharing a keyword across categories") becomes "suppliers
  *   sharing a part across nations", structurally identical.
  *
  * Column-name parity rule: every computed column is aliased
  * identically here and in [[oracleSql]] (driver hash-compares after
  * sorting columns by name). Doubles that are not exact on a 2-decimal
  * grid are wrapped in round(_, 2..4) on BOTH sides.
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_j3_interconnect")(spark, "/root/testdata/sf0.001")

  // ---- graph-domain mapping over testdata ----

  /** HAS_KEYWORD analog: supplier —supplies→ part, deduped. */
  private def hasKeyword(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_suppkey").as("src"), col("l_partkey").as("dst")).distinct()

  /** BELONGS_TO analog: supplier —located-in→ nation. */
  private def belongsTo(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .select(col("s_suppkey").as("src"), col("s_nationkey").as("dst"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- aggregations (A1..A6) --
    "q_agg_pricing" -> ((s, d) => // TPC-H Q1 shape: multi-agg + group + sort
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
    "q_a1_count" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("n"))),
    "q_a3_distinct" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_orderpriority").as("priority"))
        .distinct().orderBy(col("priority"))),
    "q_a4_explode_distinct" -> ((s, d) => // set-union of split keywords (ref A4)
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "").distinct().orderBy(col("word"))),
    "q_a5_keyword_freq" -> ((s, d) => // value_counts analog (ref A5)
      GraphQueries.keywordDistribution(hasKeyword(s, d))),
    "q_a6_dup_ids" -> ((s, d) =>
      GraphQueries.duplicateIds(Tables.lineitem(s, d), "l_orderkey")
        .orderBy(col("l_orderkey"))),

    // -- joins / graph patterns (J1..J7) --
    "q_j1_link_listing" -> ((s, d) => {
      val links = Tables.supplier(s, d)
        .select(col("s_suppkey").as("url"), col("s_name").as("title"))
      val cats = Tables.nation(s, d)
        .select(col("n_nationkey").as("name"), col("n_name"))
      GraphQueries.linkListing(links, belongsTo(s, d), cats)
        .select(col("url").as("s_suppkey"), col("title").as("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
    }),
    "q_j2_link_keywords" -> ((s, d) => {
      val links = Tables.supplier(s, d).select(col("s_suppkey").as("url"))
      GraphQueries.linkKeywords(links, hasKeyword(s, d))
        .orderBy(col("url"), col("keyword"))
    }),
    "q_j3_interconnect" -> ((s, d) => // FLAGSHIP (ref Edits.ipynb:1345-1351)
      GraphQueries.interconnections(hasKeyword(s, d), belongsTo(s, d),
        canonicalPairs = true, limit = 100)),
    "q_j4_semi_existing" -> ((s, d) => {
      val store = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      GraphQueries.existing(
          Tables.customer(s, d).select(col("c_custkey"), col("c_name")), store, "c_custkey")
        .orderBy(col("c_custkey"))
    }),
    "q_j5_anti_orphans" -> ((s, d) => {
      // orphan dims = customers with no 1995 order (edge subset keeps
      // the anti-join non-trivially populated at every sf)
      val dims = Tables.customer(s, d)
        .select(col("c_custkey").as("name"), col("c_name"))
      val edges = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey").as("dst"))
      GraphQueries.orphans(dims, edges)
        .select(col("name").as("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "q_j7_merge_upsert" -> ((s, d) => { // last-writer-wins MERGE..SET (ref J7)
      val existing = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val incoming = Tables.orders(s, d)
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 10000.0).as("o_totalprice"))
      GraphStore.mergeByKey(existing, incoming, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // -- projections / filters (P-family) --
    "q_p8_validity_filter" -> ((s, d) => {
      val meta = Tables.documents(s, d).select(
        col("doc_id"), col("text").as("content"), col("lang").as("category"),
        col("source").as("keyword"), col("n_chars"))
      Staging.validRows(meta)
        .select(col("doc_id"), col("category").as("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // -- sorts / limits / sampling (O-family) --
    "q_o1_multisort" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
          col("l_linenumber"))
        .limit(500)),
    "q_o3_topk" -> ((s, d) => // TakeOrderedAndProject path
      Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)),
    "q_o5_sample" -> ((s, d) => // deterministic pseudo-sample (ref O5 uses df.sample)
      Tables.orders(s, d).filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // -- set ops (§2.6) --
    "q_set_except" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .except(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey"))),

    // -- scalar functions (F-family) --
    "q_f_string_medley" -> ((s, d) => // F1/F2/F3/F4/F5/F11/F14 in one projection
      Tables.documents(s, d).select(
        col("doc_id"),
        substring(trim(col("text")), 1, 50).as("prefix"),
        length(col("text")).cast("long").as("len"),
        lower(col("lang")).as("lang_lc"),
        array_join(slice(split(col("text"), " "), 1, 3), ", ").as("kw3"),
        concat(lit("Link:"), col("doc_id")).as("node_id"))
        .orderBy(col("doc_id"))),
    "q_f8_normalize_url" -> ((s, d) => {
      val raw = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
            concat(lit("www.Site"), col("doc_id"), lit(".com/Path/")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("HTTPS://Host"), col("doc_id"), lit(".Example.COM/a/b?q=1")))
          .otherwise(concat(lit("http://host"), col("doc_id"), lit(".com/x/#frag")))
          .as("url"))
      raw.select(col("doc_id"), UrlFunctions.normalizeUrl(col("url")).as("url_norm"))
        .orderBy(col("doc_id"))
    }),
    "q_f13_json_parse" -> ((s, d) => // fenced-JSON structured parse (ref F13)
      Tables.events(s, d).select(col("event_id"),
        Enrich.parseFenced(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k").as("k"))
        .orderBy(col("event_id"))),

    // -- graph maintenance (G2) --
    "q_g2_detach_delete" -> ((s, d) => {
      val doomed = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
        .select(col("s_suppkey").as("__key"))
      hasKeyword(s, d).join(doomed, col("src") === col("__key"), "left_anti")
        .select(col("src"), col("dst")).orderBy(col("src"), col("dst"))
    }),

    // -- viz projection (G4) --
    "q_g4_viz_nodes" -> ((s, d) => {
      val links = Tables.supplier(s, d)
        .select(col("s_suppkey").cast("string").as("url"), col("s_name").as("title"))
      val cats = Tables.nation(s, d).select(col("n_name").as("name"))
      val kws = Tables.part(s, d).select(col("p_name").as("name")).distinct()
      GraphQueries.vizNodes(links, cats, kws).orderBy(col("id"), col("label"))
    }),

    // -- window functions (§2.9 map-forward) --
    "q_w1_latest_per_key" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        .orderBy(col("o_custkey"))
    }),

    // -- time-window aggregation (streaming-shaped, batch-verified) --
    "q_t1_hourly_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .orderBy(col("hour"), col("event_type"))),
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_a1_count" -> "SELECT count(*) AS n FROM lineitem",
    "q_a3_distinct" ->
      "SELECT DISTINCT o_orderpriority AS priority FROM orders ORDER BY priority",
    "q_a4_explode_distinct" ->
      """SELECT DISTINCT w AS word FROM
         (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE w <> '' ORDER BY word""",
    "q_a5_keyword_freq" ->
      """WITH hk AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem)
         SELECT dst AS keyword, count(*) AS n FROM hk
         GROUP BY dst ORDER BY n DESC, keyword""",
    "q_a6_dup_ids" ->
      """SELECT l_orderkey, count(*) AS n FROM lineitem
         GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey""",
    "q_j1_link_listing" ->
      """SELECT s_suppkey, s_name, n_name FROM supplier
         JOIN nation ON s_nationkey = n_nationkey ORDER BY s_suppkey""",
    "q_j2_link_keywords" ->
      """SELECT DISTINCT l_suppkey AS url, l_partkey AS keyword
         FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
         ORDER BY url, keyword""",
    "q_j3_interconnect" ->
      """WITH hk AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
         bt AS (SELECT s_suppkey AS src, s_nationkey AS dst FROM supplier)
         SELECT e1.src AS url1, b1.dst AS category1,
                e2.src AS url2, b2.dst AS category2,
                e1.dst AS shared_keyword
         FROM hk e1 JOIN hk e2 ON e1.dst = e2.dst AND e1.src < e2.src
         JOIN bt b1 ON b1.src = e1.src
         JOIN bt b2 ON b2.src = e2.src
         WHERE b1.dst <> b2.dst
         ORDER BY shared_keyword, category1, category2, url1, url2
         LIMIT 100""",
    "q_j4_semi_existing" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_j5_anti_orphans" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND year(o_orderdate) = 1995)
         ORDER BY c_custkey""",
    "q_j7_merge_upsert" ->
      """WITH incoming AS
           (SELECT o_orderkey, 'U' AS o_orderstatus,
                   o_totalprice + 10000.0 AS o_totalprice
            FROM orders WHERE o_orderkey % 10 = 0),
         unioned AS
           (SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS seq FROM orders
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS seq FROM incoming),
         ranked AS
           (SELECT *, row_number() OVER
              (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
            FROM unioned)
         SELECT o_orderkey, o_orderstatus, o_totalprice
         FROM ranked WHERE rn = 1 ORDER BY o_orderkey""",
    "q_p8_validity_filter" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE text IS NOT NULL AND length(trim(text)) >= 100
           AND lower(lang) <> 'uncategorized' AND lower(source) <> 'none'
         ORDER BY doc_id""",
    "q_o1_multisort" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_quantity
         FROM lineitem
         ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber
         LIMIT 500""",
    "q_o3_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_o5_sample" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""",
    "q_set_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         EXCEPT SELECT o_custkey AS c_custkey FROM orders
         WHERE o_orderstatus = 'F'
         ORDER BY c_custkey""",
    "q_f_string_medley" ->
      """SELECT doc_id,
         substr(trim(text), 1, 50) AS prefix,
         length(text) AS len,
         lower(lang) AS lang_lc,
         array_to_string(string_split(text, ' ')[1:3], ', ') AS kw3,
         'Link:' || doc_id AS node_id
         FROM documents ORDER BY doc_id""",
    "q_f8_normalize_url" ->
      """WITH raw AS (SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'www.Site' || doc_id || '.com/Path/'
                WHEN doc_id % 3 = 1 THEN 'HTTPS://Host' || doc_id || '.Example.COM/a/b?q=1'
                ELSE 'http://host' || doc_id || '.com/x/#frag' END AS url
           FROM documents),
         s1 AS (SELECT doc_id,
           CASE WHEN NOT regexp_matches(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://')
                THEN 'https://' || trim(url) ELSE trim(url) END AS u FROM raw),
         s2 AS (SELECT doc_id, regexp_replace(u, '[?#].*$', '') AS u FROM s1),
         s3 AS (SELECT doc_id,
           lower(regexp_extract(u, '^([^:]*://[^/]*)', 1))
             || regexp_replace(u, '^[^:]*://[^/]*', '') AS u FROM s2)
         SELECT doc_id, regexp_replace(u, '/+$', '') AS url_norm
         FROM s3 ORDER BY doc_id""",
    "q_f13_json_parse" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "q_g2_detach_delete" ->
      """WITH hk AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem)
         SELECT src, dst FROM hk
         WHERE NOT EXISTS (SELECT 1 FROM supplier
                           WHERE s_suppkey = src AND s_nationkey = 0)
         ORDER BY src, dst""",
    "q_g4_viz_nodes" ->
      """SELECT 'Link:' || CAST(s_suppkey AS VARCHAR) AS id, s_name AS label,
                'Link' AS "group"
         FROM supplier WHERE s_name IS NOT NULL
         UNION ALL
         SELECT 'Category:' || n_name, n_name, 'Category'
         FROM nation WHERE n_name IS NOT NULL
         UNION ALL
         SELECT 'Keyword:' || p_name, p_name, 'Keyword'
         FROM (SELECT DISTINCT p_name FROM part) WHERE p_name IS NOT NULL
         ORDER BY id, label""",
    "q_w1_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "q_t1_hourly_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                event_type, count(*) AS n, round(sum(value), 2) AS v
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
  )
}
