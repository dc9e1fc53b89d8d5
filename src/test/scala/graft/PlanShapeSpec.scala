package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the `.explain` audits the charter
  * asks for, pinned as tests so a regression in pushdown, broadcast
  * selection, codegen coverage or top-k planning fails the suite
  * instead of silently costing a scan.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** Executed plan, FINAL section only — AQE's toString appends the
    * initial plan after `== Initial Plan ==`, which would double-count
    * operators in string-based assertions. */
  private def executedFinal(df: org.apache.spark.sql.DataFrame): String =
    executed(df).split("== Initial Plan ==").head

  test("filter + projection push into the parquet scan") {
    val q = Tables.orders(spark, sf0001)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_totalprice")
    val plan = executed(q)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"),
      s"filter not pushed:\n$plan")
    // column pruning: the scan must read only the 3 referenced columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderdate"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("dynamic partition pruning: runtime dim filter becomes a fact partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp_spec").toString
    Tables.lineitem(spark, sf0001)
      .select($"l_returnflag".as("rf"), $"l_extendedprice".as("price"))
      .write.partitionBy("rf").mode("overwrite").parquet(s"$dir/fact")
    // the dim must be FILE-backed: a filter over a LocalRelation is
    // constant-folded before the PartitionPruning rule runs, and DPP
    // never plans (found the hard way)
    Seq(("R", "returned"), ("A", "active"), ("N", "none"))
      .toDF("rf", "status").write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")
    val q = fact.join(dim.filter($"status" === "returned"), Seq("rf"))
      .groupBy($"rf").agg(count(lit(1)).as("n"))
    val plan = executed(q)
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic pruning on the fact scan:\n$plan")
    // and the answer matches the static-filter equivalent
    val expected = fact.filter($"rf" === "R").count()
    assert(q.as[(String, Long)].collect().toSeq == Seq(("R", expected)))
  }

  test("dimension join broadcasts; link listing has no shuffle on the dim side") {
    val links = Tables.supplier(spark, sf0001)
      .select($"s_suppkey".as("url"), $"s_name".as("title"))
    val bt = Tables.supplier(spark, sf0001)
      .select($"s_suppkey".as("src"), $"s_nationkey".as("dst"))
    val cats = Tables.nation(spark, sf0001).select($"n_nationkey".as("name"), $"n_name")
    val plan = executed(graft.query.GraphQueries.linkListing(links, bt, cats))
    assert(plan.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$plan")
  }

  test("ordered LIMIT plans TakeOrderedAndProject, not a global sort") {
    val plan = executed(Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc).limit(10))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not planned:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), s"global sort planned:\n$plan")
  }

  test("text analysis is whole-stage-codegen'd via one fused kernel, no UDFs") {
    val q = Tables.documents(spark, sf0001).select(
      graft.ext.TextAnalysis.langId($"text").as("lang_pred"),
      graft.ext.TextAnalysis.tokenCount($"text").as("n"))
    val plan = executed(q)
    // `*(n)` is the whole-stage-codegen marker; the HOF formulation
    // left this Project un-starred (interpreted) because lambda
    // variables defeat codegen
    assert(plan.linesIterator.exists(l =>
        l.contains("Project") && l.trim.stripPrefix("+- ").startsWith("*(")),
      s"projection not codegen'd:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF in the hot path:\n$plan")
    // all stat references collapse to the ONE fused kernel; its copies
    // are identical (no lambda ids) so codegen CSE computes it once —
    // guard that no lambda-bearing tokenizer remains in the projection
    assert(!plan.contains("lambdafunction"),
      s"lambda subtree (CSE-defeating) in the projection:\n$plan")
  }

  test("MinHash banding is a single fused projection (no duplicated subtrees)") {
    // the projection-collapse trap: a k-column formulation recomputes
    // the shingle hash per output column; the fused kernel must appear
    // exactly once in the optimized plan
    val q = Tables.documents(spark, sf0001).select(
      posexplode(graft.functions.MinHash.minhashTokenBands(
        graft.ext.TextAnalysis.tokens($"text"), 3, 32, 8, 42L)))
    val optimized = q.queryExecution.optimizedPlan.toString
    val kernels = "minhash_token_bands".r.findAllIn(optimized.toLowerCase).size
    assert(kernels <= 2, s"kernel duplicated $kernels times:\n$optimized")
  }

  test("interval join keeps the equi key (no cartesian family)") {
    val plan = executed(graft.streaming.Streams.intervalJoin(
      Tables.events(spark, sf0001), "view", "purchase", windowMinutes = 120))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degenerated to cross product:\n$plan")
  }

  test("stratified sampling is a pure scan-side filter (no shuffle)") {
    val q = graft.ext.Sampling.stratifiedDeterministic(
      Tables.documents(spark, sf0001), "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.25), grain = 100)
    val plan = executed(q)
    assert(!plan.contains("Exchange"),
      s"deterministic sample should not shuffle:\n$plan")
  }

  test("packing manifest reuses the shard partitioning: window + agg share one hash exchange") {
    val q = graft.ext.Packing.packingManifest(
      Tables.documents(spark, sf0001).select($"doc_id", $"source", $"n_chars"),
      "source", "doc_id", "n_chars", budget = 8192L)
    val plan = executedFinal(q)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one exchange on source feeds the window; the (source, bin) agg is
    // clustered by a superset key so it must NOT re-shuffle
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$plan")
  }

  test("sliding windows expand map-side: one aggregation shuffle only") {
    val q = graft.streaming.Streams.slidingAgg(
      Tables.events(spark, sf0001), 60, 15)
    val plan = executedFinal(q)
    assert(plan.contains("Expand"), s"window slides not expanded map-side:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$plan")
  }

  test("EP-T final plan: broadcast joins only, no cartesian family") {
    val q = SparkEntry.queries("q_ept_training_pipeline")(spark, sf0001)
    val plan = executed(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"EP-T degenerated to a cross product:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"UDF in EP-T's hot path:\n$plan")
  }

  test("runtime bloom filter: dim filter becomes might_contain on the fact side") {
    val s2 = graft.query.Skew.runtimeBloomSession(spark)
    val li = Tables.lineitem(s2, sf0001)
    val supp = Tables.supplier(s2, sf0001).filter(col("s_nationkey") === 3)
    val q = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain"),
      s"no bloom probe on the fact side:\n$optimized")
    assert(optimized.contains("bloom_filter_agg"),
      s"no bloom build on the dim side:\n$optimized")
    // and the shared session is untouched by the child session's conf
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }

  test("l2-normalize projection is codegen'd with no lambda subtrees") {
    val q = Tables.embeddings(spark, sf0001).select(
      graft.functions.VectorFunctions.l2Normalize($"embedding").as("v"))
    val plan = executed(q)
    assert(!plan.contains("lambdafunction"),
      s"lambda subtree in the normalize projection:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("Project") && l.trim.stripPrefix("+- ").startsWith("*(")),
      s"projection not codegen'd:\n$plan")
  }
  test("OHLC is one hash aggregate with map-side partial agg, no sort or re-shuffle") {
    val plan = executedFinal(graft.ext.TimeSeries.ohlcHourly(
      Tables.events(spark, sf0001), "user_id", "ts", "event_id", "value"))
    // partial + final aggregate pair around ONE hash exchange, no
    // Window and no range shuffle — the rewrite's whole point. (The
    // aggregates are SortAggregate, not HashAggregate: min_by's
    // buffer carries the string order key, which hash agg's mutable
    // buffer can't hold — the sorts are partition-local and the
    // map-side partial agg still collapses to one row per (user, h).)
    assert(!plan.contains("Window"), s"OHLC planned a window:\n$plan")
    assert("SortAggregate".r.findAllIn(plan).size == 2,
      s"expected partial+final agg pair:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"unexpected range shuffle:\n$plan")
  }

  test("bloom decontamination probe side has no shuffle before the per-doc agg") {
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter($"doc_id" % 97 === 0).select($"text")
    val plan = executedFinal(graft.ext.Decontaminate.bloomContaminationFlags(
      docs, "doc_id", "text", bench, "text", n = 8,
      expectedGrams = 10000L, fpp = 1e-4))
    // corpus side: scan → explode → bloom filter → partial agg, then
    // ONE exchange for the final per-doc agg (no join exchange at
    // all). The bloom build runs as a scalar subquery with its own
    // tiny benchmark-side exchanges — count the corpus plan only.
    val corpusPlan = plan.split("Subquery subquery").head
    assert("Exchange hashpartitioning".r.findAllIn(corpusPlan).size == 1,
      s"bloom probe should shuffle once (final agg only):\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"bloom path should not plan a join:\n$plan")
    // the probe is the native codegen'd might_contain over a scalar
    // subquery — never a Scala UDF (r5 verdict: the one UDF violation)
    assert(plan.contains("might_contain"),
      s"bloom probe should use the native might_contain predicate:\n$plan")
    assert(!plan.toLowerCase.contains("udf"),
      s"bloom probe must not plan a UDF:\n$plan")
  }

  test("substring dedup plans no corpus window, no cartesian, fused shingles") {
    val plan = executedFinal(graft.ext.SubstringDedup.dedupSubstrings(
      Tables.documents(spark, sf0001), "doc_id", "text", k = 20))
    // first-occurrence election is a min-struct AGGREGATE (map-side
    // partial combine), never a window sort over the corpus gram set
    assert(!plan.contains("Window"), s"substring dedup planned a window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in dedup plan:\n$plan")
    // shingling runs through the fused codegen kernel, not a HOF lambda
    assert(plan.contains("word_shingles"), s"fused shingle kernel missing:\n$plan")
  }

  test("domain cap routes through TopKPerKey: no per-domain sort, no window") {
    val plan = executedFinal(SparkEntry.queries("q_x21_domain_cap")(spark, sf0001))
    assert(plan.contains("TopKPerKey"), s"native top-k missing:\n$plan")
    assert(!plan.contains("Window"), s"domain cap planned a window:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in domain cap plan:\n$plan")
  }

  test("packSequences: prefix-sum window + piece explode + one reassembly agg") {
    val plan = executedFinal(SparkEntry.queries("q_x20_pack_sequences")(spark, sf0001))
    assert(plan.contains("Window"), s"offset window missing:\n$plan")
    assert(plan.contains("Generate"), s"piece explode missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in pack plan:\n$plan")
    // exchanges: shard window + (shard,seq) agg + output sort — never more
    val exchanges = "(?<!Reused)Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"pack plan has $exchanges exchanges:\n$plan")
  }

  test("DSIR: bucket-ratio table joins broadcast, gram stream never sort-merges") {
    val plan = executedFinal(SparkEntry.queries("q_o13_dsir")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"ratio join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"gram stream sort-merged:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in DSIR plan:\n$plan")
  }

  test("histogram buckets aggregate before the tiny cumulative window") {
    val q = SparkEntry.queries("q_a17_histogram")(spark, sf0001)
    val plan = executedFinal(q)
    // the window runs over ~20 bucket rows AFTER the agg — assert the
    // aggregate exists and the scan reads only the bucketed column
    assert(plan.contains("HashAggregate"), s"no hash agg:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && !readSchema.contains("l_partkey"),
      s"scan not pruned to the histogram column: $readSchema")
  }

  test("KMV sketch: bottom-k via TopKPerKey after partial-agg dedup, no window") {
    val plan = executedFinal(graft.ext.Sketches.kmvSketch(
      Tables.lineitem(spark, sf0001), "l_returnflag", "l_orderkey", 32))
    assert(plan.contains("TopKPerKey"), s"native top-k missing:\n$plan")
    assert(!plan.contains("Window"), s"KMV planned a window:\n$plan")
    assert(plan.contains("HashAggregate"), s"dedup not a hash agg:\n$plan")
  }

  test("SQ8 + funnel retrieval: TopKPerKey ranking, broadcast query side, no UDF") {
    for (name <- Seq("q_n8_sq_ann", "q_v3_matryoshka_funnel")) {
      val plan = executedFinal(SparkEntry.queries(name)(spark, sf0001))
      assert(plan.contains("TopKPerKey"), s"$name: native top-k missing:\n$plan")
      assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"$name: query side not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$name: sort-merge join:\n$plan")
      assert(!plan.contains("UDF"), s"$name: UDF in plan:\n$plan")
    }
  }

  test("containment join: equi-join candidates, never a cartesian family") {
    val plan = executedFinal(SparkEntry.queries("q_d12_containment")(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), s"cartesian in containment:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop in containment:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in containment plan:\n$plan")
  }

  test("curriculum schedule: threshold broadcast + map-side projection, no window") {
    val plan = executedFinal(SparkEntry.queries("q_o16_curriculum")(spark, sf0001))
    assert(!plan.contains("Window"), s"curriculum planned a window:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"curriculum sort-merged:\n$plan")
  }

  test("preference pairs: one hash aggregate, no window, no UDF") {
    val plan = executedFinal(
      SparkEntry.queries("q_o17_preference_pairs")(spark, sf0001))
    assert(!plan.contains("Window"), s"pairs planned a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"pairs missing the aggregate:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in pairs plan:\n$plan")
  }

  test("cusum: window cascade only, no collect_list aggregate of the series") {
    val plan = executedFinal(SparkEntry.queries("q_t17_cusum")(spark, sf0001))
    assert(plan.contains("Window"), s"cusum lost its windows:\n$plan")
    assert(!plan.contains("collect_list"), s"cusum buffers per-key arrays:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in cusum plan:\n$plan")
  }

  test("quantile normalize: percentile grid broadcast, never sort-merged") {
    val plan = executedFinal(
      SparkEntry.queries("q_p17_quantile_normalize")(spark, sf0001))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"grid side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sort-merge join:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in plan:\n$plan")
  }

  test("bootstrap CI: pure aggregate chain — no join, no window, no UDF") {
    val plan = executedFinal(SparkEntry.queries("q_p19_bootstrap_ci")(spark, sf0001))
    assert(!plan.contains("Join"), s"bootstrap planned a join:\n$plan")
    assert(!plan.contains("Window"), s"bootstrap planned a window:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in bootstrap plan:\n$plan")
  }

  test("MATTR and JL projection are map-side: no join, no window before the sort") {
    for (name <- Seq("q_x32_mattr", "q_v4_random_projection")) {
      val plan = executedFinal(SparkEntry.queries(name)(spark, sf0001))
      assert(!plan.contains("Join"), s"$name: planned a join:\n$plan")
      assert(!plan.contains("Window"), s"$name: planned a window:\n$plan")
      assert(!plan.contains("UDF"), s"$name: UDF in plan:\n$plan")
    }
  }

  test("skyline: aggregate + one window over distinct scores, no self-join") {
    val plan = executedFinal(SparkEntry.queries("q_o18_skyline")(spark, sf0001))
    assert(!plan.contains("Join"), s"skyline planned the O(n^2) join:\n$plan")
    assert(plan.contains("Window"), s"skyline lost the chain window:\n$plan")
  }

  test("ROC-AUC and Spearman: rank machinery stays codegen, no UDF") {
    for (name <- Seq("q_p23_roc_auc", "q_p25_spearman")) {
      val plan = executedFinal(SparkEntry.queries(name)(spark, sf0001))
      assert(!plan.contains("UDF"), s"$name: UDF in plan:\n$plan")
      assert(plan.contains("HashAggregate"), s"$name: lost the aggregate:\n$plan")
    }
  }

  test("Flesch is pure map-side: no join, no window, regex in codegen") {
    val plan = executedFinal(SparkEntry.queries("q_x36_flesch")(spark, sf0001))
    assert(!plan.contains("Join"), s"flesch planned a join:\n$plan")
    assert(!plan.contains("Window"), s"flesch planned a window:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in flesch plan:\n$plan")
  }

  test("isotropy: linear aggregates only — the n^2 pair join must not exist") {
    val plan = executedFinal(SparkEntry.queries("q_v5_isotropy")(spark, sf0001))
    assert(!plan.contains("SortMergeJoin"), s"pairwise join crept in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in isotropy:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in isotropy plan:\n$plan")
  }

  test("rendezvous sharding: shard fan-out is broadcast, argmax is one aggregate") {
    val plan = executedFinal(SparkEntry.queries("q_o20_rendezvous")(spark, sf0001))
    assert(!plan.contains("SortMergeJoin") || plan.contains("BroadcastExchange"),
      s"shard list not broadcast:\n$plan")
    assert(plan.contains("HashAggregate"), s"argmax lost its aggregate:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in rendezvous plan:\n$plan")
  }

  test("ACF and rich-club: the sweep side is broadcast, never sort-merged with itself") {
    for (name <- Seq("q_t21_acf", "q_g28_richclub")) {
      val plan = executedFinal(SparkEntry.queries(name)(spark, sf0001))
      assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"$name: sweep side not broadcast:\n$plan")
      assert(!plan.contains("UDF"), s"$name: UDF in plan:\n$plan")
    }
  }

  test("OLS and Kruskal–Wallis: pure aggregate/rank machinery, no UDF, no cartesian") {
    for (name <- Seq("q_p27_ols", "q_p28_kruskal")) {
      val plan = executedFinal(SparkEntry.queries(name)(spark, sf0001))
      assert(!plan.contains("UDF"), s"$name: UDF in plan:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name: cartesian:\n$plan")
      assert(plan.contains("HashAggregate"), s"$name: lost the aggregate:\n$plan")
    }
    // OLS specifically is ONE groupBy — no join, no window anywhere
    val ols = executedFinal(SparkEntry.queries("q_p27_ols")(spark, sf0001))
    assert(!ols.contains("Join") && !ols.contains("Window"),
      s"OLS must be a single aggregation pass:\n$ols")
  }

  test("priority sample: top-k plans as TakeOrderedAndProject, no full sort") {
    val plan = executedFinal(
      SparkEntry.queries("q_o21_priority_sample")(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k lost its TakeOrdered plan:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"global sort exchange in the top-k path:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in priority-sample plan:\n$plan")
  }

  test("cross-correlation: lag sweep broadcast, series aligned by hash join") {
    val plan = executedFinal(SparkEntry.queries("q_t22_ccf")(spark, sf0001))
    assert(plan.contains("BroadcastExchange"),
      s"lag dim not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"calendar alignment fell to a cartesian:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in ccf plan:\n$plan")
  }

  test("modularity: membership joins stay equi, only the 1-row m combine is nested-loop") {
    val plan = executedFinal(SparkEntry.queries("q_g29_modularity")(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), s"cartesian in modularity:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in modularity plan:\n$plan")
    assert(plan.contains("HashAggregate"), s"lost the aggregates:\n$plan")
  }

  test("k-means round: seeds broadcast, assignment is an aggregate, no window") {
    val plan = executedFinal(SparkEntry.queries("q_v6_kmeans")(spark, sf0001))
    assert(!plan.contains("SortMergeJoin"), s"seed side not broadcast:\n$plan")
    assert(!plan.contains("Window"), s"argmax fell back to a window:\n$plan")
    assert(plan.contains("HashAggregate"), s"lost the assignment agg:\n$plan")
  }

  test("nDCG and burst dedup: one window + one aggregate, no UDF") {
    val nd = executedFinal(SparkEntry.queries("q_n11_ndcg")(spark, sf0001))
    assert(nd.contains("Window") && nd.contains("HashAggregate") &&
      !nd.contains("UDF"), s"ndcg machinery:\n$nd")
    val bd = executedFinal(SparkEntry.queries("q_t24_burst_dedup")(spark, sf0001))
    assert(bd.contains("Window") && !bd.contains("Join") &&
      !bd.contains("UDF"), s"burst dedup is window+agg only:\n$bd")
  }

  test("calibration and spike screens: single-pass machinery, no UDF") {
    val cal = executedFinal(SparkEntry.queries("q_p30_calibration")(spark, sf0001))
    assert(!cal.contains("Window") && !cal.contains("UDF"),
      s"calibration must be one aggregation pass:\n$cal")
    val sp = executedFinal(SparkEntry.queries("q_t23_spike")(spark, sf0001))
    assert(sp.contains("Window") && !sp.contains("Join") && !sp.contains("UDF"),
      s"spike screen is one window over the daily series:\n$sp")
  }

  test("bitmap distinct: two hash aggregates, no sort, no expand, no UDF") {
    val plan = executedFinal(
      SparkEntry.queries("q_a23_bitmap_distinct")(spark, sf0001))
    assert(plan.contains("HashAggregate"), s"lost the hash agg:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("Expand") &&
      !plan.contains("UDF"), s"bitmap distinct machinery:\n$plan")
  }

  test("Mann–Kendall: day-axis self-join, no window, no UDF") {
    val plan = executedFinal(
      SparkEntry.queries("q_t25_mann_kendall")(spark, sf0001))
    assert(!plan.contains("Window") && !plan.contains("UDF"),
      s"mann–kendall must be join+agg only:\n$plan")
  }

  test("MRR: single aggregate over the ranked top-k, no UDF") {
    val plan = executedFinal(SparkEntry.queries("q_n12_mrr")(spark, sf0001))
    assert(plan.contains("HashAggregate") && !plan.contains("UDF"),
      s"mrr machinery:\n$plan")
  }

  test("JSD and kappa: aggregate machinery only, no window, no UDF") {
    val jsd = executedFinal(SparkEntry.queries("q_p31_jsd")(spark, sf0001))
    assert(jsd.contains("HashAggregate") && !jsd.contains("Window") &&
      !jsd.contains("UDF"), s"jsd machinery:\n$jsd")
    val kap = executedFinal(
      SparkEntry.queries("q_p32_cohens_kappa")(spark, sf0001))
    assert(kap.contains("HashAggregate") && !kap.contains("Join") &&
      !kap.contains("UDF"), s"kappa must be one aggregation pass:\n$kap")
  }

  test("k-center: broadcast rounds end in a 1-row top-k, no UDF") {
    val plan = executedFinal(SparkEntry.queries("q_v7_kcenter")(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"argmin must be a bounded top-k, not a global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("UDF"),
      s"selected set must broadcast:\n$plan")
  }

  test("hamming ANN: packed-long scan, broadcast queries, bounded top-k") {
    val plan = executedFinal(
      SparkEntry.queries("q_n13_hamming_ann")(spark, sf0001))
    assert(plan.contains("TopKPerKey"), s"native top-k missing:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("UDF"),
      s"query side must broadcast, scoring stays codegen:\n$plan")
  }

  test("Simpson diversity: two hash aggregates, no window, no UDF") {
    val plan = executedFinal(SparkEntry.queries("q_x37_simpson")(spark, sf0001))
    assert(plan.contains("HashAggregate") && !plan.contains("Window") &&
      !plan.contains("UDF"), s"simpson machinery:\n$plan")
  }

  test("power iteration: aggregates + equi-join, no window, no UDF") {
    val plan = executedFinal(
      SparkEntry.queries("q_v8_power_iteration")(spark, sf0001))
    assert(plan.contains("HashAggregate") && !plan.contains("Window") &&
      !plan.contains("UDF"), s"power-iteration machinery:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"per-row scores must hash/broadcast join back:\n$plan")
  }

  test("recall curve: one aggregate + broadcast totals, no UDF") {
    val plan = executedFinal(SparkEntry.queries("q_n14_recall")(spark, sf0001))
    assert(plan.contains("HashAggregate") && !plan.contains("UDF"),
      s"recall machinery:\n$plan")
  }

  test("SRM and A/B z-test: aggregate + broadcast machinery, no UDF") {
    val srm = executedFinal(SparkEntry.queries("q_o23_srm")(spark, sf0001))
    assert(srm.contains("HashAggregate") && !srm.contains("SortMergeJoin") &&
      !srm.contains("UDF"), s"srm machinery:\n$srm")
    val z = executedFinal(SparkEntry.queries("q_p34_ab_ztest")(spark, sf0001))
    assert(z.contains("HashAggregate") && !z.contains("Window") &&
      !z.contains("UDF"), s"z-test must be aggregation passes only:\n$z")
  }

  test("up-streaks: windows over the day axis, no join, no UDF") {
    val plan = executedFinal(SparkEntry.queries("q_t26_streaks")(spark, sf0001))
    assert(plan.contains("Window") && !plan.contains("Join") &&
      !plan.contains("UDF"), s"streaks machinery:\n$plan")
  }

  test("nearest as-of: two windows in one pass, never a range join") {
    val plan = executedFinal(
      SparkEntry.queries("q_t27_asof_nearest")(spark, sf0001))
    assert(plan.contains("Window") && !plan.contains("Join") &&
      !plan.contains("UDF"), s"nearest as-of must be window-only:\n$plan")
  }

  test("centroid drift and forecast error: aggregate machinery, no UDF") {
    val cd = executedFinal(
      SparkEntry.queries("q_v9_centroid_drift")(spark, sf0001))
    assert(cd.contains("HashAggregate") && !cd.contains("UDF") &&
      !cd.contains("CartesianProduct"), s"centroid drift machinery:\n$cd")
    val fe = executedFinal(
      SparkEntry.queries("q_t28_forecast_error")(spark, sf0001))
    assert(fe.contains("HashAggregate") && !fe.contains("Window") &&
      !fe.contains("UDF"), s"forecast error machinery:\n$fe")
  }

  test("corr matrix: one scan, one aggregate, no join, no window") {
    val plan = executedFinal(
      SparkEntry.queries("q_p36_corr_matrix")(spark, sf0001))
    assert(plan.contains("HashAggregate") && !plan.contains("Join") &&
      !plan.contains("Window") && !plan.contains("UDF"),
      s"all six correlations must come from a single pass:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size <= 1,
      s"corr matrix must scan lineitem once:\n$plan")
  }

  test("edge Jaccard: equi-joins only, never a cartesian wedge") {
    val plan = executedFinal(
      SparkEntry.queries("q_g32_edge_jaccard")(spark, sf0001))
    assert(plan.contains("HashAggregate") &&
      !plan.contains("CartesianProduct") && !plan.contains("UDF"),
      s"wedge join must stay equi:\n$plan")
  }

  test("mutual info: cells + broadcast margins, no UDF, no cartesian blowup") {
    val plan = executedFinal(
      SparkEntry.queries("q_p37_mutual_info")(spark, sf0001))
    assert(plan.contains("HashAggregate") && !plan.contains("UDF") &&
      !plan.contains("CartesianProduct"), s"mi machinery:\n$plan")
  }

  test("source overlap, McNemar, peaks: bounded join/window machinery") {
    val so = executedFinal(
      SparkEntry.queries("q_x40_source_overlap")(spark, sf0001))
    assert(so.contains("HashAggregate") && !so.contains("CartesianProduct") &&
      !so.contains("UDF"), s"overlap join must stay on the shingle key:\n$so")
    val mc = executedFinal(SparkEntry.queries("q_p43_mcnemar")(spark, sf0001))
    assert(mc.contains("HashAggregate") && !mc.contains("Join") &&
      !mc.contains("UDF"), s"mcnemar is one aggregation pass:\n$mc")
    val pk = executedFinal(SparkEntry.queries("q_t37_peaks")(spark, sf0001))
    assert(pk.contains("Window") && pk.contains("TakeOrderedAndProject") &&
      !pk.contains("UDF"), s"peaks machinery:\n$pk")
  }

  test("rank functions, step latency, hapax: window/agg machinery") {
    val rf = executedFinal(
      SparkEntry.queries("q_w5_rank_functions")(spark, sf0001))
    assert(rf.contains("Window") && !rf.contains("Join") &&
      !rf.contains("UDF"), s"rank functions are one window pass:\n$rf")
    val sl = executedFinal(
      SparkEntry.queries("q_t36_step_latency")(spark, sf0001))
    assert(sl.contains("Window") && !sl.contains("CartesianProduct") &&
      !sl.contains("UDF"), s"step latency machinery:\n$sl")
    val hx = executedFinal(SparkEntry.queries("q_x39_hapax")(spark, sf0001))
    assert(hx.contains("HashAggregate") && !hx.contains("Join") &&
      !hx.contains("UDF"), s"hapax is two hash aggregates:\n$hx")
  }

  test("PPS, SQ distortion, top share: window/aggregate machinery") {
    val pp = executedFinal(SparkEntry.queries("q_o28_pps")(spark, sf0001))
    assert(pp.contains("Window") && !pp.contains("SortMergeJoin") &&
      !pp.contains("UDF"), s"pps machinery:\n$pp")
    val sq = executedFinal(
      SparkEntry.queries("q_v11_sq_distortion")(spark, sf0001))
    assert(sq.contains("HashAggregate") && !sq.contains("Join") &&
      !sq.contains("UDF"), s"sq distortion is one map+agg pass:\n$sq")
    val ts = executedFinal(
      SparkEntry.queries("q_a26_top_decile_share")(spark, sf0001))
    assert(ts.contains("Window") && !ts.contains("Join") &&
      !ts.contains("UDF"), s"top share machinery:\n$ts")
  }

  test("dedup yield, cumulative uniques, moments: window/agg machinery") {
    val dy = executedFinal(
      SparkEntry.queries("q_d13_dedup_yield")(spark, sf0001))
    assert(dy.contains("Window") && !dy.contains("Join") &&
      !dy.contains("UDF"), s"yield is one keyed window + agg:\n$dy")
    val cu = executedFinal(
      SparkEntry.queries("q_t35_cumulative_uniques")(spark, sf0001))
    assert(cu.contains("Window") && !cu.contains("SortMergeJoin") &&
      !cu.contains("UDF"), s"cumulative uniques machinery:\n$cu")
    val mo = executedFinal(SparkEntry.queries("q_p42_moments")(spark, sf0001))
    assert(mo.contains("HashAggregate") && !mo.contains("Join") &&
      !mo.contains("UDF"), s"moments is one aggregation pass:\n$mo")
  }

  test("mutual kNN, templates, Katz: equi-join/aggregate machinery") {
    // the knn side materializes via localCheckpoint, so the final plan
    // shows only the stats tail — assert it stays aggregate-only
    val mk = executedFinal(
      SparkEntry.queries("q_n16_mutual_knn")(spark, sf0001))
    assert(mk.contains("HashAggregate") && !mk.contains("UDF") &&
      !mk.contains("SortMergeJoin"), s"mutual knn machinery:\n$mk")
    val tp = executedFinal(
      SparkEntry.queries("q_x38_template_prefixes")(spark, sf0001))
    assert(tp.contains("HashAggregate") && !tp.contains("Join") &&
      !tp.contains("UDF"), s"template machinery is one map+agg:\n$tp")
    val kz = executedFinal(SparkEntry.queries("q_g36_katz")(spark, sf0001))
    assert(kz.contains("HashAggregate") &&
      !kz.contains("CartesianProduct") && !kz.contains("UDF"),
      s"katz machinery:\n$kz")
  }

  test("label prop, Neyman, binseg: bounded argmax/window machinery") {
    val lp = executedFinal(
      SparkEntry.queries("q_g35_label_prop")(spark, sf0001))
    assert(lp.contains("TopKPerKey") && !lp.contains("CartesianProduct") &&
      !lp.contains("UDF"), s"label prop machinery:\n$lp")
    val ne = executedFinal(SparkEntry.queries("q_o27_neyman")(spark, sf0001))
    assert(ne.contains("HashAggregate") && !ne.contains("SortMergeJoin") &&
      !ne.contains("UDF"), s"neyman machinery:\n$ne")
    val bs = executedFinal(SparkEntry.queries("q_t34_binseg")(spark, sf0001))
    assert(bs.contains("Window") && bs.contains("TakeOrderedAndProject") &&
      !bs.contains("UDF"), s"binseg machinery:\n$bs")
  }

  test("survival, checksum, Durbin–Watson: expected machinery, no UDF") {
    val km = executedFinal(SparkEntry.queries("q_t33_survival")(spark, sf0001))
    assert(km.contains("Window") && !km.contains("CartesianProduct") &&
      !km.contains("UDF"), s"KM machinery:\n$km")
    val ck = executedFinal(
      SparkEntry.queries("q_s_table_checksum")(spark, sf0001))
    assert(ck.contains("HashAggregate") && !ck.contains("Join") &&
      !ck.contains("UDF"), s"checksum is one aggregation pass:\n$ck")
    val dw = executedFinal(
      SparkEntry.queries("q_p41_durbin_watson")(spark, sf0001))
    assert(dw.contains("Window") && !dw.contains("UDF"),
      s"durbin-watson machinery:\n$dw")
  }

  test("tiered rerank: broadcast tiers, bounded top-k, no sort-merge") {
    val plan = executedFinal(
      SparkEntry.queries("q_n15_tiered_rerank")(spark, sf0001))
    assert(plan.contains("TopKPerKey") && !plan.contains("SortMergeJoin") &&
      !plan.contains("UDF"), s"tiered rerank machinery:\n$plan")
  }

  test("max cover and Cohen's d: aggregate machinery, no cartesian") {
    val mc = executedFinal(SparkEntry.queries("q_o26_max_cover")(spark, sf0001))
    assert(mc.contains("TakeOrderedAndProject") &&
      !mc.contains("CartesianProduct"), s"max cover machinery:\n$mc")
    val cd = executedFinal(SparkEntry.queries("q_p40_cohens_d")(spark, sf0001))
    assert(cd.contains("HashAggregate") && !cd.contains("Join") &&
      !cd.contains("UDF"), s"cohens d machinery:\n$cd")
  }

  test("DAU/WAU and periodogram: bounded fan-outs, no UDF") {
    val dw = executedFinal(SparkEntry.queries("q_t31_dau_wau")(spark, sf0001))
    assert(dw.contains("HashAggregate") && !dw.contains("SortMergeJoin") &&
      !dw.contains("UDF"), s"dau/wau machinery:\n$dw")
    val pg = executedFinal(
      SparkEntry.queries("q_t32_periodogram")(spark, sf0001))
    assert(pg.contains("HashAggregate") && !pg.contains("UDF"),
      s"periodogram machinery:\n$pg")
  }

  test("partial correlation inherits the single-scan corr matrix") {
    val plan = executedFinal(
      SparkEntry.queries("q_p39_partial_corr")(spark, sf0001))
    assert("Scan parquet".r.findAllIn(plan).size <= 1 &&
      !plan.contains("UDF"), s"partial corr must scan lineitem once:\n$plan")
  }

  test("MV merge and decay attribution: hash joins/aggregates, no UDF") {
    val mv = executedFinal(SparkEntry.queries("q_s_mv_merge")(spark, sf0001))
    assert(mv.contains("HashAggregate") && !mv.contains("Join") &&
      !mv.contains("UDF"), s"mv merge is union+re-aggregate only:\n$mv")
    val da = executedFinal(
      SparkEntry.queries("q_t30_decay_attribution")(spark, sf0001))
    assert(da.contains("HashAggregate") &&
      !da.contains("CartesianProduct") && !da.contains("UDF"),
      s"decay pairing must stay equi+range:\n$da")
  }

  test("join cardinality: sketches join, never a cartesian") {
    val plan = executedFinal(
      SparkEntry.queries("q_j13_join_cardinality")(spark, sf0001))
    assert(plan.contains("HashAggregate") &&
      !plan.contains("CartesianProduct") && !plan.contains("UDF"),
      s"cms join cardinality machinery:\n$plan")
  }

  test("balance labels: one label window, broadcast minority count") {
    val plan = executedFinal(
      SparkEntry.queries("q_o25_balance_labels")(spark, sf0001))
    assert(plan.contains("Window") && !plan.contains("SortMergeJoin") &&
      !plan.contains("UDF"), s"balance machinery:\n$plan")
  }

  test("rank-1 energy and Wilson: aggregate chains, no UDF") {
    val re = executedFinal(
      SparkEntry.queries("q_v10_rank1_energy")(spark, sf0001))
    assert(re.contains("HashAggregate") && !re.contains("UDF"),
      s"rank-1 energy machinery:\n$re")
    val wi = executedFinal(SparkEntry.queries("q_p38_wilson")(spark, sf0001))
    assert(wi.contains("HashAggregate") && !wi.contains("Window") &&
      !wi.contains("UDF"), s"wilson machinery:\n$wi")
  }

  test("ANOVA and chrono split: aggregate/window machinery, no UDF") {
    val an = executedFinal(SparkEntry.queries("q_p35_anova_f")(spark, sf0001))
    assert(an.contains("HashAggregate") && !an.contains("Join") &&
      !an.contains("UDF"), s"anova machinery:\n$an")
    val cs = executedFinal(
      SparkEntry.queries("q_o24_chrono_split")(spark, sf0001))
    assert(cs.contains("HashAggregate") && !cs.contains("SortMergeJoin") &&
      !cs.contains("UDF"), s"chrono split machinery:\n$cs")
  }

  test("drawdown, Jarque-Bera, neighbor degree: window/agg/join machinery") {
    val dd = executedFinal(
      SparkEntry.queries("q_t38_max_drawdown")(spark, sf0001))
    assert(dd.contains("Window") && dd.contains("TakeOrderedAndProject") &&
      !dd.contains("Join") && !dd.contains("UDF"),
      s"drawdown is one bounded window + top-1:\n$dd")
    val jb = executedFinal(
      SparkEntry.queries("q_p44_jarque_bera")(spark, sf0001))
    assert(jb.contains("HashAggregate") && !jb.contains("Join") &&
      !jb.contains("UDF"), s"jarque-bera is one aggregation pass:\n$jb")
    val nd = executedFinal(
      SparkEntry.queries("q_g37_neighbor_degree")(spark, sf0001))
    assert(nd.contains("HashAggregate") && !nd.contains("CartesianProduct") &&
      !nd.contains("UDF"), s"knn(k) equi-join machinery:\n$nd")
  }

  test("MAP, Yule's K, Brown-Forsythe: window/agg machinery, no UDF") {
    val ap = executedFinal(SparkEntry.queries("q_n17_map")(spark, sf0001))
    assert(ap.contains("Window") && !ap.contains("UDF"),
      s"AP cumulative-hit window machinery:\n$ap")
    val yk = executedFinal(SparkEntry.queries("q_x41_yules_k")(spark, sf0001))
    assert(yk.contains("HashAggregate") && !yk.contains("Join") &&
      !yk.contains("UDF"), s"yules k is two aggregation passes:\n$yk")
    val bf = executedFinal(
      SparkEntry.queries("q_p45_brown_forsythe")(spark, sf0001))
    assert(bf.contains("Window") && bf.contains("HashAggregate") &&
      !bf.contains("CartesianProduct") && !bf.contains("UDF"),
      s"brown-forsythe median window + broadcast-back machinery:\n$bf")
  }

  test("mode, longest gap, rolling median: window machinery, no join") {
    val mo = executedFinal(SparkEntry.queries("q_a27_mode")(spark, sf0001))
    assert(mo.contains("Window") && mo.contains("HashAggregate") &&
      !mo.contains("Join") && !mo.contains("UDF"),
      s"mode top-1 window over the value grid:\n$mo")
    // post-refit onto OrderedPrefix the global rank is a partitioned
    // window + a broadcast offsets join-back — a hash join is now
    // expected; a sort-merge join would mean the tiny offsets side
    // shuffled
    val lg = executedFinal(
      SparkEntry.queries("q_t39_longest_gap")(spark, sf0001))
    assert(lg.contains("Window") && !lg.contains("SortMergeJoin") &&
      !lg.contains("UDF"), s"longest gap machinery:\n$lg")
    val rm = executedFinal(
      SparkEntry.queries("q_t40_rolling_median")(spark, sf0001))
    assert(rm.contains("Window") && !rm.contains("Join") &&
      !rm.contains("UDF"), s"rolling median machinery:\n$rm")
  }

  test("dim stats, ntile, argmax: explode/window/agg machinery, no UDF") {
    val ds = executedFinal(SparkEntry.queries("q_v12_dim_stats")(spark, sf0001))
    assert(ds.contains("HashAggregate") && ds.contains("Generate") &&
      !ds.contains("Join") && !ds.contains("UDF"),
      s"dim stats posexplode + one agg:\n$ds")
    val nt = executedFinal(SparkEntry.queries("q_w6_ntile")(spark, sf0001))
    assert(nt.contains("Window") && !nt.contains("Join") &&
      !nt.contains("UDF"), s"ntile one window pass:\n$nt")
    // struct-typed max falls back to SortAggregate (no hash support for
    // struct buffers) — still partial_max map-side, which is the part
    // that matters at scale
    val am = executedFinal(SparkEntry.queries("q_a28_argmax")(spark, sf0001))
    assert(am.contains("partial_max") && !am.contains("Window") &&
      !am.contains("Join") && !am.contains("UDF"),
      s"argmax is one struct-max aggregate with map-side combine:\n$am")
  }

  test("runs test, k-fold, transitivity: bounded window/agg/join shapes") {
    val rt = executedFinal(SparkEntry.queries("q_t41_runs_test")(spark, sf0001))
    assert(rt.contains("Window") && !rt.contains("SortMergeJoin") &&
      !rt.contains("UDF"), s"runs test calendar-window machinery:\n$rt")
    val kf = executedFinal(SparkEntry.queries("q_o29_kfold")(spark, sf0001))
    assert(kf.contains("HashAggregate") && !kf.contains("Join") &&
      !kf.contains("Window") && !kf.contains("UDF"),
      s"kfold is one map-side projection + agg:\n$kf")
    val tr = executedFinal(
      SparkEntry.queries("q_g38_transitivity")(spark, sf0001))
    assert(tr.contains("HashAggregate") && !tr.contains("UDF"),
      s"transitivity triangle-join machinery:\n$tr")
    val mst = executedFinal(SparkEntry.queries("q_g39_mst")(spark, sf0001))
    assert(!mst.contains("CartesianProduct") && !mst.contains("UDF"),
      s"boruvka msf result must stay relational:\n$mst")
  }

  test("path trace, WoW growth, centroid eval: bounded machinery") {
    val sp = executedFinal(
      SparkEntry.queries("q_g40_shortest_path")(spark, sf0001))
    assert(!sp.contains("CartesianProduct") && !sp.contains("UDF"),
      s"path trace stays relational:\n$sp")
    val wg = executedFinal(
      SparkEntry.queries("q_t42_wow_growth")(spark, sf0001))
    assert(wg.contains("Window") && !wg.contains("Join") &&
      !wg.contains("UDF"), s"wow growth one lag window:\n$wg")
    val ce = executedFinal(
      SparkEntry.queries("q_n18_centroid_eval")(spark, sf0001))
    assert(ce.contains("BroadcastNestedLoopJoin") &&
      !ce.contains("SortMergeJoin") && !ce.contains("UDF"),
      s"centroid scoring broadcasts the label dim:\n$ce")
  }

  test("group percentiles, median anomaly, dup sizes: bounded shapes") {
    val gp = executedFinal(
      SparkEntry.queries("q_a30_group_percentiles")(spark, sf0001))
    assert(gp.contains("Window") && !gp.contains("Join") &&
      !gp.contains("UDF"), s"grouped order statistics one window:\n$gp")
    val ma = executedFinal(
      SparkEntry.queries("q_t43_median_anomaly")(spark, sf0001))
    assert(ma.contains("Window") && ma.contains("BroadcastNestedLoopJoin") &&
      !ma.contains("SortMergeJoin") && !ma.contains("UDF"),
      s"median anomaly calendar windows + scalar broadcast:\n$ma")
    val dc = executedFinal(
      SparkEntry.queries("q_d14_dup_cluster_sizes")(spark, sf0001))
    assert(dc.contains("HashAggregate") && !dc.contains("CartesianProduct") &&
      !dc.contains("UDF"), s"cluster sizes agg machinery:\n$dc")
  }

  test("rolling DAU, rebalance, cosine profile: explode/join/agg shapes") {
    val rd = executedFinal(
      SparkEntry.queries("q_t44_rolling_dau")(spark, sf0001))
    assert(rd.contains("Generate") && rd.contains("HashAggregate") &&
      !rd.contains("CartesianProduct") && !rd.contains("UDF"),
      s"coverage expansion + countDistinct:\n$rd")
    val rb = executedFinal(
      SparkEntry.queries("q_o31_shard_rebalance")(spark, sf0001))
    assert(rb.contains("HashAggregate") && !rb.contains("CartesianProduct") &&
      !rb.contains("UDF"), s"rebalance argmax + equi-join:\n$rb")
    val cp = executedFinal(
      SparkEntry.queries("q_v13_cosine_profile")(spark, sf0001))
    assert(cp.contains("HashAggregate") && !cp.contains("CartesianProduct") &&
      !cp.contains("UDF"), s"cosine profile id-join + agg:\n$cp")
  }

  test("betweenness: relational BFS + backprop, no cartesian, no UDF") {
    val bw = executedFinal(
      SparkEntry.queries("q_g41_betweenness")(spark, sf0001))
    assert(bw.contains("HashAggregate") && !bw.contains("CartesianProduct") &&
      !bw.contains("UDF"), s"brandes machinery:\n$bw")
  }

  test("calendar gaps, Ljung-Box, triplet eval: bounded machinery") {
    val cg = executedFinal(
      SparkEntry.queries("q_t45_calendar_gaps")(spark, sf0001))
    assert(cg.contains("Generate") && !cg.contains("CartesianProduct") &&
      !cg.contains("UDF"), s"calendar spine explode + anti-join:\n$cg")
    val lb = executedFinal(
      SparkEntry.queries("q_t46_ljung_box")(spark, sf0001))
    assert(lb.contains("HashAggregate") && !lb.contains("SortMergeJoin") &&
      !lb.contains("UDF"), s"ljung-box acf + one closing agg:\n$lb")
    val te = executedFinal(
      SparkEntry.queries("q_v14_triplet_eval")(spark, sf0001))
    assert(te.contains("Window") && !te.contains("CartesianProduct") &&
      !te.contains("UDF"), s"triplet lead-window + id joins:\n$te")
  }

  test("textrank and cluster purity: rank/assign machinery, no UDF") {
    val tr = executedFinal(SparkEntry.queries("q_x42_textrank")(spark, sf0001))
    assert(tr.contains("TakeOrderedAndProject") &&
      !tr.contains("CartesianProduct") && !tr.contains("UDF"),
      s"textrank pagerank + bounded top-k:\n$tr")
    val cp = executedFinal(
      SparkEntry.queries("q_v15_cluster_purity")(spark, sf0001))
    assert(cp.contains("Window") && cp.contains("BroadcastNestedLoopJoin") &&
      !cp.contains("SortMergeJoin") && !cp.contains("UDF"),
      s"purity broadcast assignment + rank window:\n$cp")
  }

  test("two-way ANOVA and Welch t: one cell-grid pass, no UDF") {
    val ta = executedFinal(
      SparkEntry.queries("q_p46_two_way_anova")(spark, sf0001))
    assert(ta.contains("HashAggregate") && !ta.contains("SortMergeJoin") &&
      !ta.contains("UDF"), s"two-way cell-grid machinery:\n$ta")
    val wt = executedFinal(SparkEntry.queries("q_p47_welch_t")(spark, sf0001))
    assert(wt.contains("HashAggregate") && !wt.contains("Join") &&
      !wt.contains("UDF"), s"welch is one aggregation pass:\n$wt")
  }

  test("Cochran-Armitage and style cosine: agg/key-join machinery") {
    val ca = executedFinal(
      SparkEntry.queries("q_p48_cochran_armitage")(spark, sf0001))
    assert(ca.contains("HashAggregate") && !ca.contains("Join") &&
      !ca.contains("UDF"), s"trend test is two aggregation passes:\n$ca")
    val sc = executedFinal(
      SparkEntry.queries("q_x43_style_cosine")(spark, sf0001))
    assert(sc.contains("HashAggregate") && !sc.contains("CartesianProduct") &&
      !sc.contains("UDF"), s"style cosine joins on the bigram key:\n$sc")
  }

  test("clustering null and top paths: agg/window machinery, no UDF") {
    val cn = executedFinal(
      SparkEntry.queries("q_g42_clustering_null")(spark, sf0001))
    assert(cn.contains("HashAggregate") && !cn.contains("UDF"),
      s"null-model compare machinery:\n$cn")
    val tp = executedFinal(SparkEntry.queries("q_t47_top_paths")(spark, sf0001))
    assert(tp.contains("Window") && tp.contains("TakeOrderedAndProject") &&
      !tp.contains("Join") && !tp.contains("UDF"),
      s"top paths session windows + bounded top-N:\n$tp")
  }

  test("source impact, degree powerlaw, hist2d: agg machinery, no UDF") {
    val si = executedFinal(
      SparkEntry.queries("q_d15_dedup_source_impact")(spark, sf0001))
    assert(si.contains("HashAggregate") && !si.contains("CartesianProduct") &&
      !si.contains("UDF"), s"source impact before/after aggs:\n$si")
    val dp = executedFinal(
      SparkEntry.queries("q_g43_degree_powerlaw")(spark, sf0001))
    assert(dp.contains("HashAggregate") && !dp.contains("UDF"),
      s"degree powerlaw agg chain:\n$dp")
    val h2 = executedFinal(SparkEntry.queries("q_a32_hist2d")(spark, sf0001))
    assert(h2.contains("HashAggregate") && !h2.contains("Join") &&
      !h2.contains("UDF"), s"hist2d one aggregation:\n$h2")
  }

  test("markov stationary and cell balance: iteration/agg shapes") {
    // the power steps materialize per-round (localCheckpoint), so the
    // final plan is just the bounded state scan + rounding
    val ms = executedFinal(
      SparkEntry.queries("q_t48_markov_stationary")(spark, sf0001))
    assert(ms.contains("ExistingRDD") && !ms.contains("CartesianProduct") &&
      !ms.contains("UDF"), s"stationary closing scan:\n$ms")
    val cb = executedFinal(
      SparkEntry.queries("q_n20_cell_balance")(spark, sf0001))
    assert(cb.contains("HashAggregate") && !cb.contains("Join") &&
      !cb.contains("SCALA_UDF"), s"cell balance one agg over cells:\n$cb")
  }

  test("waterfill and shingle profile: scalar-broadcast/agg shapes") {
    val wf = executedFinal(SparkEntry.queries("q_o32_waterfill")(spark, sf0001))
    assert(!wf.contains("SortMergeJoin") && !wf.contains("UDF"),
      s"waterfill source-dim machinery:\n$wf")
    val sp = executedFinal(
      SparkEntry.queries("q_d16_shingle_df_profile")(spark, sf0001))
    assert(sp.contains("HashAggregate") && sp.contains("Generate") &&
      !sp.contains("Join") && !sp.contains("UDF"),
      s"shingle profile explode + two aggs:\n$sp")
  }

  test("punchcard and markov entropy: agg/closing-join shapes") {
    val pc = executedFinal(SparkEntry.queries("q_t49_punchcard")(spark, sf0001))
    assert(pc.contains("HashAggregate") && !pc.contains("Join") &&
      !pc.contains("UDF"), s"punchcard one aggregation:\n$pc")
    val me = executedFinal(
      SparkEntry.queries("q_p49_markov_entropy")(spark, sf0001))
    assert(me.contains("HashAggregate") && !me.contains("CartesianProduct") &&
      !me.contains("UDF"), s"entropy closing agg over the tiny chain:\n$me")
    val cr = executedFinal(
      SparkEntry.queries("q_g44_component_report")(spark, sf0001))
    assert(cr.contains("HashAggregate") && !cr.contains("CartesianProduct") &&
      !cr.contains("UDF"), s"component report join + argmax agg:\n$cr")
    val fc = executedFinal(
      SparkEntry.queries("q_p50_fisher_ci")(spark, sf0001))
    assert(fc.contains("HashAggregate") && !fc.contains("SortMergeJoin") &&
      !fc.contains("UDF"), s"fisher ci one-scan corr + map chain:\n$fc")
    val st = executedFinal(
      SparkEntry.queries("q_t50_seasonal_strength")(spark, sf0001))
    assert(st.contains("Window") && st.contains("HashAggregate") &&
      !st.contains("UDF"), s"seasonal strength decompose + one agg:\n$st")
  }

  test("round-7 additions: expected machinery, no UDF, no cartesian") {
    for (q <- Seq("q_g45_louvain", "q_n22_ivfpq", "q_x44_repetition",
        "q_x45_luhn", "q_c6_domain_blocklist", "q_f17_record_linkage",
        "q_x46_calibration")) {
      val plan = executedFinal(SparkEntry.queries(q)(spark, sf0001))
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        s"$q has a UDF in the plan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q degenerated to a cross product:\n$plan")
    }
    // the blocklist predicate is map-side: the only exchange is the
    // final per-source aggregation's
    val bl = executedFinal(
      SparkEntry.queries("q_c6_domain_blocklist")(spark, sf0001))
    val blExchanges = "Exchange hashpartitioning".r.findAllIn(bl).size
    assert(blExchanges == 1,
      s"blocklist filter must not shuffle before the agg ($blExchanges):\n$bl")
    // repetition stats: text reduces to (doc_id, gram) before any
    // exchange — no window over data-sized partitions
    val rep = executedFinal(
      SparkEntry.queries("q_x44_repetition")(spark, sf0001))
    assert(rep.contains("HashAggregate") && !rep.contains("Window"),
      s"dup-ngram stats is pure aggregation:\n$rep")
  }

  test("round-7 wave 3-4: expected machinery, no UDF, no cartesian blowup") {
    for (q <- Seq("q_t51_funnel", "q_s12_pseudonymize", "q_t52_conformal",
        "q_o33_split_leak_audit", "q_x47_fertility", "q_x48_confusion",
        "q_n23_knn_outliers", "q_ep3_corpus_card")) {
      val plan = executedFinal(SparkEntry.queries(q)(spark, sf0001))
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        s"$q has a UDF in the plan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q degenerated to a cross product:\n$plan")
    }
    // fertility and confusion are one aggregation pass each: the
    // fused TokenStats kernel means text is read once per row
    val fert = executedFinal(SparkEntry.queries("q_x47_fertility")(spark, sf0001))
    assert(fert.contains("HashAggregate") && !fert.contains("Join"),
      s"fertility is one scan + agg:\n$fert")
    // pseudonymize: the token is computed map-side (project), the
    // only joins are the two count faces
    val ps = executedFinal(SparkEntry.queries("q_s12_pseudonymize")(spark, sf0001))
    assert(!ps.contains("SortMergeJoin"),
      s"pseudonymize joins should hash:\n$ps")
  }

  // ---- distributed ordered-selection / prefix-sum (round 8) ----

  /** Every physical node, descending through AQE wrappers and query
    * stages (plain `collect` stops at AdaptiveSparkPlanExec). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  test("order-statistic gates: every unpartitioned window is partition-count-sized") {
    // The four round-7 perf_weak gates used to sort a DATA-sized row
    // set in one unpartitioned window task. Post-refit onto
    // OrderedPrefix, the only legal unpartitioned windows left in
    // these plans are the offset windows over the per-range-partition
    // totals — input bounded by the CLUSTER (one row per shuffle
    // partition), recognizable by the __op_pid grouping beneath them.
    val gates = Seq("q_o28_pps", "q_t36_step_latency",
      "q_t39_longest_gap", "q_g17_negative_samples")
    for (q <- gates) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val wins = allNodes(df.queryExecution.executedPlan)
        .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      val global = wins.filter(_.partitionSpec.isEmpty)
      for (w <- global) {
        val bounded = allNodes(w.child).exists {
          case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
            h.groupingExpressions.exists(_.toString.contains("__op_pid"))
          case h: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
            h.groupingExpressions.exists(_.toString.contains("__op_pid"))
          case h: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
            h.groupingExpressions.exists(_.toString.contains("__op_pid"))
          case _ => false
        }
        assert(bounded,
          s"$q: unpartitioned window over non-pid-aggregated (data-sized?) input:\n$w")
      }
    }
  }

  /** Does this physical plan contain an unpartitioned WindowExec whose
    * input is NOT bounded by an OrderedPrefix `__op_pid` aggregate
    * (one row per shuffle partition — cluster-sized, never
    * data-sized)? Returns the offending window nodes. */
  private def unboundedGlobalWindows(
      p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    def pidBounded(w: org.apache.spark.sql.execution.window.WindowExec) =
      allNodes(w.child).exists {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
          h.groupingExpressions.exists(_.toString.contains("__op_pid"))
        case h: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
          h.groupingExpressions.exists(_.toString.contains("__op_pid"))
        case h: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
          h.groupingExpressions.exists(_.toString.contains("__op_pid"))
        case _ => false
      }
    allNodes(p)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      .filter(_.partitionSpec.isEmpty)
      .filterNot(pidBounded)
  }

  test("suite sweep: no gate plans a data-sized unpartitioned window") {
    // r7 found four gates and r8 found six more that funneled a
    // data-sized row set through ONE unpartitioned window task — each
    // time because a new operator re-decided the question. This sweep
    // makes the class structurally impossible: EVERY gate plan is
    // walked, and an unpartitioned WindowExec is legal only when (a)
    // its input is the OrderedPrefix per-partition-totals aggregate
    // (≤ shuffle-partition rows) or (b) the gate is on the explicit
    // allowlist below with a written proof of why its axis is bounded
    // BY CONSTRUCTION. Adding a name here is a reviewed decision, not
    // a default.
    val boundedAxis: Map[String, String] = Map(
      // fixed bucket / grid axes — window input is a constant-sized
      // aggregate regardless of corpus size
      "q_a17_histogram" -> "fixed-width histogram buckets (constant bucket count)",
      "q_x35_heaps" -> "10 ingest-order deciles (log-spaced checkpoints)",
      "q_g33_hop_histogram" -> "BFS hop-distance axis, <= k pinned rounds",
      "q_o18_skyline" -> "distinct 4-dp-rounded quality scores, <= 10^4 grid points",
      // calendar axes — input pre-aggregated to days/hours BEFORE the
      // window; bounded by the time span, never the corpus
      "q_o24_chrono_split" -> "daily counts (to_date groupBy first)",
      "q_p41_durbin_watson" -> "daily-trend residuals (days axis)",
      "q_t19_seasonal" -> "hourly series (calendar hours)",
      "q_t23_spike" -> "daily series",
      "q_t26_streaks" -> "daily series",
      "q_t33_survival" -> "durations in whole days, <= calendar span",
      "q_t34_binseg" -> "daily series",
      "q_t35_cumulative_uniques" -> "daily first-seen counts",
      "q_t37_peaks" -> "daily series",
      "q_t38_max_drawdown" -> "daily series",
      "q_t40_rolling_median" -> "daily series",
      "q_t41_runs_test" -> "daily series",
      "q_t42_wow_growth" -> "weekly series",
      "q_t43_median_anomaly" -> "daily series",
      "q_t45_calendar_gaps" -> "daily series",
      "q_t50_seasonal_strength" -> "hourly series",
      "q_t52_conformal" -> "daily-trend calibration residuals (days axis)",
      // group axes — one row per group, groups are a dimension
      "q_o19_apportion" -> "one row per source (dimension-sized)",
      "q_o27_neyman" -> "one row per stratum (dimension-sized)",
      "q_p21_gini" -> "one row per source (dimension-sized)",
      "q_p26_weighted_median" -> "group-start offsets: one row per group (dimension-sized); the data-sized cumsum runs on OrderedPrefix",
      // top-k axes — inputs are LIMIT-ed lists by construction
      "q_n6_rrf_fusion" -> "fuses two top-100 lists (<= 200 rows)",
      // series-derived pair axes — bounded by the pre-aggregated
      // series length squared (~2.4k days -> ~2.9M pairs), documented
      // in theilSen's scaladoc as the documented-small class
      "q_p29_theil_sen" -> "pairwise slopes of the daily series (days^2)")
    val stale = boundedAxis.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist names unknown gates: $stale")
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val unused = scala.collection.mutable.Set[String](boundedAxis.keys.toSeq: _*)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val dfOpt =
        try Some(fn(spark, sf0001))
        catch { case e: Throwable =>
          failures += s"$name: gate failed to build: ${e.getMessage}"
          None
        }
      dfOpt.foreach { df =>
        val plan = df.queryExecution.executedPlan
        val bad = unboundedGlobalWindows(plan)
        if (bad.nonEmpty) unused -= name
        if (bad.nonEmpty && !boundedAxis.contains(name))
          failures += s"$name: ${bad.size} unpartitioned window(s) over " +
            s"non-pid-bounded input; first: ${bad.head.windowExpression.mkString(",")}"
        // two more scale-killer classes, suite-wide: a true cartesian
        // (both sides data-sized — crossJoin(broadcast(1-row)) plans
        // as BroadcastNestedLoopJoin and stays legal) and any UDF
        // (breaks whole-stage codegen; this repo is zero-UDF by
        // charter)
        val nodes = allNodes(plan)
        if (nodes.exists(_.isInstanceOf[
            org.apache.spark.sql.execution.joins.CartesianProductExec]))
          failures += s"$name: CartesianProduct in the physical plan"
        val planStr = plan.toString
        if (planStr.contains("ScalaUDF") || planStr.contains("BatchEvalPython"))
          failures += s"$name: UDF node in the physical plan"
        // third scale-killer class: a final TopKPerKeyExec whose
        // required key shuffle is NOT fed by the map-side partial
        // stage — the exchange then carries the full scored stream
        // (the r10 sf10 recall baseline shuffled ~5·10^10 rows this
        // way and ENOSPC'd). The two-stage plan is the operator's
        // contract; this sweep makes silently reintroducing the
        // single-stage shape impossible.
        for (t <- nodes.collect { case t: graft.plans.TopKPerKeyExec => t })
          if (!allNodes(t.child).exists(
              _.isInstanceOf[graft.plans.PartialTopKPerKeyExec]))
            failures += s"$name: TopKPerKeyExec without a map-side " +
              "PartialTopKPerKeyExec below its exchange (unbounded shuffle)"
      }
    }
    assert(failures.isEmpty,
      s"data-sized unpartitioned windows (add to allowlist ONLY with a boundedness proof):\n" +
        failures.mkString("\n"))
    // an entry whose gate no longer plans an unpartitioned window is
    // stale — prune it so the allowlist stays an honest audit record
    assert(unused.isEmpty, s"allowlist entries no longer needed: $unused")
  }

  test("OrderedPrefix: local cumsum window is partitioned by the range-partition id") {
    val df = spark.range(1000).selectExpr("concat('k', id) AS id", "id % 7 + 1 AS w")
    val out = graft.ext.OrderedPrefix.withPrefixSum(df, Seq($"id"), $"w", "c", 8)
    out.collect()
    val wins = allNodes(out.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.exists(_.partitionSpec.exists(_.toString.contains("__op_pid"))),
      "expected a __op_pid-partitioned local window")
    assert(wins.filter(_.partitionSpec.isEmpty).forall(w =>
      allNodes(w.child).exists {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
          h.groupingExpressions.exists(_.toString.contains("__op_pid"))
        case _ => false
      }), "unpartitioned window not bounded by the pid aggregate")
  }
}
