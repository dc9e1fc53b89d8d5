package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (driver extension, SURVEY §7 module 6): language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * Everything here is a pure Column expression (no UDFs), so the
  * operators stay inside Catalyst: they push down, prune, and codegen
  * like any built-in, and each one has an exact DuckDB-SQL oracle.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty strings dropped). Used
    * where the actual token array is needed (shingles, TF-IDF
    * explode); scalar statistics over the tokens go through
    * [[stats]] instead — the HOF lambda here gets fresh variable ids
    * per copy, which defeats codegen subexpression elimination. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Fused one-pass token statistics (codegen kernel,
    * [[graft.functions.TextStats]]): `[n_tokens, sum_token_len,
    * hits_de, hits_en, hits_es, hits_fr, hits_zh]`. Every scalar
    * text metric below derives from this SAME lambda-free subtree,
    * so whole-stage codegen computes it once per row no matter how
    * many metric columns a projection asks for. */
  private def stats(text: Column): Column =
    graft.functions.TextStats.tokenStats(text)
  private def nTokens(text: Column): Column = element_at(stats(text), 1)
  private def sumTokenLen(text: Column): Column = element_at(stats(text), 2)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = nTokens(text)

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alnum marks each count as one token (the regex stands in for
    * a merged-vocab tokenizer at the same asymptotics). */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** n-gram word shingles joined with single spaces; empty array when
    * the document has fewer than n tokens (null text included, for
    * parity with the old Column formulation). Fused codegen kernel
    * ([[graft.functions.ShingleKernel]]) — the HOF formulation
    * re-walked the token array per shingle, interpreted, and its
    * lambda ids defeated CSE (the TokenStats/MinHash mechanism). */
  def shingles(text: Column, n: Int): Column =
    coalesce(graft.functions.TextStats.shingles(text, n),
      array().cast("array<string>"))

  /** Tiny per-language stopword lists for the n-gram language-ID
    * heuristic (canonical copy lives in the codegen kernel,
    * [[graft.functions.TokenStatsKernel.StopwordLists]], so the
    * fused path and this surface can't drift). Deterministic and
    * oracle-able; swap for real frequency profiles in production. */
  val Stopwords: Map[String, Seq[String]] =
    graft.functions.TokenStatsKernel.StopwordLists

  private def stopwordHits(text: Column, lang: String): Column = {
    val idx = graft.functions.TokenStatsKernel.Langs.indexOf(lang)
    require(idx >= 0, s"unknown language '$lang'")
    element_at(stats(text), 3 + idx)
  }

  /** Language-ID heuristic: argmax of stopword hits, alphabetical
    * tie-break, "und" (undetermined) when nothing matches. The hits
    * all come from one [[stats]] kernel call (CSE-merged), so this is
    * a single tokenize pass per row, fully codegen'd. */
  def langId(text: Column): Column = {
    val langs = graft.functions.TokenStatsKernel.Langs.toSeq // de,en,es,fr,zh
    val hits = langs.map(l => stopwordHits(text, l))
    val best = greatest(hits: _*)
    val pairs = langs.zip(hits)
    pairs.tail.foldLeft(when(best > 0 && pairs.head._2 === best, lit(pairs.head._1))) {
      case (acc, (l, h)) => acc.when(best > 0 && h === best, lit(l))
    }.otherwise(lit("und"))
  }

  /** Punctuation ratio: non-alnum-non-space chars / total chars. */
  def punctRatio(text: Column): Column = {
    val total = length(text).cast("double")
    val punct = (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double")
    when(total > 0, punct / total).otherwise(lit(0.0))
  }

  /** English stopword ratio over whitespace tokens. */
  def stopwordRatio(text: Column): Column = {
    val n = nTokens(text).cast("double")
    when(n > 0, stopwordHits(text, "en").cast("double") / n).otherwise(lit(0.0))
  }

  /** Mean token length (code points, matching `length` semantics). */
  def avgWordLen(text: Column): Column = {
    val n = nTokens(text)
    when(n > 0, sumTokenLen(text).cast("double") / n).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1] — the length/punctuation/
    * stopword shape of a C4/Gopher-style filter: long enough, not
    * punctuation soup, has some function words, words of sane length. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val wordLenOk = when(avgWordLen(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + wordLenOk * 0.2)
  }

  /** PMI co-occurrence scoring (Church & Hanks 1990) — collocation
    * extraction, the classic phrase-mining pass (word2phrase runs
    * exactly this to merge "new york" before embedding training).
    * Unordered token pairs within `window` positions; with T total
    * pair occurrences, c_x a token's participation count and c_xy the
    * pair count, PMI = ln(4·T·c_xy / (c_x·c_y)) (p(x) = c_x/2T).
    *
    * Shape: posexplode → per-doc position-band self-join (equi on the
    * doc key, band filter — the skip-gram shape), two hash
    * aggregations; the marginal table is vocab-sized and broadcast.
    * `minCount` prunes the noise tail before the join. */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 3, minCount: Long = 5L): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val toks = docs.select(col(idCol).as("did"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.did") === col("b.did") && col("b.pos") > col("a.pos") &&
        col("b.pos") - col("a.pos") <= window)
      .select(least(col("a.tok"), col("b.tok")).as("x"),
        greatest(col("a.tok"), col("b.tok")).as("y"))
    val cxy = pairs.groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val marg = pairs.select(col("x").as("t"))
      .unionByName(pairs.select(col("y").as("t")))
      .groupBy(col("t")).agg(count(lit(1)).as("ct"))
    val tot = cxy.agg(sum(col("cxy")).as("tp"))
    cxy.filter(col("cxy") >= minCount)
      .join(broadcast(marg.select(col("t").as("x"), col("ct").as("cx"))), Seq("x"))
      .join(broadcast(marg.select(col("t").as("y"), col("ct").as("cy"))), Seq("y"))
      .crossJoin(tot)
      .select(col("x"), col("y"), col("cxy"),
        round(log(lit(4.0) * col("tp") * col("cxy") /
          (col("cx") * col("cy"))), 4).as("pmi"))
  }

  /** Deterministic span-corruption mask generation — the T5/UL2
    * denoising objective's data-prep step (Raffel et al. 2020): mark
    * token spans to mask, leaving the model to reconstruct them.
    * Token positions partition into blocks of `blockSize`; each block
    * contributes exactly one span whose length (1..3) and offset are
    * fingerprint-seeded — so spans never overlap BY CONSTRUCTION (no
    * sequential overlap-resolution state), expected noise density is
    * E[len]/blockSize (2/20 = 10% at defaults), and the whole
    * construction is integer arithmetic a SQL oracle replays exactly.
    * One map-side explode per doc; no shuffle.
    *
    * Output: (doc_id, span_id, start, len) with 0-based token
    * `start`; docs shorter than one token yield no spans. */
  def corruptionSpans(docs: DataFrame, idCol: String, textCol: String,
      blockSize: Int = 20): DataFrame = {
    require(blockSize >= 2, s"blockSize must be >= 2: $blockSize")
    val fpL = graft.functions.TextStats.fingerprint(
      concat(col(idCol).cast("string"), lit(":"), col("blk"), lit(":L")))
    val fpS = graft.functions.TextStats.fingerprint(
      concat(col(idCol).cast("string"), lit(":"), col("blk"), lit(":S")))
    docs.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n"))
      .filter(col("n") > 0)
      .select(col(idCol), col("n"),
        explode(sequence(lit(0L), expr(s"(n - 1) div $blockSize"))).as("blk"))
      .withColumn("blen", least(lit(blockSize.toLong),
        col("n") - col("blk") * blockSize))
      .withColumn("len", least(lit(1L) + pmod(fpL, lit(3L)), col("blen")))
      .withColumn("start", col("blk") * blockSize +
        pmod(fpS, col("blen") - col("len") + 1))
      .select(col(idCol), col("blk").as("span_id"), col("start"), col("len"))
  }

  /** HTML-to-text strip — the first cleaning pass of any web-corpus
    * build: drop script/style blocks (non-greedy, case-insensitive,
    * dotall), drop remaining tags, unescape the common entities
    * (specific entities first, `&amp;` LAST so `&amp;lt;` correctly
    * yields the literal `&lt;`), collapse whitespace. Pure
    * regexp_replace chain — codegen'd, linear per row, and every
    * pattern is RE2-compatible (no backreferences), so the identical
    * regexes run in the SQL oracle. Not a full HTML5 parser by design:
    * tag soup beyond this (comments, CDATA, nested same-tag blocks)
    * is the documented boundary, matching what C4-style pipelines
    * actually run. */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to)) // literal replace on both engines
    }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** PII redaction patterns — the pre-training scrub pass (emails,
    * IPv4 addresses, phone-shaped digit runs). Deliberately simple
    * RE2-compatible patterns so the same regex runs in any engine;
    * swap for a vetted PII library's patterns in production. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Redact PII in place: emails → `<EMAIL>`, then IPv4 → `<IP>`,
    * then phone numbers → `<PHONE>`. Order matters — the email
    * pattern can contain digit runs, and IPv4 must win over the
    * phone shape on dotted quads. Pure regexp_replace chain: fully
    * codegen'd, no UDF, linear per row.
    *
    * Each scan is guarded by a cheap necessary-condition probe:
    * [[EmailPattern]] contains a literal '@' and both [[Ipv4Pattern]]
    * and [[PhonePattern]] require an ASCII digit, so a row without the
    * marker cannot match and its regexp_replace is the identity —
    * skipping it is bit-identical. On clean corpora (most rows carry
    * no PII markers) this replaces three NFA scans per row with one
    * contains() and one single-class scan. */
  def redactPii(text: Column): Column = {
    val afterEmail = when(text.contains("@"),
      regexp_replace(text, EmailPattern, "<EMAIL>")).otherwise(text)
    when(afterEmail.rlike("[0-9]"),
      regexp_replace(
        regexp_replace(afterEmail, Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>"))
      .otherwise(afterEmail)
  }

  /** Canonical text normalization — the standard pre-dedup /
    * pre-tokenize cleanup stage of a training-data pipeline. In
    * order: unify Windows/old-Mac newlines, strip other C0/C1 control
    * chars, map the common Unicode space variants (NBSP, ogham, en/em
    * quads, thin/hair, line/para separators, ideographic) to ASCII
    * space, unify curly quotes and long dashes, collapse space runs
    * (newlines survive), trim, lowercase. Pure regexp_replace/lower
    * chain — codegen'd, no UDF, linear per row; every step has an
    * exact DuckDB mirror so the gate hash-matches. */
  def normalizeText(text: Column): Column = {
    val newlines = regexp_replace(text, "\\r\\n?", "\n")
    val controls = regexp_replace(newlines, "[\\x00-\\x08\\x0B-\\x1F\\x7F\\x80-\\x9F]", "")
    val spaces = regexp_replace(controls,
      "[\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]", " ")
    val quotes = regexp_replace(spaces, "[\\u2018\\u2019\\u201A\\u201B]", "'")
    val dquotes = regexp_replace(quotes, "[\\u201C\\u201D\\u201E\\u201F]", "\"")
    val dashes = regexp_replace(dquotes, "[\\u2012-\\u2015\\u2212]", "-")
    val collapsed = regexp_replace(dashes, " +", " ")
    lower(trim(collapsed))
  }

  /** Top-`n` unigram vocabulary by document frequency (ties broken by
    * token), collected to the driver. Vocabularies are tiny by
    * construction (same driver-held-smalls precedent as the IVF
    * centroid table); the heavy part — the distinct-token explode and
    * count — is a distributed hash aggregation. */
  def topVocab(docs: org.apache.spark.sql.DataFrame, textCol: Column, n: Int): Seq[String] = {
    import org.apache.spark.sql.Encoders
    docs.select(explode(array_distinct(tokens(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(n)
      .select(col("tok")).as(Encoders.STRING).collect().toSeq
  }

  /** Encode whitespace tokens as vocabulary ids — the tokenize-to-ids
    * stage every training pipeline runs before packing. Ids are
    * 1-based positions in `vocab`; out-of-vocabulary tokens get 0
    * (`array_position`'s not-found value). The vocab rides along as an
    * array literal in the plan — broadcast once per stage by Tungsten,
    * no join, no shuffle; emitted as strings so downstream `array_join`
    * faces stay type-stable. */
  def tokenIds(text: Column, vocab: Seq[String]): Column = {
    val v = array(vocab.map(lit): _*)
    transform(tokens(text), t => array_position(v, t).cast("string"))
  }

  /** Polynomial rolling-hash document fingerprint:
    * h = fold(chars)((h, c) => (h * 31 + ord(c)) mod 2147483647).
    * Stays in BIGINT range at every step, so the DuckDB list_reduce
    * oracle computes bit-identical values. Fused codegen kernel
    * ([[graft.functions.FingerprintKernel]]) — the `aggregate` HOF
    * form materialized a per-character array and folded interpreted. */
  def fingerprint(text: Column): Column =
    graft.functions.TextStats.fingerprint(text)

  /** Deterministic salted pseudonymization — the governance
    * transform that ships a dataset with PII join keys REPLACED but
    * referential integrity PRESERVED: the same (salt, value) always
    * maps to the same token, so joins/groupBys on the tokenized key
    * behave exactly as on the raw key, while the raw value never
    * leaves the cluster. Token = "tok_" + the salted polynomial
    * [[fingerprint]] — replayable in any engine (same kernel the
    * checksum/manifest gates replay), map-side, codegen'd, no UDF.
    * NOT cryptographic: the fingerprint is 31 bits, so collisions
    * are birthday-bounded (~50% at 54k distinct values) and a
    * determined adversary with the salt can dictionary-invert;
    * production-grade privacy swaps this Column for an HMAC kernel
    * with the same plumbing. The gate measures collisions on its
    * corpus (zero) rather than assuming them away. */
  def pseudonymize(value: Column, salt: String): Column =
    concat(lit("tok_"),
      fingerprint(concat(lit(salt), lit("|"), value.cast("string")))
        .cast("string"))

  /** Sliding token-window chunking — the context-window prep step of
    * a training/RAG pipeline: each document becomes ceil((n-w)/s)+1
    * overlapping chunks of `window` tokens at `stride` starts (the
    * final chunk may be shorter; empty docs yield no chunks). Pure
    * map-side explode: no shuffle at all, chunk count per row is
    * bounded by n/stride, so the operator streams at any corpus
    * size. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, s"window/stride must be >= 1")
    val t = tokens(col(textCol))
    val nChunks = when(size(t) <= window, lit(1))
      .otherwise(ceil((size(t) - window).cast("double") / stride).cast("int") + 1)
    docs.select(col(idCol).as("doc_id"), t.as("t"), nChunks.as("nc"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), col("nc") - 1),
        j => struct(j.cast("long").as("chunk_id"),
          array_join(slice(col("t"), j * stride + 1, lit(window)), " ").as("chunk"))))
        .as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.chunk"))
  }

  /** BM25 document scores for a query term set (Robertson/Spärck
    * Jones; the Lucene `+1` idf variant so scores stay positive) —
    * the standard query-based corpus filter a retrieval-augmented
    * training pipeline runs before an embedding pass:
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
    *   idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)
    *
    * All relational: one explode + per-(doc, term) count for tf, one
    * distinct-per-doc count for df, N/avgdl as a broadcast single
    * row. Docs matching no query term score 0 (kept — the filter
    * face thresholds downstream). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty)
    val t = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val lens = t.select(col("doc_id"), size(col("t")).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val toks = t.select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df_, Seq("term")).join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("part", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id")).agg(round(sum(col("part")), 4).as("bm25"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("bm25"), lit(0.0)).as("bm25"))
  }

  /** Corpus-trained bigram language-model score per document — the
    * cheap perplexity proxy a training-data pipeline uses to rank
    * fluency before it can afford a neural LM pass (KenLM-style
    * filtering, add-one smoothed):
    *
    *   score(doc) = avg over doc bigrams of
    *                ln( (c(w1 w2) + 1) / (c(w1) + V) )
    *
    * where counts come from the whole input corpus and V is the
    * distinct-unigram count. Self-trained, so high-probability docs
    * are the ones that look like the corpus — exactly the in-domain
    * signal the filter wants.
    *
    * Scale shape: two hash aggregations build the model (bigram and
    * unigram count tables — proportional to the distinct n-gram
    * vocabulary, not the corpus), scoring joins each doc bigram to
    * those tables on their keys (hash-partitioned), V rides along as
    * a broadcast single row. No driver-side model materialization —
    * at 100 TB the bigram table is itself a distributed table.
    * Docs with < 2 tokens score 0.0 with n_bigrams 0. */
  def bigramLm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val bi = t.filter(size(col("t")) >= 2).select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = t.select(explode(col("t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cw"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bg = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val scored = bi
      .join(bg, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("cb") + 1).cast("double") / (col("cw") + col("v")))), 4)
          .as("logprob"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob"), lit(0.0)).as("logprob"))
  }

  /** Heaps'-law vocabulary growth (V(N) = K·N^β, β ≈ 0.5 for natural
    * text — the companion corpus-health diagnostic to [[zipfFit]]: a
    * β near 1 means the corpus keeps inventing tokens, template spam
    * or tokenizer damage; β near 0 means it has stopped saying
    * anything new): token mass and DISTINCT vocabulary accumulated at
    * ten ingest-order checkpoints (each token binned by the decile of
    * its FIRST-occurrence doc_id — one aggregate, no per-checkpoint
    * rescans), then the log–log least-squares slope. Counts stay
    * integer through the cumulative window (ten rows,
    * documented-small); only the final regression runs in doubles
    * (zipfFit arithmetic, 4 dp). Returns one row per decile with
    * (beta, k) repeated via the scalar-combine convention. */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = docs.agg((max(col(idCol)) + 1).as("__mx"))
    val tok = docs.select(col(idCol).as("__id"),
        explode(tokens(col(textCol))).as("tok"))
      .crossJoin(broadcast(mx))
      .withColumn("bkt", expr("__id * 10 div __mx").cast("int"))
    val mass = tok.groupBy(col("bkt")).agg(count(lit(1)).as("m"))
    val vocab = tok.groupBy(col("tok")).agg(min(col("bkt")).as("bkt"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("v"))
    val w = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pts = mass.join(vocab, Seq("bkt"), "left")
      .select(col("bkt").cast("long").as("decile"),
        sum(col("m")).over(w).as("n_cum"),
        sum(coalesce(col("v"), lit(0L))).over(w).as("v_cum"))
    val xy = pts.select(col("decile"), col("n_cum"), col("v_cum"),
      log(col("n_cum").cast("double")).as("x"),
      log(col("v_cum").cast("double")).as("y"))
    val fit = xy.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .withColumn("beta0",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")))
      // + 0.0 canonicalizes IEEE −0.0: at tiny sf the fit numerator is
      // ~1e-13 with summation-order-dependent sign (the q_v4 lesson)
      .select((round(col("beta0"), 4) + lit(0.0)).as("beta"),
        round(exp((col("sy") - col("beta0") * col("sx")) / col("n")), 4)
          .as("k"))
    xy.select(col("decile"), col("n_cum"), col("v_cum"))
      .crossJoin(broadcast(fit))
  }

  /** RAKE keyword extraction (Rose et al. 2010 — the unsupervised
    * keyphrase baseline): candidate phrases are maximal stopword-free
    * token runs; each word scores degree/freq (degree = Σ length of
    * phrases it occurs in, freq = occurrence count) and a phrase
    * scores the sum of its words' scores — co-occurring words in
    * long runs outrank isolated frequent ones. Top-`topK` phrases
    * per document, ties to the lexicographically first phrase.
    *
    * Scale shape: one posexplode + one per-document running-sum
    * window assigns segment ids (the q_t10 window class), then
    * everything is hash aggregates and equi-joins on (doc, seg) /
    * (doc, word) keys; ranking is the native bounded-heap TopKPerKey,
    * not a per-doc sort. */
  def rakePhrases(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stops = Seq("the", "a", "and", "of", "to", "is", "in")
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val wSeg = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val sw = tok.withColumn("stop", col("w").isin(stops: _*))
      .withColumn("seg",
        sum(when(col("stop"), 1L).otherwise(0L)).over(wSeg))
      .filter(!col("stop"))
    val phr = sw.groupBy(col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("plen"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"))
    val wordRows = sw.select(col("doc_id"), col("seg"), col("w"))
      .join(phr.select(col("doc_id"), col("seg"), col("plen")),
        Seq("doc_id", "seg"))
    val wordStats = wordRows.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    val scored = wordRows.join(wordStats, Seq("doc_id", "w"))
      .withColumn("ws", col("deg").cast("double") / col("freq"))
      .groupBy(col("doc_id"), col("seg"))
      .agg(round(sum(col("ws")), 4).as("score"))
      .join(phr.select(col("doc_id"), col("seg"), col("phrase")),
        Seq("doc_id", "seg"))
    graft.plans.TopK.topKPerKey(scored, Seq(col("doc_id")),
        Seq(col("score").desc, col("phrase").asc), topK)
      .select(col("doc_id"), col("phrase"), col("score"))
  }

  /** Per-document n-gram novelty — the marginal-contribution score
    * (what fraction of this document's distinct n-grams has their
    * corpus-wide FIRST occurrence here, taking doc_id as ingest
    * order): a redundancy-growth curve falls out of sorting by it,
    * and documents near zero are pure re-statements of earlier data
    * (the "diminishing returns" measurement of the dedup papers,
    * grams attributed to their earliest holder instead of dropped).
    * One fused-shingle explode + per-gram min aggregate + one
    * equi-join back — shuffles only on gram keys, the q_c1 scale
    * shape. Documents shorter than n score 0 over 0 grams. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("g"))
      .distinct()
    val first = sh.groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
    val scored = sh.join(first, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(round(col("n_novel").cast("double") / col("n_grams"), 4),
          lit(0.0)).as("novelty"))
  }

  /** MATTR lexical diversity (Covington & McFall 2010 — the
    * length-independent type–token ratio; raw TTR shrinks with
    * document length, so corpus filters use the moving average):
    * mean distinct-fraction over every `w`-token sliding window,
    * computed as Σ distinct_i / (w · windows) so the only division
    * happens once on exact integer sums — no float accumulation to
    * disagree on. Documents shorter than `w` fall back to plain TTR
    * over the full token list; empty documents drop. Pure map-side
    * HOF work (window count per row bounded by n), no shuffle at
    * all — a template-spam screen that streams at any corpus size. */
  def mattr(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 10): DataFrame = {
    require(w >= 2, s"window must be >= 2: $w")
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .filter(col("n") >= 1)
      .withColumn("nw",
        when(col("n") >= w, col("n") - (w - 1)).otherwise(lit(1L)))
      .withColumn("sd",
        when(col("n") >= w,
          aggregate(
            transform(sequence(lit(1), (col("n") - (w - 1)).cast("int")),
              i => size(array_distinct(slice(col("t"), i, lit(w)))).cast("long")),
            lit(0L), (a, x) => a + x))
        .otherwise(size(array_distinct(col("t"))).cast("long")))
      .withColumn("denom",
        when(col("n") >= w, lit(w.toLong) * col("nw")).otherwise(col("n")))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("nw").as("n_windows"),
        round(col("sd").cast("double") / col("denom"), 4).as("mattr"))
  }

  /** Trigram stupid-backoff scoring (Brants et al. 2007 — the
    * large-LM fluency scorer that needs no discounting math): a
    * held-in split trains the count tables, the held-out split is
    * scored per trigram as c3/c2 when the trigram was seen, else
    * α·c(w2w3)/c(w2), else α²·(c(w3)+1)/(N+V) — so unseen
    * continuations degrade smoothly instead of zeroing the document.
    * Per held-out document: trigram count, how many scored at each
    * backoff tier, and the mean log score (4 dp).
    *
    * Scale shape: the count tables are distributed hash aggregates
    * (never driver-side), the score stream left-joins them on gram
    * keys — all equi-joins that AQE can broadcast when a count table
    * is small and shuffle when it is not; the only corpus-order
    * dependence is within-document gram extraction, which is a pure
    * map-side explode. */
  def trigramBackoff(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column, alpha: Double = 0.4): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), trainPred.as("__train"),
      tokens(col(textCol)).as("t"))
    def tris(src: DataFrame) = src.filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("t")) - 2),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2"),
          element_at(col("t"), i + 2).as("w3")))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
    val train = t.filter(col("__train"))
    val uni = train.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val nv = uni.agg(sum(col("c1")).as("__n"), count(lit(1)).as("__v"))
    val bi = train.filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("g"))
      .groupBy(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val tri = tris(train).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
    val score = tris(t.filter(!col("__train")))
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi.withColumnRenamed("c2", "c2_12"), Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c2_23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1_2")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c1_3")), Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("__s",
        when(col("c3").isNotNull, col("c3").cast("double") / col("c2_12"))
          .when(col("c2_23").isNotNull,
            lit(alpha) * col("c2_23").cast("double") / col("c1_2"))
          .otherwise(lit(alpha * alpha) *
            (coalesce(col("c1_3"), lit(0L)) + 1).cast("double") /
            (col("__n") + col("__v"))))
    val perDoc = score.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_trigrams"),
      sum(when(col("c3").isNotNull, 1L).otherwise(0L)).as("n_tri_hits"),
      sum(when(col("c3").isNull && col("c2_23").isNotNull, 1L)
        .otherwise(0L)).as("n_bi_hits"),
      round(avg(log(col("__s"))), 4).as("logprob"))
    t.filter(!col("__train")).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_tri_hits"), lit(0L)).as("n_tri_hits"),
        coalesce(col("n_bi_hits"), lit(0L)).as("n_bi_hits"),
        coalesce(col("logprob"), lit(0.0)).as("logprob"))
  }

  /** Zipf rank-frequency fit — the corpus-health diagnostic (natural
    * language follows freq ∝ rank^s with s ≈ −1; a slope far from −1
    * flags template spam, boilerplate floods or tokenizer damage):
    * least-squares fit of ln(freq) on ln(rank) over the unigram
    * vocabulary. One distributed count aggregation; the vocabulary is
    * smaller than the corpus but NOT bounded — naive tokenization at
    * web scale mints 10⁸–10⁹ distinct strings (typos, numbers, URLs;
    * Heaps growth) — so the rank comes from
    * [[OrderedPrefix.withRowIndex]]'s two-level scan, never one
    * unpartitioned window task over the whole vocabulary.
    *
    * @return one row: (n_vocab, slope, intercept), 4 dp
    */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val freq = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val ranked = OrderedPrefix.withRowIndex(freq,
      Seq(col("f").desc, col("tok")), "r", "__zn").drop("__zn")
    val xy = ranked.select(log(col("r").cast("double")).as("x"),
      log(col("f").cast("double")).as("y"))
    val agg = xy.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    agg.withColumn("slope0",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("n").cast("long").as("n_vocab"),
        round(col("slope0"), 4).as("slope"),
        round((col("sy") - col("slope0") * col("sx")) / col("n"), 4)
          .as("intercept"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, §A1.1 —
    * the rule-based pre-filter most pretraining corpora run before
    * any model-based scoring): per document, word count, mean word
    * length (= non-whitespace chars / words, identical to the
    * sum-of-token-lengths mean for whitespace tokenization), the
    * fraction of words containing a letter, and the count of DISTINCT
    * stop words present; `passes` ANDs the four threshold rules.
    * All stats are pure Column expressions over one tokens() pass —
    * no UDF, no shuffle, map-side only; ratios round to 4 dp on both
    * engines so threshold comparisons agree exactly. Empty documents
    * are dropped (no denominators). */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String,
      minWords: Long = 10L, maxWords: Long = 100000L,
      minWordLen: Double = 3.0, maxWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopWords: Int = 2,
      stopWords: Seq[String] = Seq("the", "a", "and", "of", "to")): DataFrame = {
    val t = tokens(col(textCol))
    val nw = size(t).cast("long")
    val meanWl = round(
      length(regexp_replace(col(textCol), "\\s+", "")).cast("double") / nw, 4)
    val fracAlpha = round(
      size(filter(t, x => x.rlike("[a-z]"))).cast("double") / nw, 4)
    val nStop = size(array_intersect(array_distinct(t),
      array(stopWords.map(lit): _*))).cast("long")
    docs.filter(size(tokens(col(textCol))) > 0)
      .select(col(idCol), nw.as("n_words"), meanWl.as("mean_wl"),
        fracAlpha.as("frac_alpha"), nStop.as("n_stop"))
      .withColumn("passes",
        col("n_words").between(minWords, maxWords) &&
        col("mean_wl").between(minWordLen, maxWordLen) &&
        col("frac_alpha") >= minAlphaFrac &&
        col("n_stop") >= minStopWords)
  }

  /** Per-group fluency-median filter — the CCNet-shaped perplexity
    * pass (Wenzek et al. LREC'20): score every document with the
    * corpus [[bigramLm]], then keep the more-fluent half of EACH
    * group (per-language cuts, so a low-resource language isn't
    * judged by the dominant one's distribution). The cut is the exact
    * rank-median: the logprob value at position ceil(n/2) in
    * descending order — a deterministic order statistic the oracle
    * replays bit-for-bit (ties share the value, so tie order can't
    * change it). Documents with no bigram are excluded from both
    * numerator and denominator.
    *
    * Returns one row per group: (grp, n_total, n_kept, cut).
    *
    * Scale shape: scoring is [[bigramLm]]'s two distributed count
    * tables; the median is two window passes partitioned on the group
    * key over the (already small) scored projection. At 100 TB with
    * few giant language groups, swap the exact rank-median for
    * `approx_percentile` (or the KMV sample) — the exact form is the
    * oracle-checkable face. */
  def fluencyMedianFilter(docs: DataFrame, idCol: String, textCol: String,
      grpCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lm = bigramLm(docs, idCol, textCol).filter(col("n_bigrams") > 0)
    val scored = lm.join(
      docs.select(col(idCol).as("doc_id"), col(grpCol).as("grp")), Seq("doc_id"))
      .localCheckpoint(true)
    // Per-group rank WITHOUT a per-group window: a window partitioned
    // by the (few-valued) language column funnels each language's
    // whole score set through one task — data-sized per group at
    // 100 TB, and the profiled serial-stage chain at gate scale. Rank
    // globally over (grp, logprob desc, doc_id) with the OrderedPrefix
    // two-level scan (groups are contiguous in that order), then
    // rank-in-group = global index − group start, group starts from
    // the dimension-sized per-group counts. Ties are broken by doc_id
    // exactly as row_number did, so the cut row is identical. The
    // scored frame is pinned: it feeds the rank, the group counts and
    // the final keep-count aggregation.
    val idx = OrderedPrefix.withRowIndex(scored,
      Seq(col("grp"), col("logprob").desc, col("doc_id")), "__gi", "__nall")
    val goff = idx.groupBy(col("grp")).agg(
      (min(col("__gi")) - 1L).as("__start"), count(lit(1)).as("n"))
    val cuts = idx.join(broadcast(goff), Seq("grp"))
      .filter(col("__gi") - col("__start") === floor((col("n") + 1) / lit(2.0)))
      .select(col("grp"), col("logprob").as("cut"))
    scored.join(broadcast(cuts), Seq("grp"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("logprob") >= col("cut"), 1L).otherwise(0L)).as("n_kept"),
        min(col("cut")).as("cut"))
  }

  /** Flesch reading-ease score (Flesch '48) with the standard
    * regex-countable proxies: words = whitespace tokens, sentences =
    * maximal [.!?] runs (floored at 1), syllables = maximal vowel
    * runs [aeiouy]+ of the lowercased text (the classic
    * vowel-cluster heuristic — hyphenation dictionaries don't
    * distribute, this does). 206.835 − 1.015·(W/S) − 84.6·(Syl/W),
    * null for wordless docs. Three codegen regex counts per row, no
    * shuffle — the readability band selector of a corpus-quality
    * pipeline (gating on grade band is a standard curation filter).
    * Returns columns (n_words, n_sentences, n_syllables, flesch). */
  def fleschParts(text: Column): Seq[Column] = {
    val w = nTokens(text)
    val s = greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0)))
      .cast("long"), lit(1L))
    val syl = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    val flesch = when(w > 0,
      round(lit(206.835)
        - lit(1.015) * (w.cast("double") / s.cast("double"))
        - lit(84.6) * (syl.cast("double") / w.cast("double")), 4))
    Seq(w.as("n_words"), s.as("n_sentences"), syl.as("n_syllables"),
      flesch.as("flesch"))
  }

  /** Template/boilerplate detection by shared prefix — documents
    * opening with the same first `k` tokens are almost always one
    * template stamped many times (the C4-style cleanup target: strip
    * or collapse them before they dominate the loss). The prefix
    * rides as its poly fingerprint (one long per doc — text never
    * shuffles), templates are groups of ≥ `minDocs`; min/max ids
    * locate exemplars. Short docs (< k tokens) group by their full
    * text. One map pass + one hash aggregate. Returns
    * (prefix_fp, n_docs, min_doc, max_doc). */
  def templatePrefixes(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2): DataFrame = {
    require(k >= 1 && minDocs >= 2)
    val prefix = array_join(slice(tokens(col(textCol)), 1, k), " ")
    docs.select(col(idCol).as("id"),
        graft.functions.TextStats.fingerprint(prefix).as("prefix_fp"))
      .groupBy(col("prefix_fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("min_doc"),
        max(col("id")).as("max_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Hapax legomena rate per group — the share of terms appearing
    * exactly once, the lexical-richness needle between [[heapsFit]]
    * (growth) and [[simpsonDiversity]] (concentration): natural text
    * runs ~40–60% hapax; machine-generated or template text
    * collapses it. All-integer off one (group, term) count. Returns
    * (grp, n_terms, n_hapax, hapax_rate). */
  def hapaxRate(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    docs.select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_rate",
        round(col("n_hapax").cast("double") / col("n_terms").cast("double"),
          6))

  /** Pairwise source STYLE cosine — count-vector cosine over word
    * bigrams, the symmetric style fingerprint beside
    * [[sourceOverlap]]'s asymmetric distinct-shingle containment
    * (containment asks "is A's content inside B?"; this asks "do A
    * and B write the same way?" — counts, not sets, so a source that
    * repeats its patterns matches one that repeats them too).
    *   cos = Σ cₐ·c_b / √(Σcₐ² · Σc_b²)
    * with every sum an exact integer (products in DECIMAL(38,0)),
    * one closing double chain rounded 6 dp. The cross term joins on
    * the bigram key — a bigram in k sources contributes C(k,2) rows,
    * bounded by the source count. Returns all pairs
    * (src_a, src_b, cos). */
  def sourceStyleCosine(docs: DataFrame, grpCol: String,
      textCol: String): DataFrame = {
    val d0 = (c: Column) => c.cast("decimal(38,0)")
    val counts = docs.select(col(grpCol).as("grp"),
        explode(graft.functions.TextStats.shingles(col(textCol), 2))
          .as("g"))
      .groupBy(col("grp"), col("g")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val norms = counts.groupBy(col("grp"))
      .agg(sum(d0(col("c")) * d0(col("c"))).as("q"))
    val dots = counts.as("a").join(counts.as("b"),
        col("a.g") === col("b.g") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("src_a"), col("b.grp").as("src_b"))
      .agg(sum(d0(col("a.c")) * d0(col("b.c"))).as("dot"))
    dots
      .join(norms.select(col("grp").as("src_a"), col("q").as("qa")),
        Seq("src_a"))
      .join(norms.select(col("grp").as("src_b"), col("q").as("qb")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"),
        round(col("dot").cast("double") /
          (sqrt(col("qa").cast("double")) * sqrt(col("qb").cast("double"))),
          6).as("cos"))
  }

  /** TextRank keywords (Mihalcea & Tarau '04) — corpus-level keyword
    * extraction by PageRank over the word co-occurrence graph, the
    * graph-centrality alternative to [[rakePhrases]]' frequency/
    * degree heuristic (TextRank surfaces words that BRIDGE topics,
    * not just words in long runs). Edges are distinct adjacent-token
    * pairs (window 2), symmetrized; ranking is the proven
    * [[graft.query.GraphQueries.pagerankDf]] fixed-iteration
    * recurrence (replayable 9-dp chain); the report is the top-k by
    * (pr desc, word) — deterministic under ties. Returns (node, pr).
    * Scale: one shingle explode + distinct (shuffle on the pair key)
    * + the PageRank iterations — nothing quadratic in vocabulary. */
  /** The raw (multiset) canonical co-occurrence edge stream TextRank
    * ranks over: adjacent-token pairs (window 2), self-loops dropped,
    * endpoints ordered (least, greatest). Map-side only — no shuffle.
    * Shared by [[textRank]] and [[graft.DataCheck]] (which measures
    * the DISTINCT edge count as q_x42's decade input driver), so the
    * instrument can never measure a different graph than the gate
    * builds. */
  def bigramEdges(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        graft.functions.TextStats.shingles(col(textCol), 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("a"),
        split(col("bg"), " ").getItem(1).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))

  def textRank(docs: DataFrame, textCol: String, iters: Int = 3,
      topK: Int = 20, encodeThreshold: Long = 1L << 20): DataFrame = {
    val bi0 = bigramEdges(docs, textCol)
    // ADAPTIVE face pick (round-11 verdict item): the dictionary
    // encode below pays two linear joins that only earn their keep
    // when the edge list is large — at gate scale (45 k edges) it
    // costs 2.3× for nothing, at sf10 (23 M edges) skipping it is a
    // spill cascade. The pivot statistic is the distinct-edge count,
    // measured as one cheap HLL aggregate over the map-side bi0
    // stream (~2% default error — a pivot, not a result; both faces
    // are bit-identical, spec-asserted, so the choice can never
    // change output). 2²⁰ ≈ 1 M edges sits between the measured
    // regimes with an order of magnitude of slack each way.
    val nEdges = bi0.agg(
      approx_count_distinct(struct(col("src"), col("dst")))).head().getLong(0)
    if (nEdges < encodeThreshold) {
      // small-graph face: PageRank directly over string node keys —
      // the pre-round-11 formulation, cheapest when the whole edge
      // list fits comfortably in a shuffle
      val bi = bi0.distinct()
      val e = bi.unionByName(
        bi.select(col("dst").as("src"), col("src").as("dst")))
      graft.query.GraphQueries.pagerankDf(e, iters)
        .orderBy(col("pr").desc, col("node"))
        .select(col("node"), col("pr"))
        .limit(topK)
    } else {
      // large-graph face: dictionary-encode tokens to longs BEFORE
      // the edge distinct: PageRank is relabeling-invariant, and
      // running it over STRING node keys re-shuffles ~25 B keys per
      // edge per iteration and localCheckpoints a string edge list —
      // the sf10 smoke measured q_x42 at 59× per decade from exactly
      // that (string edges exceeding memory turn every iteration into
      // a spill cascade).
      // monotonically_increasing_id is stable here because the vocab
      // is pinned by localCheckpoint before both encode joins read
      // it; token strings rejoin only for the final (pr, token)
      // ordering, so output and tie-breaks are byte-identical to the
      // string face.
      val vocab = bi0.select(explode(array(col("src"), col("dst"))).as("tok"))
        .distinct()
        .select(col("tok"), monotonically_increasing_id().as("tid"))
        .localCheckpoint(true)
      val bi = bi0
        .join(vocab.select(col("tok").as("src"), col("tid").as("s")), Seq("src"))
        .join(vocab.select(col("tok").as("dst"), col("tid").as("t")), Seq("dst"))
        .select(col("s").as("src"), col("t").as("dst"))
        .distinct()
      val e = bi.unionByName(
        bi.select(col("dst").as("src"), col("src").as("dst")))
      graft.query.GraphQueries.pagerankDf(e, iters)
        .join(vocab.select(col("tid").as("node"), col("tok")), Seq("node"))
        .orderBy(col("pr").desc, col("tok"))
        .select(col("tok").as("node"), col("pr"))
        .limit(topK)
    }
  }

  /** Yule's K lexical-richness statistic per group — the
    * length-INVARIANT repetitiveness characteristic (Yule, 1944):
    *   K = 10⁴ · (Σ_types c² − N) / N²
    * with c each type's token count and N the group's token total
    * (Σ c² = Σ_m m²·V_m, so this is the classic formulation). Unlike
    * [[hapaxRate]] (which falls with corpus size) K is stable under
    * sampling, making it the cross-source comparable vocabulary
    * signal; higher K = more repetitive. All-integer sums (c² in
    * DECIMAL(38,0)), one closing division. Returns (grp, n_tokens,
    * n_types, yules_k). Scale: two hash aggregations over the
    * exploded token stream — no window, no join. */
  def yulesK(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    docs.select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c").cast("decimal(38,0)") * col("c").cast("decimal(38,0)"))
          .as("__s2"))
      .select(col("grp"), col("n_tokens"), col("n_types"),
        when(col("n_tokens") > 0, round(
          (col("__s2").cast("double") - col("n_tokens").cast("double")) *
            1e4 /
            (col("n_tokens").cast("double") * col("n_tokens").cast("double")),
          6)).as("yules_k"))

  /** Pairwise source overlap by distinct word-trigram containment —
    * "which sources copy each other?": shared/min(|A|,|B|) per source
    * pair (containment, not Jaccard — a small source fully embedded
    * in a big one should score 1, and that asymmetry is the finding).
    * Each source's shingle set dedupes FIRST (one hash aggregate),
    * the pair join is on the shingle key — a shingle in k sources
    * contributes C(k,2) ≤ C(#sources,2) rows, bounded by the group
    * count, never the corpus. Returns all pairs
    * (src_a, src_b, shared, n_a, n_b, containment). */
  def sourceOverlap(docs: DataFrame, grpCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(grpCol).as("grp"),
        explode(graft.functions.TextStats.shingles(col(textCol), shingleN))
          .as("s")).distinct().localCheckpoint(true)
    val counts = sh.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("src_a"), col("b.grp").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(counts.select(col("grp").as("src_a"), col("n").as("n_a")),
        Seq("src_a"))
      .join(counts.select(col("grp").as("src_b"), col("n").as("n_b")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared"), col("n_a"),
        col("n_b"),
        round(col("shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))
  }

  /** Simpson diversity of each group's token distribution — "how
    * concentrated is this source's vocabulary?", the ecology-standard
    * companion to [[graft.ext.Profiling.giniConcentration]]. Two
    * exact integer-ratio statistics per group:
    *   D  = Σ c(c−1) / (N(N−1))   (unbiased repeat probability —
    *        the chance two tokens drawn without replacement match)
    *   invSimpson = N² / Σ c²     (Hill number of order 2 — the
    *        "effective vocabulary size": a source that cycles 50
    *        words scores ~50 even if it technically has 5 000)
    * All sums are exact BIGINTs off one (group, term) count
    * aggregate; the two divisions round 6/4 dp. Returns
    * (group, n_tokens, n_terms, d, inv_simpson); D is NULL for
    * single-token groups. */
  def simpsonDiversity(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    docs.select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
      // DECIMAL(38,0) products: c² overflows BIGINT past c ~ 3·10⁹
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_terms"),
        sum(col("c").cast("decimal(38,0)") * (col("c") - 1)).as("__cc1"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("__c2"))
      .select(col("grp"), col("n_tokens"), col("n_terms"),
        when(col("n_tokens") > 1,
          round(col("__cc1").cast("double") /
            (col("n_tokens").cast("decimal(38,0)") * (col("n_tokens") - 1))
              .cast("double"), 6)).as("d"),
        round((col("n_tokens").cast("decimal(38,0)") * col("n_tokens"))
            .cast("double") / col("__c2").cast("double"), 4)
          .as("inv_simpson"))

  /** Jensen–Shannon divergence between the token distributions of two
    * corpora — the symmetric, bounded [0,1] (log2) drift metric a
    * mixture pipeline reports when a new source joins the pool (Lin
    * '91). Over the term union:
    *   JSD = ½·Σ [ p·log2(2p/(p+q)) + q·log2(2q/(p+q)) ]
    * with p = c_a/N_a, q = c_b/N_b exact integer-count ratios; a term
    * absent from one side contributes only the other's part (the
    * 0·log0 = 0 convention). Each per-term contribution is one
    * deterministic double expression rounded 9 dp and summed in
    * DECIMAL(38,12) — the ndcg/chiSquare discipline, so the oracle
    * replays the sum exactly. Shape: two token-count aggregates, one
    * full outer equi-join on term, one closing 1-row aggregate —
    * counts, never text, cross the shuffle. Returns
    * (n_terms, n_only_a, n_only_b, n_a, n_b, jsd). */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(explode(tokens(col(textCol))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as(out))
    val ca = counts(a, "ca")
    val cb = counts(b, "cb")
    val joined = ca.join(cb, Seq("tok"), "full_outer")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = joined.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val p = col("ca").cast("double") / col("na").cast("double")
    val q = col("cb").cast("double") / col("nb").cast("double")
    def part(x: Column, y: Column) =
      when(x > 0, x * log2(x * 2 / (x + y))).otherwise(lit(0.0))
    joined.crossJoin(broadcast(tot))
      .select(col("ca"), col("cb"), col("na"), col("nb"),
        round((part(p, q) + part(q, p)) / 2, 9)
          .cast("decimal(38,12)").as("__t"))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("cb") === 0, 1L).otherwise(0L)).as("n_only_a"),
        sum(when(col("ca") === 0, 1L).otherwise(0L)).as("n_only_b"),
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(col("__t")).as("__jsd"))
      .select(col("n_terms"), col("n_only_a"), col("n_only_b"),
        col("n_a"), col("n_b"),
        round(col("__jsd").cast("double"), 6).as("jsd"))
  }

  /** Within-document repetition report — the Gopher repetition rules
    * (Rae et al. '21 §A1.1: "duplicate n-gram character fraction")
    * that catch the pathological pages intra-corpus dedup can't (a
    * page repeating its own nav block 40 times is unique corpus-wide
    * but garbage): per document, the word n-gram multiset and the
    * share of n-gram characters sitting in n-grams that occur ≥2
    * times IN THIS DOCUMENT. All counts exact integers, one division
    * rounded 6 dp. Documents shorter than n tokens report zeros.
    * Scale: text never shuffles — the explode+count group key is
    * (doc_id, gram), map-side combinable; the report is one row per
    * doc. Returns (doc_id, n_grams, n_dup_grams, dup_char_frac). */
  def dupNgramStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val per = docs
      .select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_dup_grams"),
        sum(col("c") * length(col("gram")).cast("long")).as("__tot"),
        sum(when(col("c") >= 2, col("c") * length(col("gram")).cast("long"))
          .otherwise(0L)).as("__dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        round(col("__dup").cast("double") / col("__tot").cast("double"), 6)
          .as("dup_char_frac"))
    docs.select(col(idCol).as("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("dup_char_frac"), lit(0.0)).as("dup_char_frac"))
  }

  /** Luhn checksum validity of a digit string (Luhn '60, the mod-10
    * check every payment-card number carries) — the VALIDATOR a PII
    * scrubber runs behind its 13-16-digit regex, because most digit
    * runs that shape-match a card number are order ids and phone
    * numbers, and Luhn rejects 90% of them: from the right, double
    * every second digit (subtracting 9 when that doubles past 9);
    * valid iff the digit sum ≡ 0 (mod 10). Pure integer Column over
    * `sequence` — codegen'd, no UDF, exact in any engine. NULL-safe:
    * empty/non-digit input → false (the digit-only rlike guard is
    * load-bearing: without it a non-digit char would flow through
    * ascii(ch)−48 as a bogus digit value and could sum to 0 mod 10). */
  def luhnValid(digits: Column): Column = {
    // index i counts 1.. from the RIGHTMOST digit; even i doubles
    val arr = transform(split(reverse(digits), ""), ch => ascii(ch) - lit(48))
    val contrib = zip_with(arr, sequence(lit(1), size(arr)), (d, i) =>
      when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d))
    val s = aggregate(contrib, lit(0), (acc, x) => acc + x)
    coalesce(digits, lit("")).rlike("^[0-9]+$") && s % 10 === 0
  }

  /** Encoding-health audit per source — the decode-QA gate a crawl
    * pipeline runs before any text filter (damaged decoding poisons
    * every downstream heuristic): counts of U+FFFD replacement chars
    * (a decoder already gave up), C0 control chars outside
    * tab/newline/CR (binary bleed-through), and the 'Ã' (U+00C3)
    * lead byte of UTF-8-read-as-Latin-1 mojibake ('é' → 'Ã©' — the
    * single most common real-world corruption signature). Pure
    * integer counts (char-length deltas after strip), so the oracle
    * replay is exact; one hash aggregate on the source key, all
    * per-doc work map-side. Returns (source, n_docs, n_repl_docs,
    * repl_chars, ctrl_chars, n_moji_docs). */
  def encodingAudit(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def occurrences(stripped: Column): Column =
      (length(t) - length(stripped)).cast("long")
    val repl = occurrences(replace(t, lit("\uFFFD"), lit("")))
    val ctrl = occurrences(
      regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))
    val moji = occurrences(replace(t, lit("\u00C3"), lit("")))
    docs.groupBy(col(srcCol).as("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(repl > 0, 1L).otherwise(0L)).as("n_repl_docs"),
      sum(repl).as("repl_chars"),
      sum(ctrl).as("ctrl_chars"),
      sum(when(moji > 0, 1L).otherwise(0L)).as("n_moji_docs"))
  }
}
