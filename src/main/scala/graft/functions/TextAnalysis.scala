package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analysis operators for training-data pipelines (builder mandate +
  * SURVEY.md §2.2 "Text analysis"): token counting, quality scoring,
  * heuristic language ID, document fingerprinting.
  *
  * Everything is codegen'd `functions._` expressions over `documents.text`
  * — per-row work with no shuffle until the final aggregate, so the plans
  * scale linearly with input splits.
  */
object TextAnalysis {
  import Tables._

  /** Whitespace tokens with empties dropped — the shared tokenizer.
    * (Spark `split` is regex-based but a single space is literal here,
    * matching DuckDB's `string_split`.) */
  def tokens(text: Column): Column = filter(split(text, " "), t => t =!= "")

  /** Lexical-diversity quality score in exact integer ten-thousandths:
    * (distinct tokens * 10000) div tokens over a token-array column
    * named `wName` — ONE definition shared by q159's gate and q161's
    * funnel so the two stages cannot drift. */
  def lexDiversityScore4(wName: String): Column =
    expr(s"(cast(size(array_distinct($wName)) as bigint) * 10000) div size($wName)")

  /** The deterministic md5 split coin (q70's contract — '0c'/256 ~ 4.7%
    * test, '0c'..'1a' ~ 5.5% val, rest train): ONE definition for every
    * consumer — the split itself (q70), the leakage audit (q138), the
    * cluster-level split (q139) and the streaming admission guard — so
    * rebalancing a threshold can never leave an auditor checking a
    * different partition than the one being assigned. */
  def splitCoin(id: Column): Column =
    when(md5(id.cast("string")) < "0c", "test")
      .when(md5(id.cast("string")) < "1a", "val")
      .otherwise("train")

  /** The identical coin as DuckDB SQL over an id expression. */
  def sqlSplitCoin(idExpr: String): String =
    s"""CASE WHEN md5(($idExpr)::VARCHAR) < '0c' THEN 'test'
                    WHEN md5(($idExpr)::VARCHAR) < '1a' THEN 'val'
                    ELSE 'train' END"""

  /** BPE-ish lexer token count: letter runs, digit runs, or single
    * non-alnum-non-space chars. */
  def lexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Canonical content fingerprint: md5 of the sorted distinct word set.
    * Collapses word-order-only variation (rolling-hash analog that is
    * exactly reproducible in any engine). */
  def canonicalFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Frozen hashed-linear classifier model (q121 + the streaming twin):
    * token -> one of [[CLASSIFIER_BUCKETS]] feature buckets by 48-bit md5,
    * bucket -> deterministic integer weight in [-1000, 1000]. A trained
    * model replaces this with a broadcast weight table; the shape of every
    * consumer stays identical. */
  val CLASSIFIER_BUCKETS = 4096L

  def classifierWeight(w: Column): Column = {
    def h12(c: Column): Column =
      conv(substring(md5(c), 1, 12), 16, 10).cast("long")
    val bucket = pmod(h12(w), lit(CLASSIFIER_BUCKETS))
    pmod(h12(concat(lit("w#"), bucket.cast("string"))), lit(2001L)) - 1000L
  }

  private[functions] val STOPWORDS = Seq("the", "a", "of", "to", "and")

  /** Distinct word-trigram set of a token array — the q73 decontamination
    * gram unit, factored so the streaming probe
    * ([[graft.streaming.StreamingOps.contaminationProbe]]) matches the
    * batch semantics expression-for-expression. Callers guard
    * `size(w) >= 3`. */
  def trigramSet(w: Column): Column =
    array_distinct(
      transform(sequence(lit(0), size(w) - 3), i =>
        concat_ws(" ", element_at(w, i + 1),
          element_at(w, i + 2),
          element_at(w, i + 3))))

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(STOPWORDS.map(lit): _*)))

  /** Range-bucketed inverted index — the array-returning API behind q100.
    * word -> sorted doc-id postings, sharded by doc-id range (`div`, not
    * `mod`) so no single row is ever corpus-sized: a stopword's postings
    * split across n_docs/`bucket` rows, each bounded by the bucket width
    * and contiguous (delta-encodable), the Lucene-segment layout as a
    * declarative plan. Two aggregation levels, both partial-agg friendly.
    * The q100 registration digests `postings` to a scalar md5 for the
    * driver's hasher; call this directly for the raw lists. */
  def invertedIndex(s: SparkSession, d: String, bucket: Long = INDEX_BUCKET): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", expr(s"doc_id div $bucket"))
      .groupBy(col("word"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tf")).as("tf_sum"),
        sort_array(collect_list(col("doc_id"))).as("postings"))

  /** Modulus of the q146 posting-set signature (q101's residue P). */
  val POSTING_SIG_P = 1000003L

  /** Doc-range width of one inverted-index bucket — ONE constant shared
    * by [[invertedIndex]] (q100), the q146 incremental merge (Spark and
    * oracle sides), and the streaming
    * [[graft.streaming.StreamingOps.indexMaintain]] twin: the
    * merge==rebuild contract only holds while all four agree. */
  val INDEX_BUCKET = 500L

  /** One doc's modular posting-set signature draw — ONE definition shared
    * by batch q146 and the streaming
    * [[graft.streaming.StreamingOps.indexMaintain]] twin so the two index
    * states can never drift (the StreamingSpec replay pins equality). */
  def postingSigDraw(docId: Column): Column =
    pmod(conv(substring(md5(concat(lit("ps:"), docId.cast("string"))), 1, 12),
      16, 10).cast("long"), lit(POSTING_SIG_P))

  // DuckDB fragments used by several oracles below.
  private val SQL_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"
  private[functions] val SQL_STOP = STOPWORDS.map(w => s"'$w'").mkString("(", ",", ")")

  /** q104's query phrases: mixed lengths, plus a repeated-term phrase
    * ("batch batch") that exercises the distinct-slot vote. */
  val PHRASES: Seq[(Int, String)] = Seq(
    1 -> "table scan", 2 -> "big order scan", 3 -> "batch batch", 4 -> "join order")
  private val SQL_PHRASES = PHRASES
    .map { case (id, p) => s"($id, '$p')" }.mkString(", ")

  /** Rows a single window partition may hold in the hierarchical running
    * sum — both the bucket width and the recursion's leaf size. 4096 is
    * small enough that the recursion is exercised from sf0.01 up, and at
    * 10^10 docs the depth is only ceil(log_4096) = 3. */
  val PACK_FANOUT = 4096L

  /** Fixed recursion depth of [[exclusiveRunningSum]]: 3 bucketing levels
    * keep every window partition <= [[PACK_FANOUT]] rows for any id space
    * below PACK_FANOUT^4 ~ 2.8e14 — four orders of magnitude past the
    * 10^10-doc design point. */
  val PACK_LEVELS = 3

  /** EXCLUSIVE running sum of `value` in `id` order (each row gets the sum
    * of all strictly-preceding rows) — the parallel prefix-sum shape, as a
    * log-depth plan in which NO window partition holds more than
    * ~[[PACK_FANOUT]] rows at ANY corpus size:
    *
    *   - rows bucket by `id div PACK_FANOUT`; an in-bucket window
    *     (partitioned, <= PACK_FANOUT rows) gives the within-bucket sum;
    *   - bucket totals RECURSE through the same helper for their
    *     exclusive offsets (ids shrink by a PACK_FANOUT factor per level);
    *   - after [[PACK_LEVELS]] bucketings the leaf takes one window over
    *     an EXPLICIT constant partition key: the same single-partition
    *     execution a global-order window would use, but deliberate,
    *     bounded (<= PACK_FANOUT rows whenever ids < PACK_FANOUT^(levels
    *     +1), and still CORRECT beyond that — only the bound weakens),
    *     and free of WindowExec's "No Partition Defined" warning — so any
    *     unintended global window elsewhere in the suite stays loud, and
    *     PlanSpec can pin "no empty-partition window" over the whole
    *     packing plan.
    *
    * The depth is STRUCTURAL, not measured: plan construction runs zero
    * Spark jobs (the r9 version counted the input at every level, which
    * materialized the full token relation before the real job — the q80
    * 0.39->0.56 s regression). Extra levels on small inputs collapse to
    * single-row frames whose shuffles AQE coalesces; the per-level bucket
    * relations are NOT cached — the groupBy subtree appears twice in the
    * plan (spine + join-back) and ReuseExchange executes its shuffle once,
    * so nothing is left pinned in executor memory after the job.
    *
    * `id` must be unique and non-negative (doc ids / bucket ids). The
    * caller should cache `df`: it feeds both the bucket-sum spine and the
    * offset join-back. Level framing: the offsets join is a plain equi
    * join on the bucket key — AQE broadcasts it while the level is small
    * and falls back to shuffle when it is not. */
  private[graft] def exclusiveRunningSum(df: DataFrame, id: String,
      value: String, out: String, levels: Int = PACK_LEVELS): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (levels <= 0) {
      // pmod(id, 1) is constant 0 for these non-negative ids but NOT
      // foldable — a literal key would be stripped by Catalyst's
      // EliminateWindowPartitions and the window would silently revert to
      // the warned unpartitioned form this helper exists to ban
      val w = Window.partitionBy(pmod(col(id), lit(1L))).orderBy(col(id))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn(out, coalesce(sum(col(value)).over(w), lit(0L)))
    } else {
      // The offset column name is per-level: inner recursion levels are
      // themselves called with an `out` of the parent's `off`, so a shared
      // "__off" name would make this branch's trailing drop remove the
      // column the inner level just computed (the r10 q80/q97 breakage).
      val bkt = s"__bkt$levels"
      val off = s"__off$levels"
      val bsums = df.groupBy(expr(s"`$id` div $PACK_FANOUT").as(bkt))
        .agg(sum(col(value)).as(value))
      val offs = exclusiveRunningSum(bsums, bkt, value, off, levels - 1)
        .select(col(bkt), col(off))
      val wIn = Window.partitionBy(col(bkt)).orderBy(col(id))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn(bkt, expr(s"`$id` div $PACK_FANOUT"))
        .join(offs, Seq(bkt))
        .withColumn(out, col(off) + coalesce(sum(col(value)).over(wIn), lit(0L)))
        .drop(bkt, off)
    }
  }

  /** Context-window chunking geometry: 64-token windows advancing by 48
    * (16-token overlap) — the sequence-chunking step that turns variable-
    * length documents into fixed-budget training examples. Small enough
    * that multi-chunk docs are common at every test SF. */
  val CHUNK_TOKENS = 64
  val CHUNK_STRIDE = 48

  /** Overlapping fixed-size token chunks of every document — the
    * context-window splitter of a pretraining pipeline (each chunk is one
    * training example; the stride overlap preserves cross-boundary
    * context). Chunk `i` covers 0-based token positions
    * `[i*stride, min(i*stride+size, n))`; every token position is covered
    * and the final chunk may be short. Pure per-row array arithmetic
    * (sequence/explode/slice, all codegen'd): one scan, one generate, NO
    * shuffle — the plan is embarrassingly parallel at any corpus size,
    * and chunk rows land on the same partition as their document. */
  def chunkedDocs(docs: DataFrame, size: Int = CHUNK_TOKENS,
      stride: Int = CHUNK_STRIDE): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(org.apache.spark.sql.functions.size(col("w")) > 0)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0L), expr(s"(size(w)-1) div $stride"))).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        (col("chunk_idx") * stride).as("chunk_start"),
        slice(col("w"), (col("chunk_idx") * stride + 1).cast("int"), lit(size)).as("c"))
      .select(
        col("doc_id"), col("chunk_idx"), col("chunk_start"),
        org.apache.spark.sql.functions.size(col("c")).as("n_chunk_tokens"),
        md5(array_join(col("c"), " ")).as("chunk_md5"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q30_text_tokens",
      (s, d) =>
        documents(s, d)
          .select(
            col("lang"),
            size(tokens(col("text"))).as("n_ws"),
            lexTokenCount(col("text")).as("n_lex"),
            length(col("text")).as("n_chars"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_ws")).as("total_ws_tokens"),
            sum(col("n_lex")).as("total_lex_tokens"),
            max(col("n_ws")).as("max_ws_tokens"),
            round(sum(col("n_ws")) * lit(1.0) / sum(col("n_chars")), 6).as("tokens_per_char"))
          .orderBy(col("lang")),
      Some(s"""
        SELECT lang,
               count(*) AS n_docs,
               cast(sum(len($SQL_TOKENS)) as bigint) AS total_ws_tokens,
               cast(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) as bigint) AS total_lex_tokens,
               max(len($SQL_TOKENS)) AS max_ws_tokens,
               round(sum(len($SQL_TOKENS)) * 1.0 / sum(length(text)), 6) AS tokens_per_char
        FROM documents
        GROUP BY lang
        ORDER BY lang"""),
      "token counting: whitespace tokenizer + BPE-ish lexer regex"),

    QueryDef(
      "q31_text_quality",
      (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            length(col("text")).as("len"),
            size(tokens(col("text"))).as("n_tokens"),
            stopwordCount(col("text")).as("n_stop"),
            size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_punct"))
          .select(
            col("doc_id"), col("len"), col("n_tokens"),
            round(col("n_stop") * lit(1.0) / col("n_tokens"), 6).as("stopword_ratio"),
            round(col("n_punct") * lit(1.0) / col("len"), 6).as("punct_ratio"),
            round(col("len") * lit(1.0) / col("n_tokens"), 6).as("avg_token_len"),
            (col("len") >= 50 && col("len") <= 5000 &&
              col("n_stop") * lit(1.0) / col("n_tokens") < 0.5).as("passes_quality"))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 length(text) AS len,
                 len($SQL_TOKENS) AS n_tokens,
                 len(list_filter($SQL_TOKENS, t -> t IN $SQL_STOP)) AS n_stop,
                 len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
          FROM documents)
        SELECT doc_id, len, n_tokens,
               round(n_stop * 1.0 / n_tokens, 6) AS stopword_ratio,
               round(n_punct * 1.0 / len, 6) AS punct_ratio,
               round(len * 1.0 / n_tokens, 6) AS avg_token_len,
               (len >= 50 AND len <= 5000 AND n_stop * 1.0 / n_tokens < 0.5) AS passes_quality
        FROM t
        ORDER BY doc_id"""),
      "quality scoring: length / punctuation / stopword ratios + pass flag"),

    QueryDef(
      "q32_text_langid",
      (s, d) => {
        // heuristic n-gram language ID: score per language profile = count
        // of profile marker tokens, argmax with lexicographic tiebreak.
        // Tokenize once into a materialized column — three score columns
        // probe it and Project does not CSE the split.
        def score(markers: Seq[String]): Column =
          size(filter(col("toks"), t => t.isin(markers.map(lit): _*)))
        documents(s, d)
          .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
          .select(
            col("doc_id"), col("lang"),
            score(Seq("the", "a", "fast", "slow")).as("s_prose"),
            score(Seq("spark", "query", "join", "scan", "hash")).as("s_query"),
            score(Seq("row", "table", "value", "data")).as("s_data"))
          .withColumn("guess",
            when(col("s_prose") >= col("s_query") && col("s_prose") >= col("s_data"), "prose")
              .when(col("s_query") >= col("s_data"), "query")
              .otherwise("data"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH sc AS (
          SELECT doc_id, lang,
                 len(list_filter($SQL_TOKENS, t -> t IN ('the','a','fast','slow'))) AS s_prose,
                 len(list_filter($SQL_TOKENS, t -> t IN ('spark','query','join','scan','hash'))) AS s_query,
                 len(list_filter($SQL_TOKENS, t -> t IN ('row','table','value','data'))) AS s_data
          FROM documents)
        SELECT doc_id, lang, s_prose, s_query, s_data,
               CASE WHEN s_prose >= s_query AND s_prose >= s_data THEN 'prose'
                    WHEN s_query >= s_data THEN 'query'
                    ELSE 'data' END AS guess
        FROM sc
        ORDER BY doc_id"""),
      "heuristic language/domain ID: marker-token profiles + argmax"),

    QueryDef(
      "q33_fingerprint",
      (s, d) =>
        documents(s, d)
          .select(
            col("source"),
            md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp_exact"),
            canonicalFingerprint(col("text")).as("fp_canon"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("fp_exact")).as("n_exact_fp"),
            countDistinct(col("fp_canon")).as("n_canon_fp"),
            min(col("fp_canon")).as("min_canon_fp"))
          .orderBy(col("source")),
      Some(s"""
        WITH fp AS (
          SELECT source,
                 md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_exact,
                 md5(array_to_string(list_sort(list_distinct($SQL_TOKENS)), ' ')) AS fp_canon
          FROM documents)
        SELECT source,
               count(*) AS n_docs,
               count(DISTINCT fp_exact) AS n_exact_fp,
               count(DISTINCT fp_canon) AS n_canon_fp,
               min(fp_canon) AS min_canon_fp
        FROM fp
        GROUP BY source
        ORDER BY source"""),
      "document fingerprinting: normalized md5 + canonical word-set md5"),

    QueryDef(
      "q69_repetition",
      (s, d) => {
        // Repetition quality signals as used by large-corpus filters
        // (Rae et al., "Scaling Language Models: ... Gopher", 2021, §A1.1
        // repetition rules; C4's boilerplate filters, Raffel et al. 2020):
        // the fraction of mass in the most frequent word / bigram and the
        // duplicate-token fraction.
        //
        // Registered shape: two partial-aggregated groupBys. After the
        // map-side combine the exchanges carry one row per (doc, DISTINCT
        // gram) — bounded by document length, linear in the corpus. The
        // shuffle-free per-row fold exists as [[repetitionRowwise]]
        // (value-identical, spec-pinned) but loses 4x wall-clock here:
        // higher-order-function lambdas evaluate interpreted, outside
        // whole-stage codegen, so the mode fold's O(len x distinct)
        // comparisons cost more than the combined shuffle saves on a
        // single node. Pick the row-wise twin when the network, not CPU,
        // is the binding constraint.
        val toks = graft.Caches.lease(repetitionTokens(documents(s, d)))
        val wstats = toks.select(col("doc_id"), explode(col("toks")).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(max(col("c")).as("topw"), sum(col("c")).as("nw"),
            count(lit(1)).as("ndw"))
        val bstats = toks.select(col("doc_id"), explode(col("bigs")).as("b"))
          .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(max(col("c")).as("topb"), sum(col("c")).as("nb"))
        // left join: a 1-token doc has words but no bigrams on both engines
        wstats.join(bstats, Seq("doc_id"), "left")
          .select(col("doc_id"),
            round(col("topw") * 1.0 / col("nw"), 4).as("top_word_frac"),
            round((col("nw") - col("ndw")) * 1.0 / col("nw"), 4).as("dup_word_frac"),
            coalesce(round(col("topb") * 1.0 / col("nb"), 4), lit(0.0)).as("top_bigram_frac"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest($SQL_TOKENS) AS w FROM documents),
        wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
        ws AS (SELECT doc_id, max(c) AS topw, sum(c) AS nw, count(*) AS ndw
               FROM wc GROUP BY 1),
        bg AS (
          SELECT doc_id, unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS b
          FROM (SELECT doc_id, $SQL_TOKENS AS a FROM documents)),
        bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        bs AS (SELECT doc_id, max(c) AS topb, sum(c) AS nb FROM bc GROUP BY 1)
        SELECT ws.doc_id,
               round(topw * 1.0 / nw, 4) AS top_word_frac,
               round((nw - ndw) * 1.0 / nw, 4) AS dup_word_frac,
               coalesce(round(topb * 1.0 / nb, 4), 0.0) AS top_bigram_frac
        FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
        ORDER BY ws.doc_id"""),
      "repetition quality signals: top-word/top-bigram mass + duplicate-token fraction"),

    QueryDef(
      "q70_hash_split",
      (s, d) =>
        // deterministic train/val/test assignment: hex-prefix ranges of
        // md5(doc_id) — content-stable (same doc -> same split on every
        // run, engine, and cluster size; no RNG or partitioning state),
        // embarrassingly parallel, and exact across engines because the
        // split is a pure string comparison. '0c'/256 ≈ 4.7% test,
        // '0c'..'1a' ≈ 5.5% val, rest train.
        documents(s, d)
          .select(col("lang"), col("source"),
            splitCoin(col("doc_id")).as("split"))
          .groupBy(col("lang"), col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("source"), col("split")),
      Some(s"""
        SELECT lang, source,
               ${sqlSplitCoin("doc_id")} AS split,
               count(*) AS n_docs
        FROM documents
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3"""),
      "deterministic md5-prefix train/val/test split: content-stable stratified sampling"),

    QueryDef(
      "q73_decontamination",
      (s, d) => {
        // Benchmark decontamination (the GPT-3 appendix-C / Gopher
        // pre-release filter): flag training documents sharing word
        // n-grams with an evaluation set so eval scores aren't measuring
        // memorized training text. Here the 'benchmark' is the src0 slice
        // of the corpus; everything else is the training side.
        //
        // 100 TB shape: the benchmark gram set is TINY next to the corpus
        // (eval suites are MBs, corpora are TBs) -> broadcast it; the
        // probe is then a map-side equi join on (lang, gram) with no
        // shuffle of the corpus grams. The benchmark side is DISTINCT, so
        // each training gram matches at most one row — candidate volume is
        // bounded by the training gram count, df-skew-free by
        // construction. Counts partial-aggregate before the per-doc join.
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"),
            tokens(col("text")).as("w"))
          .filter(size(col("w")) >= 3)
        val grams = toks.select(col("doc_id"), col("lang"), col("source"),
          explode(trigramSet(col("w"))).as("g"))
        val bench = grams.filter(col("source") === "src0")
          .select(col("lang"), col("g")).distinct()
        val train = grams.filter(col("source") =!= "src0")
          .select(col("doc_id"), col("lang"), col("g"))
        val hits = train.join(broadcast(bench), Seq("lang", "g"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
        train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            round(coalesce(col("n_hits"), lit(0L)) * lit(1.0) / col("n_grams"), 4)
              .as("contamination"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, lang, source, $SQL_TOKENS AS w
          FROM documents),
        grams AS (
          SELECT doc_id, lang, source, unnest(list_distinct(
            list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS g
          FROM toks WHERE len(w) >= 3),
        bench AS (SELECT DISTINCT lang, g FROM grams WHERE source = 'src0'),
        train AS (SELECT doc_id, lang, g FROM grams WHERE source <> 'src0'),
        hits AS (
          SELECT t.doc_id, count(*) AS n_hits
          FROM train t JOIN bench b ON t.lang = b.lang AND t.g = b.g
          GROUP BY 1),
        tot AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY 1)
        SELECT tot.doc_id, n_grams, coalesce(n_hits, 0) AS n_hits,
               round(coalesce(n_hits, 0) * 1.0 / n_grams, 4) AS contamination
        FROM tot LEFT JOIN hits USING (doc_id)
        ORDER BY doc_id"""),
      "benchmark decontamination: trigram overlap of training docs vs the eval slice, broadcast probe"),

    QueryDef(
      "q74_tfidf",
      (s, d) => {
        // TF-IDF keyword extraction, language-scoped (idf computed within
        // each language's sub-corpus — a multilingual corpus must not let
        // English df deflate Chinese idf). Two partial-aggregated groupBys
        // (tf per doc-word, df per lang-word) + a per-lang doc count — all
        // equi joins on bounded keys, no driver state. The top-3 terms per
        // doc rank on the ROUNDED score with a term-asc tiebreak, so the
        // ordering is identical in any engine regardless of last-bit ln()
        // differences.
        import org.apache.spark.sql.expressions.Window
        val docs = documents(s, d)
        val nl = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
        val tf = docs.select(col("doc_id"), col("lang"),
            explode(tokens(col("text"))).as("word"))
          .groupBy(col("doc_id"), col("lang"), col("word"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("lang"), col("word"))
          .agg(count(lit(1)).as("df"))
        val scored = tf.join(dfreq, Seq("lang", "word"))
          .join(broadcast(nl), Seq("lang"))
          .select(col("doc_id"), col("word"),
            round(col("tf") * log(col("nl") * lit(1.0) / col("df")), 4).as("tfidf"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("word"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("word"), col("tfidf"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some(s"""
        WITH words AS (
          SELECT doc_id, lang, unnest($SQL_TOKENS) AS word FROM documents),
        tf AS (
          SELECT doc_id, lang, word, count(*) AS tf
          FROM words
          GROUP BY 1, 2, 3),
        dfreq AS (SELECT lang, word, count(*) AS df FROM tf GROUP BY 1, 2),
        nl AS (SELECT lang, count(*) AS nl FROM documents GROUP BY 1),
        scored AS (
          SELECT tf.doc_id, tf.word,
                 round(tf.tf * ln(nl.nl * 1.0 / dfreq.df), 4) AS tfidf
          FROM tf
          JOIN dfreq ON tf.lang = dfreq.lang AND tf.word = dfreq.word
          JOIN nl ON tf.lang = nl.lang),
        ranked AS (
          SELECT doc_id, word, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, word) AS rk
          FROM scored)
        SELECT doc_id, rk, word, tfidf FROM ranked WHERE rk <= 3
        ORDER BY doc_id, rk"""),
      "language-scoped TF-IDF top-3 keywords per document (partial-agg tf/df, broadcast doc counts)"),

    QueryDef(
      "q75_weighted_sample",
      (s, d) => {
        // Quality-weighted deterministic downsampling (the C4/FineWeb
        // pattern: keep probability follows a per-doc quality weight).
        // Like q70 the coin is an md5-prefix range — content-stable, no
        // RNG, exact across engines because keep/drop is a pure string
        // comparison — but the THRESHOLD now depends on the doc's quality
        // tier (token count as the stand-in signal): long docs keep at
        // ~80% ('cc'/256), mid at ~50% ('80'), short at ~10% ('1a').
        // Embarrassingly parallel: per-row hash + compare, one final agg.
        val docs = documents(s, d)
        val n = size(tokens(col("text")))
        val tier = when(n >= 60, "long").when(n >= 40, "mid").otherwise("short")
        val cut = when(n >= 60, "cc").when(n >= 40, "80").otherwise("1a")
        docs.select(col("lang"), tier.as("tier"),
            (md5(col("doc_id").cast("string")) < cut).as("kept"))
          .groupBy(col("lang"), col("tier"), col("kept"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("tier"), col("kept"))
      },
      Some(s"""
        WITH t AS (
          SELECT lang, len($SQL_TOKENS) AS n,
                 md5(doc_id::VARCHAR) AS h
          FROM documents)
        SELECT lang,
               CASE WHEN n >= 60 THEN 'long'
                    WHEN n >= 40 THEN 'mid' ELSE 'short' END AS tier,
               h < (CASE WHEN n >= 60 THEN 'cc'
                         WHEN n >= 40 THEN '80' ELSE '1a' END) AS kept,
               count(*) AS n_docs
        FROM t
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3"""),
      "quality-weighted deterministic sampling: md5-coin with tier-dependent keep thresholds"),

    QueryDef(
      "q76_pii_redaction",
      (s, d) => {
        // PII detection/redaction audit (the C4 / FineWeb pre-release
        // scrub): count and mask pattern families per document slice. The
        // patterns use only RE2-safe syntax (classes, bounded repeats, \b)
        // so Java regex (Spark) and RE2 (DuckDB) agree match-for-match.
        // The synthetic corpus contains no digits or @-tokens, so the PII
        // counters are legitimately zero here — their match semantics are
        // pinned on real fixtures in TextAnalysisSpec; the long-word
        // channel exercises the same count+replace machinery with nonzero,
        // hash-checked output. Per-row regex work, one final aggregate —
        // embarrassingly parallel at any corpus size.
        val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val IPV4 = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
        val PHONE = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
        val LONG = "\\b[a-z]{6,}\\b"
        documents(s, d)
          .select(col("lang"), col("source"),
            regexp_count(col("text"), lit(EMAIL)).as("n_email"),
            regexp_count(col("text"), lit(IPV4)).as("n_ipv4"),
            regexp_count(col("text"), lit(PHONE)).as("n_phone"),
            regexp_count(col("text"), lit(LONG)).as("n_long"),
            length(regexp_replace(col("text"), LONG, "[TOK]")).as("masked_len"))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_email")).as("n_email"),
            sum(col("n_ipv4")).as("n_ipv4"),
            sum(col("n_phone")).as("n_phone"),
            sum(col("n_long")).as("n_long"),
            sum(col("masked_len")).as("masked_chars"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""
        WITH m AS (
          SELECT lang, source,
                 len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                 len(regexp_extract_all(text, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS n_ipv4,
                 len(regexp_extract_all(text, '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS n_phone,
                 len(regexp_extract_all(text, '\b[a-z]{6,}\b')) AS n_long,
                 length(regexp_replace(text, '\b[a-z]{6,}\b', '[TOK]', 'g')) AS masked_len
          FROM documents)
        SELECT lang, source, count(*) AS n_docs,
               cast(sum(n_email) as bigint) AS n_email,
               cast(sum(n_ipv4) as bigint) AS n_ipv4,
               cast(sum(n_phone) as bigint) AS n_phone,
               cast(sum(n_long) as bigint) AS n_long,
               cast(sum(masked_len) as bigint) AS masked_chars
        FROM m
        GROUP BY 1, 2
        ORDER BY 1, 2"""),
      "PII redaction audit: RE2-safe pattern counts + masked-length checksum per slice"),

    QueryDef(
      "q77_span_dedup",
      (s, d) => {
        // Cross-document duplicated-span fraction (the RefinedWeb /
        // Dolma "duplicated n-gram fraction" signal, Penedo et al. 2023):
        // for each doc, the share of its distinct 5-gram spans that also
        // appear in ANOTHER document. Unlike q69 (intra-doc repetition)
        // this measures corpus-level boilerplate.
        //
        // 100 TB shape: grams aggregate to (gram, df) first — a partial-
        // aggregated groupBy, so a boilerplate gram in a million docs is
        // ONE row after the map-side combine — then each doc's grams
        // equi-join that df table by gram. Candidate volume is the gram
        // count itself (linear), never a pair space: this is the
        // df-aggregation shape, not q35's pair-join bomb.
        val n = 5
        val toks = documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .filter(size(col("w")) >= n)
        val grams = toks.select(col("doc_id"),
          explode(array_distinct(
            transform(sequence(lit(0), size(col("w")) - n), i =>
              concat_ws(" ", (0 until n).map(j =>
                element_at(col("w"), i + j + 1)): _*)))).as("g"))
        // grams are distinct within a doc, so count(*) == doc frequency
        val gdf = grams.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
        grams.join(gdf, Seq("g"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("gdf") > 1, 1L).otherwise(0L)).as("n_shared"))
          .select(col("doc_id"), col("n_grams"), col("n_shared"),
            round(col("n_shared") * lit(1.0) / col("n_grams"), 4).as("shared_frac"))
        // unordered output: the gate sorts rows itself
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, $SQL_TOKENS AS w FROM documents),
        grams AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(range(1, len(w) - 3),
              i -> array_to_string(w[i:i+4], ' ')))) AS g
          FROM toks WHERE len(w) >= 5),
        gd AS (SELECT g, count(*) AS gdf FROM grams GROUP BY 1)
        SELECT doc_id, count(*) AS n_grams,
               cast(sum(CASE WHEN gdf > 1 THEN 1 ELSE 0 END) as bigint) AS n_shared,
               round(sum(CASE WHEN gdf > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS shared_frac
        FROM grams JOIN gd USING (g)
        GROUP BY doc_id
        ORDER BY doc_id"""),
      "cross-doc duplicated 5-gram span fraction: gram-df aggregation, no pair join"),

    QueryDef(
      "q80_shard_packing",
      (s, d) => {
        // Deterministic training-shard packing: docs are laid out in
        // doc_id order and cut into shards of ~BUDGET tokens (a doc starts
        // its shard at floor(running_tokens / BUDGET) — the sequence-
        // packing layout step every pretraining pipeline runs last).
        //
        // The naive plan is sum(t) OVER (ORDER BY doc_id) — a global-order
        // window, which Spark executes in ONE partition: the classic scale
        // killer. [[exclusiveRunningSum]] computes the SAME running sum as
        // a log-depth bucket-sum recursion in which no window partition
        // ever holds more than ~PACK_FANOUT rows at ANY corpus size;
        // PlanSpec pins that no empty-partition window survives anywhere
        // in the plan. cache: the token relation feeds the bucket-sum
        // spine AND the offset join-back.
        val BUDGET = 2000L
        val toks = graft.Caches.lease(documents(s, d)
          .select(col("doc_id"), size(tokens(col("text"))).as("t")))
        exclusiveRunningSum(toks, "doc_id", "t", "start")
          .withColumn("shard", expr(s"start div $BUDGET"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("shard"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, len($SQL_TOKENS) AS t FROM documents),
        c AS (
          SELECT doc_id, t,
                 cast(coalesce(sum(t) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS start
          FROM t)
        SELECT start // 2000 AS shard,
               count(*) AS n_docs,
               cast(sum(t) as bigint) AS n_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM c
        GROUP BY 1
        ORDER BY 1"""),
      "training-shard packing: hierarchical prefix sum (bucket offsets + partitioned window), no global-order window"),

    QueryDef(
      "q81_mixture_balance",
      (s, d) => {
        // Data-mixture rebalancing: downsample every source to the
        // smallest source's size WITHIN its language (uniform source
        // mixture per lang — the static version of Pile/DoReMi domain
        // reweighting). The keep decision is a 16-bit md5 coin against a
        // per-source threshold k = (min_count * 65536) div count —
        // ALL-INTEGER arithmetic and a lexicographic hex compare, so the
        // kept set is bit-identical on any engine, cluster layout, or
        // rerun, and changing one source's size never reshuffles another
        // source's kept set (per-doc independence). Per-source counts are
        // one partial-agg groupBy; thresholds broadcast back — no
        // corpus-sized shuffle beyond the count itself.
        val counts = documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"))
        val minc = counts.groupBy(col("lang")).agg(min(col("n_docs")).as("min_docs"))
        val thresholds = counts.join(broadcast(minc), Seq("lang"))
          .withColumn("k", expr("(min_docs * 65536) div n_docs"))
        documents(s, d)
          .join(broadcast(thresholds), Seq("lang", "source"))
          .withColumn("kept",
            col("k") >= 65536 ||
              substring(md5(col("doc_id").cast("string")), 1, 4) <
                lower(lpad(hex(col("k")), 4, "0")))
          .groupBy(col("lang"), col("source"), col("n_docs"), col("k"))
          .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""
        WITH counts AS (
          SELECT lang, source, count(*) AS n_docs
          FROM documents GROUP BY 1, 2),
        minc AS (SELECT lang, min(n_docs) AS min_docs FROM counts GROUP BY 1),
        thresholds AS (
          SELECT lang, source, n_docs,
                 (min_docs * 65536) // n_docs AS k
          FROM counts JOIN minc USING (lang))
        SELECT d.lang, d.source, t.n_docs, t.k,
               cast(sum(CASE WHEN t.k >= 65536 OR
                 substr(md5(d.doc_id::VARCHAR), 1, 4) <
                   lower(lpad(hex(t.k), 4, '0'))
                 THEN 1 ELSE 0 END) as bigint) AS n_kept
        FROM documents d
        JOIN thresholds t ON d.lang = t.lang AND d.source = t.source
        GROUP BY 1, 2, 3, 4
        ORDER BY 1, 2"""),
      "mixture rebalancing: per-source integer-hex coin thresholds -> uniform source mix per language"),

    QueryDef(
      "q83_unigram_xent",
      (s, d) => unigramXent(documents(s, d)),
      Some(s"""
        WITH words AS (
          SELECT doc_id, lang, unnest($SQL_TOKENS) AS word FROM documents),
        wc AS (SELECT lang, word, count(*) AS wc FROM words GROUP BY 1, 2),
        totals AS (SELECT lang, cast(sum(wc) as bigint) AS wtot FROM wc GROUP BY 1),
        cost AS (
          SELECT w.doc_id, w.lang,
                 cast(round(-ln(wc.wc * 1.0 / totals.wtot) * 1000000) as bigint) AS c6
          FROM words w
          JOIN wc ON w.lang = wc.lang AND w.word = wc.word
          JOIN totals ON w.lang = totals.lang),
        perdoc AS (
          SELECT doc_id, lang, count(*) AS n_tokens,
                 (cast(sum(c6) as bigint) // count(*)) // 100 AS x4
          FROM cost GROUP BY 1, 2),
        stats AS (
          SELECT lang,
                 cast(sum(x4) as bigint) * 1.0 / count(*) AS mu4,
                 sqrt(cast(sum(x4 * x4) as bigint) * 1.0 / count(*) -
                      (cast(sum(x4) as bigint) * 1.0 / count(*)) *
                      (cast(sum(x4) as bigint) * 1.0 / count(*))) AS sd4
          FROM perdoc GROUP BY 1)
        SELECT doc_id, n_tokens, x4 / 10000.0 AS xent,
               abs(x4 - mu4) > 2.0 * sd4 AS is_outlier
        FROM perdoc JOIN stats USING (lang)
        ORDER BY doc_id"""),
      "unigram cross-entropy quality filter: CCNet-style LM scoring with exact integer accumulation"),

    QueryDef(
      "q85_vocab_stats",
      (s, d) => {
        // Corpus vocabulary report (the curation-dashboard numbers every
        // corpus release publishes): per language — token mass, vocabulary
        // size, hapax count (words seen once — the Zipf tail), type-token
        // ratio, and top-word mass share. One partial-agg groupBy
        // (lang, word) then a per-lang rollup of that bounded relation;
        // nothing corpus-sized survives the first aggregate.
        val wc = documents(s, d)
          .select(col("lang"), explode(tokens(col("text"))).as("word"))
          .groupBy(col("lang"), col("word"))
          .agg(count(lit(1)).as("c"))
        wc.groupBy(col("lang"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("vocab"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
            max(col("c")).as("top_word_count"))
          .select(col("lang"), col("n_tokens"), col("vocab"), col("hapax"),
            round(col("vocab") * lit(1.0) / col("n_tokens"), 6).as("type_token_ratio"),
            round(col("top_word_count") * lit(1.0) / col("n_tokens"), 6).as("top_word_share"))
          .orderBy(col("lang"))
      },
      Some(s"""
        WITH wc AS (
          SELECT lang, unnest($SQL_TOKENS) AS word FROM documents),
        counts AS (SELECT lang, word, count(*) AS c FROM wc GROUP BY 1, 2),
        agg AS (
          SELECT lang,
                 cast(sum(c) as bigint) AS n_tokens,
                 count(*) AS vocab,
                 cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) as bigint) AS hapax,
                 max(c) AS top_word_count
          FROM counts GROUP BY 1)
        SELECT lang, n_tokens, vocab, hapax,
               round(vocab * 1.0 / n_tokens, 6) AS type_token_ratio,
               round(top_word_count * 1.0 / n_tokens, 6) AS top_word_share
        FROM agg
        ORDER BY lang"""),
      "corpus vocabulary report: token mass, vocab, hapax tail, type-token ratio per language"),

    QueryDef(
      "q91_span_removal",
      (s, d) => {
        // Duplicated-span REMOVAL (the rewrite step of Lee et al.,
        // "Deduplicating Training Data Makes Language Models Better",
        // 2021): where q77 only measures cross-doc duplicated 5-gram
        // spans, this excises them — every token position covered by a
        // gram that also appears in another document is dropped and the
        // cleaned text is re-emitted (fingerprinted here so the oracle
        // hash-checks the rewrite itself).
        //
        // Shape: linear gram stream, no pair join; the per-doc rewrite is
        // pure array arithmetic — covered positions = union of [i, i+4]
        // over duplicated gram starts — inside the row. A doc with no
        // duplicated spans passes through byte-identical.
        val n = 5
        val toks = graft.Caches.lease(documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .filter(size(col("w")) >= n)) // grams source + the final rewrite join re-read it
        val grams = toks.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), size(col("w")) - n), i =>
            concat_ws(" ", (0 until n).map(j =>
              element_at(col("w"), i + j + 1)): _*))).as(Seq("i", "g")))
        // Cross-doc grams only (a gram repeated within one doc is q69's
        // business): a gram lives in >1 DISTINCT doc iff its min and max
        // doc_id differ — ONE partial-aggregated shuffle on the gram,
        // where the former distinct(doc_id, g) + groupBy(g) pair cost two
        // full gram-stream exchanges (min/max combine map-side; DISTINCT
        // can't shrink before the wire).
        val dupG = grams.groupBy(col("g"))
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select(col("g"))
        val dupStarts = grams.join(dupG, Seq("g"))
          .groupBy(col("doc_id"))
          .agg(collect_set(col("i")).as("starts"))
        toks.join(dupStarts, Seq("doc_id"), "left")
          .select(col("doc_id"), col("w"),
            coalesce(array_distinct(flatten(transform(
              coalesce(col("starts"), array().cast("array<int>")),
              i => sequence(i, i + n - 1)))), array().cast("array<int>"))
              .as("covered"))
          .select(col("doc_id"),
            size(col("w")).as("n_tokens"),
            size(col("covered")).as("n_removed"),
            md5(concat_ws(" ",
              filter(transform(sequence(lit(0), size(col("w")) - 1), p =>
                when(array_contains(col("covered"), p), lit(null))
                  .otherwise(element_at(col("w"), p + 1))),
                t => t.isNotNull))).as("cleaned_fp"))
        // unordered output: the gate sorts rows itself
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, $SQL_TOKENS AS w FROM documents),
        docs AS (SELECT doc_id, w FROM toks WHERE len(w) >= 5),
        grams AS (
          SELECT doc_id, i - 1 AS i, array_to_string(w[i:i+4], ' ') AS g
          FROM docs, unnest(range(1, len(w) - 3)) AS t(i)),
        gdf AS (
          SELECT g, count(*) AS gdf
          FROM (SELECT DISTINCT doc_id, g FROM grams) GROUP BY 1),
        dup AS (
          SELECT doc_id, list(DISTINCT grams.i) AS starts
          FROM grams JOIN gdf USING (g)
          WHERE gdf > 1
          GROUP BY 1),
        covered AS (
          SELECT d.doc_id, d.w,
                 coalesce(list_distinct(flatten(list_transform(
                   coalesce(dup.starts, []),
                   i -> range(i, i + 5)))), []) AS cov
          FROM docs d LEFT JOIN dup USING (doc_id))
        SELECT doc_id,
               len(w) AS n_tokens,
               len(cov) AS n_removed,
               -- coalesce: array_to_string([]) is NULL in DuckDB where
               -- Spark's concat_ws gives '' (a fully-excised doc)
               md5(coalesce(array_to_string(
                 list_filter(list_transform(range(0, len(w)),
                   p -> CASE WHEN list_contains(cov, p) THEN NULL
                             ELSE w[p + 1] END),
                   t -> t IS NOT NULL), ' '), '')) AS cleaned_fp
        FROM covered
        ORDER BY doc_id"""),
      "cross-doc duplicated-span removal: gram-df detection + in-row span excision, hash-checked rewrite"),

    QueryDef(
      "q97_curation_pipeline",
      (s, d) => {
        // The composed curation run every pretraining pipeline executes —
        // exact-dedup -> quality gate -> deterministic split -> shard
        // packing — as ONE declarative plan, each stage in the exact
        // semantics its standalone query pins (q34's canonical
        // fingerprint, q70's md5-prefix coin, q80's hierarchical prefix
        // sum). Composition is the product's real use; this puts the
        // chained plan itself under the oracle so stage-boundary drift
        // (a changed fingerprint, a reordered filter) can't hide behind
        // individually-green stages. All linear: one fingerprint shuffle,
        // map-side gates, the packing's bucket-sum spine.
        import org.apache.spark.sql.expressions.Window
        val BUDGET = 2000L
        val MIN_TOKENS = 30
        // 1) exact dedup: min-doc_id survivor per canonical fingerprint
        val surv = documents(s, d)
          .select(col("doc_id"), col("text"),
            canonicalFingerprint(col("text")).as("fp"))
          .withColumn("keep_id",
            min(col("doc_id")).over(Window.partitionBy(col("fp"))))
          .filter(col("doc_id") === col("keep_id"))
        // 2) quality gate + 3) train-split coin (both map-side)
        val train = surv
          .select(col("doc_id"), size(tokens(col("text"))).as("t"))
          .filter(col("t") >= MIN_TOKENS)
          .filter(md5(col("doc_id").cast("string")) >= "1a")
        // 4) q80's hierarchical prefix-sum packing over the curated
        // stream. cache: the curated token relation feeds the bucket-sum
        // spine AND the offset join-back — without it the dedup window
        // and gates would execute twice.
        exclusiveRunningSum(graft.Caches.lease(train), "doc_id", "t", "start")
          .withColumn("shard", expr(s"start div $BUDGET"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("shard"))
      },
      Some(s"""
        WITH fp AS (
          SELECT doc_id, text,
                 md5(array_to_string(list_sort(list_distinct($SQL_TOKENS)), ' ')) AS fp
          FROM documents),
        surv AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text, min(doc_id) OVER (PARTITION BY fp) AS keep_id
            FROM fp)
          WHERE doc_id = keep_id),
        t AS (
          SELECT doc_id, len($SQL_TOKENS) AS t
          FROM surv
          WHERE len($SQL_TOKENS) >= 30
            AND md5(doc_id::VARCHAR) >= '1a'),
        c AS (
          SELECT doc_id, t,
                 cast(coalesce(sum(t) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS start
          FROM t)
        SELECT start // 2000 AS shard,
               count(*) AS n_docs,
               cast(sum(t) as bigint) AS n_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM c
        GROUP BY 1
        ORDER BY 1"""),
      "composed curation pipeline: exact-dedup -> quality gate -> split coin -> shard packing under one oracle"),

    QueryDef(
      "q100_inverted_index",
      (s, d) => {
        // See [[invertedIndex]] for the range-bucketed layout. The
        // registered output pins the FULL posting list as a scalar md5
        // digest of the comma-joined sorted ids — the driver's hasher
        // sorts on raw cell values, so an array-typed column would crash
        // it; `invertedIndex` keeps the array-returning API.
        invertedIndex(s, d)
          .withColumn("postings",
            expr("md5(array_join(transform(postings, x -> cast(x as string)), ','))"))
          .orderBy(col("word"), col("bucket"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, unnest($SQL_TOKENS) AS word FROM documents),
        tfc AS (
          SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2)
        SELECT word, doc_id // $INDEX_BUCKET AS bucket,
               count(*) AS n_docs,
               cast(sum(tf) as bigint) AS tf_sum,
               md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings
        FROM tfc
        GROUP BY 1, 2
        ORDER BY word, bucket"""),
      "inverted index: range-bucketed posting lists, per-row state bounded by the bucket width"),

    QueryDef(
      "q146_incremental_index",
      (s, d) => {
        // Incremental inverted-index maintenance: the q100 index absorbs
        // a new-docs batch WITHOUT a corpus rebuild. Stored state per
        // (word, bucket) is ALGEBRAIC — n_docs/tf_sum merge by sum, and
        // the posting-set signature is an order-independent modular sum
        // of per-doc md5 draws (q101's residue discipline) — so
        // merge(index(base), index(delta)) == index(base ∪ delta), which
        // the oracle proves by recomputing from ALL documents (q113's
        // contract applied to the retrieval index; q100 keeps the exact
        // posting digest for the rebuild path). Base = doc_id%4 != 3
        // (the stored index), delta = the %4 == 3 incoming batch.
        //
        // 100 TB shape: buckets are doc_id ranges, so a mostly-append
        // corpus touches only its newest buckets' states; the full-outer
        // merge passes every untouched (word, bucket) row through, and
        // bucketing the stored index by word co-locates the merge AND
        // the q78-style term probes without a shuffle.
        val P = POSTING_SIG_P
        def sig(c: Column): Column = postingSigDraw(c)
        def idx(df: DataFrame) = df
          .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
          .groupBy(col("doc_id"), col("word"))
          .agg(count(lit(1)).as("tf"))
          .groupBy(col("word"), expr(s"doc_id div $INDEX_BUCKET").as("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("tf_sum"),
            pmod(sum(sig(col("doc_id"))), lit(P)).as("set_sig"))
        val docs = documents(s, d)
        val base = idx(docs.filter(pmod(col("doc_id"), lit(4)) =!= 3))
        val delta = idx(docs.filter(pmod(col("doc_id"), lit(4)) === 3))
        base.select(col("word"), col("bucket"), col("n_docs").as("bn"),
            col("tf_sum").as("bt"), col("set_sig").as("bs"))
          .join(delta.select(col("word"), col("bucket"), col("n_docs").as("dn"),
              col("tf_sum").as("dt"), col("set_sig").as("ds")),
            Seq("word", "bucket"), "full_outer")
          .select(col("word"), col("bucket"),
            (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_docs"),
            (coalesce(col("bt"), lit(0L)) + coalesce(col("dt"), lit(0L))).as("tf_sum"),
            pmod(coalesce(col("bs"), lit(0L)) + coalesce(col("ds"), lit(0L)),
              lit(P)).as("set_sig"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, unnest($SQL_TOKENS) AS word FROM documents),
        tfc AS (
          SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2)
        SELECT word, doc_id // $INDEX_BUCKET AS bucket,
               count(*) AS n_docs,
               cast(sum(tf) as bigint) AS tf_sum,
               cast(sum(CAST(concat('0x', substr(md5('ps:' || doc_id::VARCHAR), 1, 12)) AS BIGINT)
                 % $POSTING_SIG_P) % $POSTING_SIG_P as bigint) AS set_sig
        FROM tfc
        GROUP BY 1, 2"""),
      "incremental index maintenance: algebraic posting-state merge == full rebuild, oracle-proven"),

    QueryDef(
      "q101_epoch_shuffle",
      (s, d) => {
        // Deterministic training-epoch shuffle: every doc gets a keyed md5
        // draw; the first two hex chars assign one of 256 shards and the
        // full hash orders docs WITHIN the shard. This is how a 100 TB
        // epoch shuffle actually executes — hash-bucket to writer tasks,
        // sort locally within each — with NO global sort anywhere: the
        // only window is partitioned by shard (corpus/256 rows; widen the
        // prefix to 3-4 hex chars as the corpus grows). The per-shard
        // order_sig is an all-integer checksum of the exact permutation,
        // so the oracle pins the full shuffled ORDER, not just shard
        // membership; it accumulates MODULARLY (every product residue
        // < P = 1000003 before summing) so the Spark long sum and the
        // oracle's HUGEINT sum agree at any corpus size — a raw
        // sum(pos * (doc_id mod P)) silently wraps 64 bits near the
        // 10^10-doc design point while DuckDB's does not. The summed
        // residues themselves overflow only past ~9e12 rows PER SHARD.
        // Changing the salt ("epoch2:") reshuffles every epoch
        // independently.
        //
        // PRECONDITION: doc_id (and pos, by construction) are
        // non-negative. Spark's pmod yields residues in [0, P) while
        // DuckDB's % keeps the dividend's sign, so the two order_sig
        // spellings agree only on non-negative inputs; a hash-derived
        // (possibly negative) doc id would need the oracle rewritten as
        // ((doc_id % P + P) % P) for unconditional parity.
        import org.apache.spark.sql.expressions.Window
        val P = 1000003L
        val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
        documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            md5(concat(lit("epoch1:"), col("doc_id").cast("string"))).as("h"))
          .withColumn("shard", substring(col("h"), 1, 2))
          .withColumn("pos", row_number().over(w).cast("long"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"),
            pmod(sum(pmod(pmod(col("pos"), lit(P)) * pmod(col("doc_id"), lit(P)),
              lit(P))), lit(P)).as("order_sig"))
          .orderBy(col("shard"))
      },
      Some("""
        WITH h AS (
          SELECT doc_id, n_chars, md5('epoch1:' || doc_id::VARCHAR) AS h
          FROM documents),
        pos AS (
          SELECT doc_id, n_chars, substr(h, 1, 2) AS shard,
                 row_number() OVER (PARTITION BY substr(h, 1, 2)
                                    ORDER BY h, doc_id) AS pos
          FROM h)
        SELECT shard, count(*) AS n_docs,
               cast(sum(n_chars) as bigint) AS n_chars,
               cast(sum((pos % 1000003) * (doc_id % 1000003) % 1000003)
                    % 1000003 as bigint) AS order_sig
        FROM pos
        GROUP BY shard
        ORDER BY shard"""),
      "epoch shuffle: hash-bucketed shards + within-shard order, permutation pinned by integer checksum"),

    QueryDef(
      "q102_domain_cap",
      (s, d) => {
        // Per-domain document cap (the RefinedWeb/C4 anti-boilerplate
        // step: no source may contribute more than K docs): keep the K
        // docs with the smallest salted md5 coin per (lang, source) — a
        // deterministic uniform sample, independent of corpus layout. The
        // scale shape is the [[graft.operators.Aggregates.MinKByCoin]]
        // bounded aggregator, NOT row_number over a domain window: a
        // mega-domain with 10^9 docs still contributes at most K
        // candidates per partition to the merge, where the window form
        // would sort the whole domain through one partition. The salt
        // ("cap1:") decorrelates this draw from q70/q81's split/mixture
        // coins so composed pipelines don't systematically keep the same
        // documents.
        val K = 25
        val mink = udaf(new graft.operators.Aggregates.MinKByCoin(K))
        documents(s, d)
          .select(col("lang"), col("source"), col("doc_id"),
            md5(concat(lit("cap1:"), col("doc_id").cast("string"))).as("coin"))
          .groupBy(col("lang"), col("source"))
          .agg(mink(col("coin"), col("doc_id")).as("kept"))
          .select(col("lang"), col("source"),
            posexplode(col("kept")).as(Seq("pos", "doc_id")))
          .select(col("lang"), col("source"),
            (col("pos") + 1).cast("long").as("rank"), col("doc_id"))
          .orderBy(col("lang"), col("source"), col("rank"))
      },
      Some("""
        SELECT lang, source, rank, doc_id FROM (
          SELECT lang, source, doc_id,
                 row_number() OVER (PARTITION BY lang, source
                                    ORDER BY md5('cap1:' || doc_id::VARCHAR), doc_id) AS rank
          FROM documents)
        WHERE rank <= 25
        ORDER BY lang, source, rank"""),
      "per-domain cap: bounded min-k coin sample per (lang,source), no domain-sized window sort"),

    QueryDef(
      "q103_pmi_collocations",
      (s, d) => {
        // Collocation mining by pointwise mutual information (Church &
        // Hanks 1990): pmi(a,b) = ln(c_ab * N / (c_a * c_b)) over
        // adjacent-token bigrams, token-normalized. Surfaces the corpus's
        // multiword units (the phrase-vocabulary signal tokenizer and
        // quality teams read). Determinism: PMI is rounded to integer
        // micros (the q83 fixed-point idiom) and the double expression is
        // written with identical association in both engines. Shape: two
        // partial-agg counts; bigrams >= MIN_COUNT join the vocab-bounded
        // unigram table twice by token (shuffle equi joins, never a pair
        // space); N broadcasts as a one-row stats frame (the q78 idiom);
        // top-50 is TakeOrderedAndProject, no global sort.
        val MIN_COUNT = 5
        val n = size(col("toks"))
        val bigrams = when(n >= 2,
          zip_with(slice(col("toks"), lit(1), n - 1), slice(col("toks"), lit(2), n - 1),
            (a, b) => struct(a.as("a"), b.as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
        val uni = documents(s, d)
          .select(explode(tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val big = documents(s, d)
          .select(tokens(col("text")).as("toks"))
          .select(explode(bigrams).as("bg"))
          .select(col("bg.a").as("a"), col("bg.b").as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= MIN_COUNT)
        val tot = uni.agg(sum(col("c")).as("n_tokens"))
        big
          .join(uni.select(col("w").as("a"), col("c").as("c_a")), Seq("a"))
          .join(uni.select(col("w").as("b"), col("c").as("c_b")), Seq("b"))
          .crossJoin(broadcast(tot))
          .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
            (round(log(col("c_ab") * lit(1.0) * col("n_tokens") /
              (col("c_a") * lit(1.0) * col("c_b"))) * 1000000)).cast("long").as("pmi6"))
          .orderBy(col("pmi6").desc, col("a"), col("b"))
          .limit(50)
      },
      Some(s"""
        WITH toks AS (
          SELECT $SQL_TOKENS AS w FROM documents),
        uni AS (
          SELECT unnest(w) AS w FROM toks),
        uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
        tot AS (SELECT cast(sum(c) as bigint) AS n_tokens FROM uc),
        bg AS (
          SELECT unnest(list_transform(range(1, len(w)), i -> struct_pack(a := w[i], b := w[i+1]))) AS s
          FROM toks),
        bc AS (
          SELECT s.a AS a, s.b AS b, count(*) AS c_ab
          FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
        SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
               cast(round(ln(c_ab * 1.0 * n_tokens / (ua.c * 1.0 * ub.c)) * 1000000) as bigint) AS pmi6
        FROM bc
        JOIN uc ua ON bc.a = ua.w
        JOIN uc ub ON bc.b = ub.w
        CROSS JOIN tot
        ORDER BY pmi6 DESC, a, b
        LIMIT 50"""),
      "PMI collocations: fixed-point bigram association, vocab-bounded joins + broadcast stats row"),

    QueryDef(
      "q104_phrase_search",
      (s, d) => {
        // Positional phrase search — the query-side complement of q100's
        // postings layout (exact top-k q39 and BM25 q78 rank by bags of
        // words; this is the "match these tokens CONSECUTIVELY" operator).
        // Shape: the phrase set explodes to a tiny (phrase,term,idx)
        // dimension that BROADCASTS, so the positional postings
        // (doc,pos,word) are filtered to phrase terms map-side — the only
        // shuffle carries occurrences of query terms, never the corpus.
        // The alignment trick makes multi-term adjacency a plain
        // aggregation instead of a self-join chain: a term at position
        // `pos` filling phrase slot `idx` votes for a match starting at
        // `pos - idx`; a start wins when all `len` DISTINCT slots voted
        // (distinct, not count: "batch batch" puts one occurrence in two
        // slots of the same start). Overlapping matches count separately,
        // standard positional-search semantics.
        import s.implicits._
        val terms = PHRASES.toDF("phrase_id", "phrase")
          .select(col("phrase_id"), size(tokens(col("phrase"))).as("len"),
            posexplode(tokens(col("phrase"))).as(Seq("idx", "term")))
        val post = documents(s, d)
          .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "word")))
        post.join(broadcast(terms), post("word") === terms("term"))
          .select(col("phrase_id"), col("len"), col("doc_id"),
            (col("pos") - col("idx")).cast("long").as("start"), col("idx"))
          .groupBy(col("phrase_id"), col("len"), col("doc_id"), col("start"))
          .agg(countDistinct(col("idx")).as("n_aligned"))
          .filter(col("n_aligned") === col("len"))
          .groupBy(col("phrase_id"), col("doc_id"))
          .agg(count(lit(1)).as("n_hits"), min(col("start")).as("first_pos"))
          .orderBy(col("phrase_id"), col("doc_id"))
      },
      Some(s"""
        WITH pt AS (
          SELECT phrase_id, len(w) AS plen,
                 unnest(list_transform(range(len(w)),
                   i -> struct_pack(idx := i, term := w[i+1]))) AS t
          FROM (SELECT phrase_id,
                       list_filter(string_split(phrase, ' '), x -> x <> '') AS w
                FROM (VALUES $SQL_PHRASES) AS p(phrase_id, phrase))),
        post AS (
          SELECT doc_id, unnest(list_transform(range(len(w)),
                   i -> struct_pack(pos := i, word := w[i+1]))) AS t
          FROM (SELECT doc_id, $SQL_TOKENS AS w FROM documents)),
        cand AS (
          SELECT pt.phrase_id, pt.plen, post.doc_id,
                 post.t.pos - pt.t.idx AS start, pt.t.idx AS idx
          FROM post JOIN pt ON post.t.word = pt.t.term),
        m AS (
          SELECT phrase_id, plen, doc_id, start, count(DISTINCT idx) AS n
          FROM cand GROUP BY 1, 2, 3, 4)
        SELECT phrase_id, doc_id, count(*) AS n_hits, min(start) AS first_pos
        FROM m WHERE n = plen
        GROUP BY 1, 2
        ORDER BY 1, 2"""),
      "positional phrase search: broadcast phrase dim + start-alignment aggregation, no self-join chain"),

    QueryDef(
      "q105_doc_chunking",
      (s, d) => chunkedDocs(documents(s, d)),
      Some(s"""
        WITH t AS (SELECT doc_id, $SQL_TOKENS AS w FROM documents),
        c AS (
          SELECT doc_id, w, unnest(range(0, (len(w)-1)//$CHUNK_STRIDE + 1)) AS i
          FROM t WHERE len(w) > 0)
        SELECT doc_id,
               i AS chunk_idx,
               i*$CHUNK_STRIDE AS chunk_start,
               len(list_slice(w, i*$CHUNK_STRIDE+1, i*$CHUNK_STRIDE+$CHUNK_TOKENS)) AS n_chunk_tokens,
               md5(array_to_string(list_slice(w, i*$CHUNK_STRIDE+1, i*$CHUNK_STRIDE+$CHUNK_TOKENS), ' ')) AS chunk_md5
        FROM c"""),
      "context-window chunking: 64-token/48-stride overlapping training examples, shuffle-free generate"),

    QueryDef(
      "q118_global_ordinals",
      (s, d) => {
        // Dense global sequence assignment — the zipWithIndex problem:
        // give every document a gapless ordinal in doc_id order.
        // `monotonically_increasing_id` is sparse, and the naive
        // row_number() OVER (ORDER BY doc_id) is a single-partition
        // global window. This is [[exclusiveRunningSum]] with a unit
        // weight: the count of preceding rows IS the 0-based ordinal,
        // computed as the log-depth bucket recursion in which no window
        // partition exceeds ~PACK_FANOUT rows at any corpus size.
        val ids = graft.Caches.lease(documents(s, d)
          .select(col("doc_id"), lit(1L).as("one")))
        exclusiveRunningSum(ids, "doc_id", "one", "ord")
          .select(col("doc_id"), (col("ord") + 1L).as("ordinal"))
      },
      Some("""
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) AS ordinal
        FROM documents"""),
      "dense global ordinals (zipWithIndex): log-depth prefix count, no single-partition window"),

    QueryDef(
      "q117_cdc_chunking",
      (s, d) => {
        // CONTENT-DEFINED chunking (the dedup-storage counterpart of
        // q105's fixed windows): a chunk boundary falls after token i
        // whenever the rolling 3-token window hashing to 0 mod 64 says
        // so, so boundaries are properties of the CONTENT — an edit
        // moves only the boundaries within two tokens of it and every
        // other chunk's checksum survives for dedup, where fixed-stride
        // chunking would shift-corrupt everything downstream of the
        // edit. Expected chunk length = the divisor (64). Entirely
        // in-row array arithmetic: one scan, one generate, no shuffle.
        val DIV = 64
        def h12(c: Column): Column = conv(substring(md5(c), 1, 12), 16, 10).cast("long")
        val docs = documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .filter(size(col("w")) > 0)
        val n = size(col("w"))
        // boundary END positions (0-based, inclusive): gram (i-2, i-1, i)
        val bs = when(n >= 3,
          filter(sequence(lit(2), n - 1), i =>
            pmod(h12(concat_ws(" ",
              element_at(col("w"), i - 1),
              element_at(col("w"), i),
              element_at(col("w"), i + 1))), lit(DIV)) === 0))
          .otherwise(array().cast("array<int>"))
        val withB = docs
          .withColumn("bs", bs)
          .withColumn("bext",
            when(size(col("bs")) === 0 ||
              element_at(col("bs"), -1) =!= (size(col("w")) - 1),
              concat(col("bs"), array((size(col("w")) - 1).cast("int"))))
              .otherwise(col("bs")))
        withB
          .select(col("doc_id"), col("w"),
            posexplode(transform(sequence(lit(1), size(col("bext"))), j =>
              struct(
                when(j === 1, lit(0)).otherwise(element_at(col("bext"), j - 1) + 1).as("st"),
                element_at(col("bext"), j).as("en")))).as(Seq("chunk_idx", "c")))
          .select(col("doc_id"), (col("chunk_idx") + 1).cast("long").as("chunk_idx"),
            col("c.st").cast("long").as("chunk_start"),
            (col("c.en") - col("c.st") + 1).cast("long").as("n_chunk_tokens"),
            md5(array_join(slice(col("w"), col("c.st") + 1, col("c.en") - col("c.st") + 1), " "))
              .as("chunk_md5"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, $SQL_TOKENS AS w FROM documents
          WHERE len($SQL_TOKENS) > 0),
        b AS (
          SELECT doc_id, w,
                 list_filter(range(2, len(w)), i ->
                   (CAST(concat('0x', substr(md5(w[i-1] || ' ' || w[i] || ' ' || w[i+1]), 1, 12)) AS BIGINT) % 64 = 0)) AS bs
          FROM t),
        be AS (
          SELECT doc_id, w,
                 CASE WHEN len(bs) = 0 OR bs[-1] <> len(w) - 1
                      THEN list_append(bs, len(w) - 1) ELSE bs END AS bext
          FROM b),
        c AS (
          SELECT doc_id, w, bext, unnest(range(1, len(bext) + 1)) AS j FROM be)
        SELECT doc_id,
               j AS chunk_idx,
               cast(CASE WHEN j = 1 THEN 0 ELSE bext[j-1] + 1 END as bigint) AS chunk_start,
               cast(bext[j] - (CASE WHEN j = 1 THEN 0 ELSE bext[j-1] + 1 END) + 1 as bigint) AS n_chunk_tokens,
               md5(array_to_string(
                 list_slice(w, (CASE WHEN j = 1 THEN 0 ELSE bext[j-1] + 1 END) + 1, bext[j] + 1),
                 ' ')) AS chunk_md5
        FROM c"""),
      "content-defined chunking: rolling 3-gram hash boundaries, edit-stable chunk checksums, no shuffle"),

    QueryDef(
      "q121_quality_classifier",
      (s, d) => {
        // Hashed-linear text-classifier INFERENCE at corpus scale — the
        // fastText/CCNet quality-filter shape (Joulin et al. 2016;
        // Wenzek et al. 2020): tokens hash into F feature buckets, a doc's
        // score is the bag-of-buckets dot product with a weight vector,
        // keep = sign. The weight vector here is a frozen deterministic
        // hash of the bucket id (no model artifacts ship in this
        // container); a trained model swaps in as a broadcast F-row
        // weight table (or a literal array for small F) without touching
        // the plan shape. What the plan pins down for 100 TB: scoring is
        // ONE explode + partial-agg sum keyed by doc_id (map-side combine
        // absorbs long docs), every hash/weight expression is built-in
        // (whole-stage codegen), and the left join back to `documents`
        // re-admits zero-token docs so the filter is total over the
        // corpus. Integer weights in [-1000, 1000] make the score an
        // exact BIGINT — bit-identical in any engine, which is what lets
        // classifier inference run under the driver's hash gate.
        val scored = documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
          .select(col("doc_id"), classifierWeight(col("w")).as("wt"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("score"))
        documents(s, d).select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("score"), lit(0L)).as("score"),
            (coalesce(col("score"), lit(0L)) >= 0).as("keep"))
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id,
                 CAST(concat('0x', substr(md5(unnest($SQL_TOKENS)), 1, 12)) AS BIGINT) % 4096 AS b
          FROM documents),
        sc AS (
          SELECT doc_id, count(*) AS n_tokens,
                 cast(sum(CAST(concat('0x', substr(md5('w#' || b), 1, 12)) AS BIGINT) % 2001 - 1000) AS bigint) AS score
          FROM f GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(sc.n_tokens, 0) AS n_tokens,
               coalesce(sc.score, 0) AS score,
               coalesce(sc.score, 0) >= 0 AS keep
        FROM documents d LEFT JOIN sc USING (doc_id)"""),
      "hashed-linear classifier inference (fastText-shape quality filter; exact integer scores)"),

    QueryDef(
      "q128_oov_rate",
      (s, d) => {
        // Tokenizer-coverage audit: fix the vocabulary at the corpus's
        // top-V words (frequency desc, word asc — a deterministic,
        // engine-reproducible "tokenizer"), then score every document's
        // out-of-vocabulary token fraction in exact integer micros. The
        // OOV tail is what decides whether a tokenizer/vocab budget fits
        // a corpus before training starts. 100 TB shape: the vocab is a
        // bounded TakeOrderedAndProject over the word counts (V rows,
        // broadcast to the scoring join); scoring is one explode + one
        // broadcast left-semi-style membership + a partial-agg per doc.
        val V = 1000
        val words = documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("wc"))
          .orderBy(col("wc").desc, col("word").asc)
          .limit(V)
          .select(col("word"), lit(1).as("__in"))
        val perDoc = words
          .join(broadcast(vocab), Seq("word"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        documents(s, d).select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_oov"), lit(0L)).as("n_oov"),
            expr("coalesce(n_oov, 0) * 1000000 div greatest(coalesce(n_tokens, 0), 1)")
              .as("oov_micro"))
      },
      Some(s"""
        WITH words AS (
          SELECT doc_id, unnest($SQL_TOKENS) AS word FROM documents),
        vocab AS (
          SELECT word FROM (
            SELECT word, count(*) AS wc FROM words GROUP BY word
            ORDER BY wc DESC, word LIMIT 1000)),
        per_doc AS (
          SELECT w.doc_id, count(*) AS n_tokens,
                 cast(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_oov
          FROM words w LEFT JOIN vocab v ON v.word = w.word
          GROUP BY w.doc_id)
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.n_oov, 0) AS n_oov,
               coalesce(p.n_oov, 0) * 1000000 // greatest(coalesce(p.n_tokens, 0), 1) AS oov_micro
        FROM documents d LEFT JOIN per_doc p USING (doc_id)"""),
      "tokenizer-coverage audit: deterministic top-V vocab + per-doc OOV fraction in exact micros"),

    QueryDef(
      "q129_stratified_sample",
      (s, d) => {
        // EXACT proportional stratified sampling: every (lang, source)
        // stratum contributes floor(n/10) rows (min 1), selected by
        // md5-coin order — deterministic, layout-independent, and
        // engine-reproducible. The naive form ranks each stratum through
        // a window (the whole stratum shuffles into ONE task — the q102
        // anti-pattern); here the per-stratum quota k rides into the
        // k-capped MinKByCoinN aggregator on every row, so a mega-stratum
        // contributes at most k candidates per map partition and the
        // exact sample falls out of one partial-agg pass. The quota table
        // is one count aggregation, broadcast back.
        val docs = documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"))
        val quotas = docs.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"))
          .select(col("lang"), col("source"),
            greatest(lit(1L), expr("n div 10")).cast("int").as("k"))
        val minkn = udaf(new graft.operators.Aggregates.MinKByCoinN)
        docs.join(broadcast(quotas), Seq("lang", "source"))
          .select(col("lang"), col("source"),
            md5(col("doc_id").cast("string")).as("coin"), col("doc_id"), col("k"))
          .groupBy(col("lang"), col("source"))
          .agg(minkn(col("coin"), col("doc_id"), col("k")).as("ids"))
          .select(col("lang"), col("source"), explode(col("ids")).as("doc_id"))
      },
      Some("""
        WITH ranked AS (
          SELECT lang, source, doc_id,
                 row_number() OVER (PARTITION BY lang, source
                   ORDER BY md5(cast(doc_id AS varchar)), doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang, source) AS n
          FROM documents)
        SELECT lang, source, doc_id FROM ranked
        WHERE rn <= greatest(1, n // 10)"""),
      "exact proportional stratified sample (per-stratum quota rides into a k-capped aggregator; no stratum windows)"),

    QueryDef(
      "q165_substring_dedup",
      (s, d) => {
        // Exact substring-level dedup (Lee et al. 2022, "Deduplicating
        // Training Data Makes Language Models Better" — the ExactSubstr
        // operator, the suffix-array companion to MinHash in production
        // corpus dedup): find every MAXIMAL token span whose content
        // occurs at more than one site in the corpus and report the
        // per-doc removal extents. Two deliberate deltas from q91 (which
        // excises cross-doc duplicated positions): duplication here is
        // SITE-level — a substring repeated twice inside one document is
        // a duplicate too, exactly Lee et al.'s criterion — and adjacent
        // or overlapping duplicated grams MERGE into maximal extents
        // (the "duplicated substring itself"), not a position set.
        //
        // A distributed suffix array is the paper's in-memory tool, not
        // its semantics; the semantics — every token covered by an
        // n-gram occurring >= 2 times anywhere — reduce to the sorted
        // n-gram-run shape q77 already proved out: ONE linear gram
        // stream, a partial-aggregated site-frequency groupBy on the
        // gram domain (a boilerplate gram at a million sites is one row
        // after map-side combine), an equi join back, and per-doc
        // window/agg passes whose partitions are bounded by document
        // length. No pair space, no driver state: the 100 TB plan.
        //
        // Extent merge: duplicated start positions p, q (p < q) have
        // overlapping-or-adjacent covers [p, p+n-1], [q, q+n-1] iff
        // q - p <= n, so runs split where the gap exceeds n; within a
        // run the union is contiguous ([s0, e0]), across runs disjoint
        // and non-adjacent — summing per-run lengths IS the exact
        // removed-token count.
        import org.apache.spark.sql.expressions.Window
        val n = 5
        val toks = documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .filter(size(col("w")) >= n)
        val sites = toks.select(col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          posexplode(transform(sequence(lit(0), size(col("w")) - n), i =>
            concat_ws(" ", (0 until n).map(j =>
              element_at(col("w"), i + j + 1)): _*))).as(Seq("pos", "g")))
        // site frequency (not doc frequency): count(*) over ALL (doc,pos)
        // sites — the >= 2 occurrences test is what makes an intra-doc
        // repeat a duplicate, per the paper
        val dupG = sites.groupBy(col("g")).agg(count(lit(1)).as("sdf"))
          .filter(col("sdf") > 1)
          .select(col("g"))
        val w1 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val runs = sites.join(dupG, Seq("g"))
          .select(col("doc_id"), col("n_tokens"), col("pos"))
          .withColumn("brk",
            when(col("pos") - lag(col("pos"), 1).over(w1) <= n, 0L)
              .otherwise(1L)) // first row: null gap -> new run
          .withColumn("run", sum(col("brk")).over(w1))
          .groupBy(col("doc_id"), col("n_tokens"), col("run"))
          .agg(min(col("pos")).as("s0"),
            (max(col("pos")) + lit(n - 1)).as("e0"))
        runs.groupBy(col("doc_id"), col("n_tokens"))
          .agg(count(lit(1)).as("n_spans"),
            sum(col("e0") - col("s0") + 1).as("dup_tokens"),
            max(col("e0") - col("s0") + 1).cast("long").as("max_span"),
            min(col("s0")).cast("long").as("first_start"))
          .select(col("doc_id"), col("n_tokens"), col("n_spans"),
            col("dup_tokens"), col("max_span"), col("first_start"),
            round(col("dup_tokens") * lit(1.0) / col("n_tokens"), 4)
              .as("dup_frac"))
        // unordered output: the gate sorts rows itself
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, $SQL_TOKENS AS w FROM documents),
        docs AS (
          SELECT doc_id, len(w)::BIGINT AS n_tokens, w
          FROM toks WHERE len(w) >= 5),
        sites AS (
          SELECT doc_id, n_tokens, i - 1 AS pos,
                 array_to_string(w[i:i+4], ' ') AS g
          FROM docs, unnest(range(1, len(w) - 3)) AS t(i)),
        dup AS (
          SELECT g FROM (SELECT g, count(*) AS sdf FROM sites GROUP BY 1)
          WHERE sdf > 1),
        flag AS (
          SELECT doc_id, n_tokens, pos,
                 CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
                      THEN 0 ELSE 1 END AS brk
          FROM sites JOIN dup USING (g)),
        runs AS (
          SELECT doc_id, n_tokens, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM flag),
        spans AS (
          SELECT doc_id, n_tokens, run,
                 min(pos) AS s0, max(pos) + 4 AS e0
          FROM runs GROUP BY 1, 2, 3)
        SELECT doc_id, n_tokens,
               count(*) AS n_spans,
               cast(sum(e0 - s0 + 1) as bigint) AS dup_tokens,
               cast(max(e0 - s0 + 1) as bigint) AS max_span,
               cast(min(s0) as bigint) AS first_start,
               round(sum(e0 - s0 + 1) * 1.0 / n_tokens, 4) AS dup_frac
        FROM spans GROUP BY 1, 2
        ORDER BY 1"""),
      "exact substring dedup (Lee et al. ExactSubstr): site-frequency duplicated n-grams merged into maximal per-doc removal extents"),

    QueryDef(
      "q166_decontamination",
      (s, d) => {
        // Benchmark-contamination check (Brown et al. 2020 Appendix C,
        // the GPT-3 n-gram decontamination; Dodge et al. 2021 for C4):
        // flag every TRAINING document that shares an n-gram with the
        // EVAL set — the substring-level companion to q138, which audits
        // whole-doc near-dup pairs across splits and therefore misses
        // partial inclusion (a benchmark item quoted inside a long
        // training doc never reaches Jaccard 0.8; one shared n-gram
        // flags it here). Eval set = doc_id % 10 == 0, the corpus's
        // standing onboarding slice.
        //
        // 100 TB shape: both sides reduce to the gram domain first —
        // the eval side to DISTINCT grams (at production scale a
        // benchmark suite is ~1e6 grams, a broadcast; here it is a
        // corpus slice, so the join stays a partial-agg'd gram-domain
        // equi join either way), the train side to per-doc distinct
        // grams (array_distinct in-row). One join, one groupBy; no
        // pair space, nothing driver-side.
        val n = 5
        val grams = documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .filter(size(col("w")) >= n)
          .select(col("doc_id"),
            explode(array_distinct(
              transform(sequence(lit(0), size(col("w")) - n), i =>
                concat_ws(" ", (0 until n).map(j =>
                  element_at(col("w"), i + j + 1)): _*)))).as("g"))
        val evalG = grams.filter(col("doc_id") % 10 === 0)
          .select(col("g")).distinct()
          .withColumn("hit", lit(1L))
        grams.filter(col("doc_id") % 10 =!= 0)
          .join(evalG, Seq("g"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
          .filter(col("n_overlap") > 0)
          .select(col("doc_id"), col("n_grams"), col("n_overlap"),
            round(col("n_overlap") * lit(1.0) / col("n_grams"), 4)
              .as("overlap_frac"))
        // unordered output: the gate sorts rows itself
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, $SQL_TOKENS AS w FROM documents),
        grams AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(range(1, len(w) - 3),
              i -> array_to_string(w[i:i+4], ' ')))) AS g
          FROM toks WHERE len(w) >= 5),
        eg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
        SELECT t.doc_id, count(*) AS n_grams,
               cast(sum(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) as bigint)
                 AS n_overlap,
               round(sum(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS overlap_frac
        FROM (SELECT doc_id, g FROM grams WHERE doc_id % 10 <> 0) t
        LEFT JOIN eg ON t.g = eg.g
        GROUP BY 1
        HAVING sum(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) > 0
        ORDER BY 1"""),
      "benchmark decontamination (GPT-3 Appendix C): training docs sharing an n-gram with the eval slice, gram-domain join, no pair space")
  )

  /** (doc_id, toks, bigs) frame shared by both q69 implementations. */
  private def repetitionTokens(docs: DataFrame): DataFrame = {
    val n = size(col("toks"))
    val bigrams = when(n >= 2,
      zip_with(slice(col("toks"), lit(1), n - 1), slice(col("toks"), lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), bigrams.as("bigs"))
  }

  /** Shuffle-free twin of q69: every statistic folds inside the row
    * (count each distinct gram against the gram array), so the plan holds
    * no aggregate at all — one scan, one projection. Value-identical to
    * the registered groupBy shape (spec-pinned). The trade, measured at
    * sf0.1 local[32]: ~4x slower wall-clock, because higher-order-function
    * lambdas run interpreted outside whole-stage codegen — use this
    * variant when network bandwidth, not CPU, binds the cluster. */
  def repetitionRowwise(docs: DataFrame): DataFrame = {
    def modeCount(arr: Column): Column =
      array_max(transform(array_distinct(arr), g =>
        size(filter(arr, x => x === g))))
    repetitionTokens(docs)
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        round(modeCount(col("toks")) * 1.0 / size(col("toks")), 4)
          .as("top_word_frac"),
        round((size(col("toks")) - size(array_distinct(col("toks")))) * 1.0 /
          size(col("toks")), 4).as("dup_word_frac"),
        when(size(col("bigs")) > 0,
          round(modeCount(col("bigs")) * 1.0 / size(col("bigs")), 4))
          .otherwise(0.0).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Language-model quality proxy (the CCNet filter, Wenzek et al. 2020,
    * with a unigram model standing in for KenLM): per-doc cross-entropy
    * under the language's own unigram distribution — low = stereotyped/
    * repetitive, high = vocabulary the corpus finds surprising. Docs
    * outside mean +/- 2 sigma of their language are flagged, the CCNet
    * head/tail bucketing collapsed to a flag.
    *
    * Determinism: per-token ln p is rounded to 1e-6 and summed as BIGINT
    * micros (per-doc), then per-doc xent is rounded to 1e-4 and the lang
    * mean/variance accumulate those exact ten-thousandths as BIGINTs — no
    * float summation order anywhere. 100 TB shape: unigram counts are one
    * partial-agg groupBy (lang, word); docs re-join that table by
    * (lang, word) — the q74 df shape, linear, never a pair space; lang
    * totals broadcast. (The sum(x4^2) accumulator holds to ~10^12 docs per
    * language in a signed 64-bit — center x4 on a per-lang baseline first
    * if a corpus ever exceeds that.) */
  def unigramXent(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("word"))
    val wc = words.groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("wc"))
    val totals = wc.groupBy(col("lang")).agg(sum(col("wc")).as("wtot"))
    // ln p(w|lang) in exact micros, negated (cross-entropy is positive)
    val tokenCost = words
      .join(wc, Seq("lang", "word"))
      .join(broadcast(totals), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        round(-log(col("wc") * lit(1.0) / col("wtot")) * lit(1000000))
          .cast("long").as("c6"))
    val perDoc = tokenCost.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        // xent in exact ten-thousandths: micros summed, scaled once;
        // all-positive integer division so div == DuckDB's //
        expr("(sum(c6) div count(*)) div 100").as("x4"))
      .withColumn("xent", col("x4") / 10000.0)
    val langStats = perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("nd"), sum(col("x4")).as("sx"),
        sum(col("x4") * col("x4")).as("sxx"))
      .select(col("lang"),
        (col("sx") * lit(1.0) / col("nd")).as("mu4"),
        sqrt(col("sxx") * lit(1.0) / col("nd") -
          (col("sx") * lit(1.0) / col("nd")) * (col("sx") * lit(1.0) / col("nd")))
          .as("sd4"))
    perDoc.join(broadcast(langStats), Seq("lang"))
      .select(col("doc_id"), col("n_tokens"), col("xent"),
        (abs(col("x4") - col("mu4")) > lit(2.0) * col("sd4")).as("is_outlier"))
      .orderBy(col("doc_id"))
  }
}
