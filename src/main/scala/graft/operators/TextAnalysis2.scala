package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation text operators, batch 2: exact substring-span dedup,
  * rule-based quality gating, lexical-diversity stats, BM25 relevance,
  * and an inverted-index build. Mirrors the curation steps a web-scale
  * training-data pipeline runs after near-dup removal (cf. the
  * reference's quality gates in src/etl/etl.py — this engine widens them
  * to the standard public-corpus recipes).
  *
  * Scale shapes: everything is either a row-local projection or an
  * explode → single-shuffle aggregation on 8-byte hashed keys; no
  * all-pairs joins, no unbounded driver state.
  */
object TextAnalysis2 {

  private def toks: Column = split(col("text"), " ")

  private val SpanLen = 10

  /** Exact duplicated-substring detection (the fingerprint flavor of
    * suffix-array substring dedup): a doc's 10-token spans are hashed,
    * and a span is DUPLICATED if the same 10-gram occurs in more than
    * one document. Output per doc: span count, duplicated-span count,
    * duplicated fraction — the signal used to strip boilerplate-heavy /
    * copied documents (or clip the duplicated ranges).
    *
    * Spans cross the shuffle as xxhash64 longs, never strings; the
    * per-gram doc count is one two-phase aggregation. A hash collision
    * could only mark one extra span duplicated (never loses one); at
    * 64 bits over a corpus-scale gram space that is ~0 and the DuckDB
    * oracle (string grams) confirms zero at test scale.
    *
    * Skew bound: occurrences are pre-aggregated to (doc_id, g, cnt)
    * BEFORE the gram-frequency join, so a corpus-hot boilerplate gram's
    * join partition holds one row per DISTINCT containing doc, not one
    * per occurrence — and the per-gram doc count becomes a plain
    * count(*) over that deduplicated frame instead of a countDistinct.
    * The token split is hoisted to its own projection (CollapseProject
    * keeps non-cheap expressions single-evaluated) so the split runs
    * once per doc, not once per reference.
    */
  def substringDedup(t: Tables): DataFrame = {
    val spans = t.documents
      .select(col("doc_id"), toks.as("w"))
      .select(
        col("doc_id"),
        expr(s"""CASE WHEN size(w) >= $SpanLen
                |THEN transform(sequence(1, size(w) - ${SpanLen - 1}),
                |  i -> xxhash64(concat_ws(' ', slice(w, i, $SpanLen))))
                |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin).as("spans"))
    val ex = spans.select(col("doc_id"), explode(col("spans")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
    val gramDocs = ex.groupBy("g").agg(count(lit(1)).as("nd"))
    val perDoc = ex.join(gramDocs, Seq("g"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_spans"),
        sum(when(col("nd") > 1, col("cnt")).otherwise(0L)).as("n_dup_spans"))
    t.documents.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_dup_spans").cast("double") / col("n_spans"))
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  val substringDedupSql: String =
    s"""WITH s AS (
       | SELECT doc_id,
       |  CASE WHEN len(string_split(text, ' ')) >= $SpanLen
       |  THEN list_transform(range(1, len(string_split(text, ' ')) - ${SpanLen - 2}),
       |    i -> array_to_string(string_split(text, ' ')[i:i+${SpanLen - 1}], ' '))
       |  ELSE [] END AS spans
       | FROM documents),
       |e AS (SELECT doc_id, unnest(spans) AS g FROM s),
       |gd AS (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM e GROUP BY g),
       |p AS (
       | SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
       | FROM e JOIN gd USING (g) GROUP BY e.doc_id)
       |SELECT d.doc_id,
       | COALESCE(n_spans, 0) AS n_spans,
       | COALESCE(n_dup_spans, 0) AS n_dup_spans,
       | CASE WHEN COALESCE(n_spans, 0) = 0 THEN 0.0
       |      ELSE CAST(n_dup_spans AS DOUBLE) / n_spans END AS dup_frac
       |FROM documents d LEFT JOIN p USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Arbitrary-alignment exact substring dedup — the span-level recipe
    * of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better", public knowledge) re-expressed for Spark: instead
    * of a corpus suffix array, every [[SpanLen]]-token gram at EVERY
    * start offset is fingerprinted, grams whose corpus-wide occurrence
    * count exceeds one (cross-doc OR repeated within a doc) mark the
    * token positions they cover, and the per-doc coverage bitmap is
    * stitched row-locally into MAXIMAL duplicated spans — so a 57-token
    * duplicated passage reports as one span at its true boundaries, at
    * any alignment, never as 48 overlapping grams ([[substringDedup]]
    * reports gram-level counts only). Output per doc: span inventory
    * ("start-end,…" 1-based inclusive), covered-token count/fraction,
    * and the REWRITTEN text with every duplicated span dropped (the
    * conservative remove-all-copies policy; keeping one canonical copy
    * per cluster is a downstream choice).
    *
    * Scale shape: linear in total grams — per-(doc, gram) position
    * lists pre-aggregate BEFORE the frequency join (the
    * [[substringDedup]] skew bound: a boilerplate gram's join partition
    * holds one row per containing doc, not per occurrence), the
    * frequency table is one two-phase count, and ALL span logic
    * (coverage, stitching, rewrite) is row-local HOF arithmetic bounded
    * by document length. Grams shuffle as xxhash64 longs; a collision
    * could only over-mark one span (never loses one) and the
    * string-gram oracle confirms zero at test scale.
    */
  def spanDedup(t: Tables): DataFrame = {
    val k = SpanLen
    val spans = t.documents
      .select(col("doc_id"), toks.as("w"))
      .select(
        col("doc_id"),
        expr(s"""CASE WHEN size(w) >= $k
                |THEN transform(sequence(1, size(w) - ${k - 1}),
                |  i -> struct(i AS i,
                |    xxhash64(concat_ws(' ', slice(w, i, $k))) AS g))
                |ELSE CAST(array() AS ARRAY<STRUCT<i: INT, g: BIGINT>>) END"""
          .stripMargin).as("sp"))
    val ex = spans.select(col("doc_id"), explode(col("sp")).as("s"))
      .select(col("doc_id"), col("s.i").as("i"), col("s.g").as("g"))
    val pg = ex.groupBy("doc_id", "g").agg(collect_list(col("i")).as("ps"))
    val gf = pg.groupBy("g").agg(sum(size(col("ps"))).as("cnt"))
    val ds = pg.join(gf.where(col("cnt") > 1), Seq("g"))
      .groupBy("doc_id")
      .agg(sort_array(flatten(collect_list(col("ps")))).as("ds"))
    t.documents
      .select(col("doc_id"), toks.as("w"))
      .join(ds, Seq("doc_id"), "left")
      .withColumn("ds", coalesce(col("ds"), expr("CAST(array() AS ARRAY<INT>)")))
      .withColumn("n", size(col("w")))
      // covered positions, ascending (sequence is ascending; n >= 1
      // always — split of even an empty string yields one token)
      .withColumn("cp", expr(
        s"filter(sequence(1, n), p -> exists(ds, s -> p >= s AND p <= s + ${k - 1}))"))
      .withColumn("ss", expr("filter(cp, p -> NOT array_contains(cp, p - 1))"))
      .withColumn("ee", expr("filter(cp, p -> NOT array_contains(cp, p + 1))"))
      .select(
        col("doc_id"),
        size(col("ss")).cast("long").as("n_spans"),
        size(col("cp")).cast("long").as("n_dup_tokens"),
        (size(col("cp")).cast("double") / col("n")).as("dup_token_frac"),
        expr("""array_join(zip_with(ss, ee,
                |  (a, b) -> concat(cast(a AS STRING), '-', cast(b AS STRING))),
                |  ',')""".stripMargin).as("spans"),
        expr("""concat_ws(' ',
                |  transform(filter(sequence(1, n),
                |    p -> NOT array_contains(cp, p)), p -> w[p - 1]))"""
          .stripMargin).as("clean_text"))
      .orderBy("doc_id")
  }

  val spanDedupSql: String =
    s"""WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sp AS (
       | SELECT doc_id,
       |  CASE WHEN len(w) >= $SpanLen
       |  THEN list_transform(range(1, len(w) - ${SpanLen - 2}),
       |    i -> struct_pack(i := i,
       |      g := array_to_string(w[i:i+${SpanLen - 1}], ' ')))
       |  ELSE [] END AS sp
       | FROM tw),
       |e0 AS (SELECT doc_id, unnest(sp) AS s FROM sp),
       |e AS (SELECT doc_id, s.i AS i, s.g AS g FROM e0),
       |pg AS (SELECT doc_id, g, list(i) AS ps FROM e GROUP BY doc_id, g),
       |gf AS (SELECT g, SUM(len(ps)) AS cnt FROM pg GROUP BY g),
       |dsx AS (
       | SELECT doc_id, list_sort(flatten(list(ps))) AS ds
       | FROM pg JOIN gf USING (g) WHERE cnt > 1 GROUP BY doc_id),
       |f AS (
       | SELECT tw.doc_id, tw.w, len(tw.w) AS n, COALESCE(dsx.ds, []) AS ds
       | FROM tw LEFT JOIN dsx USING (doc_id)),
       |c AS (
       | SELECT doc_id, w, n,
       |  list_filter(range(1, n + 1),
       |    p -> len(list_filter(ds,
       |      s -> p >= s AND p <= s + ${SpanLen - 1})) > 0) AS cp
       | FROM f),
       |r AS (
       | SELECT doc_id, w, n, cp,
       |  list_filter(cp, p -> NOT list_contains(cp, p - 1)) AS ss,
       |  list_filter(cp, p -> NOT list_contains(cp, p + 1)) AS ee
       | FROM c)
       |SELECT doc_id,
       | CAST(len(ss) AS BIGINT) AS n_spans,
       | CAST(len(cp) AS BIGINT) AS n_dup_tokens,
       | CAST(len(cp) AS DOUBLE) / n AS dup_token_frac,
       | COALESCE(array_to_string(list_transform(range(1, len(ss) + 1),
       |   k -> ss[k] || '-' || ee[k]), ','), '') AS spans,
       | COALESCE(array_to_string(list_transform(
       |   list_filter(range(1, n + 1), p -> NOT list_contains(cp, p)),
       |   p -> w[p]), ' '), '') AS clean_text
       |FROM r
       |ORDER BY doc_id""".stripMargin

  private val GopherStopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  // single source of truth for the rule thresholds — interpolated into
  // the Scala projection AND both SQL forms so they cannot drift
  private val MinWords = 30
  private val MaxWords = 100000
  private val MinMeanLen = 3.0
  private val MaxMeanLen = 10.0
  private val MinStops = 2
  private val MinDistinctFrac = 0.45
  private val MaxTopFrac = 0.15

  /** Gopher-style rule gate: the published heuristic battery (word-count
    * window, mean-word-length window, minimum stopword evidence, lexical
    * diversity, single-token dominance), each surfaced as its measured
    * ratio plus a pass flag, and an overall keep decision. Thresholds
    * are tuned to this corpus's distributions so every flag actually
    * splits the data. Pure row-local projection — the 100 TB cost is one
    * scan.
    *
    * The per-distinct-token count vector is computed in-row
    * (`transform(array_distinct(w), x -> count of x)`) — O(distinct ×
    * tokens) on ≤100-token docs beats an explode + per-(doc, token)
    * shuffle by a full stage.
    */
  def gopherQuality(t: Tables): DataFrame =
    gopherColumns(t.documents).orderBy("doc_id")

  /** The rule projection behind [[gopherQuality]], reusable on ANY frame
    * with (doc_id, text) — including an unbounded stream (row-local, no
    * sort, no state): see [[graft.streaming.Streams.qualityGateStream]].
    */
  def gopherColumns(documents: DataFrame): DataFrame = {
    val sw = GopherStopwords.map(s => s"'$s'").mkString(", ")
    documents
      .withColumn("n_words", size(toks))
      .withColumn("mean_word_len",
        (length(col("text")) - (size(toks) - 1)).cast("double") / size(toks))
      .withColumn("n_stop",
        expr(s"size(filter(split(text, ' '), w -> w IN ($sw)))"))
      .withColumn("distinct_frac",
        size(array_distinct(toks)).cast("double") / size(toks))
      .withColumn("top_word_frac",
        expr("""CAST(array_max(transform(array_distinct(split(text, ' ')),
               | w -> size(filter(split(text, ' '), x -> x = w)))) AS DOUBLE)""".stripMargin)
          / size(toks))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("n_stop"), col("distinct_frac"), col("top_word_frac"),
        (col("n_words") >= MinWords && col("n_words") <= MaxWords).as("words_ok"),
        (col("mean_word_len") >= MinMeanLen && col("mean_word_len") <= MaxMeanLen)
          .as("word_len_ok"),
        (col("n_stop") >= MinStops).as("stop_ok"),
        (col("distinct_frac") >= MinDistinctFrac).as("diversity_ok"),
        (col("top_word_frac") <= MaxTopFrac).as("dominance_ok"))
      .withColumn("keep",
        col("words_ok") && col("word_len_ok") && col("stop_ok") &&
          col("diversity_ok") && col("dominance_ok"))
  }

  /** The overall keep decision as one boolean SQL expression over a raw
    * `text` column — reused by composed-pipeline oracles
    * ([[Curation.curateCorpusSql]]); must stay in lockstep with the
    * rule thresholds above.
    */
  private[operators] val gopherKeepRawSql: String = {
    val sw = GopherStopwords.map(s => s"'$s'").mkString(", ")
    val n = "len(string_split(text, ' '))"
    s"""($n >= $MinWords AND $n <= $MaxWords
       |  AND CAST(length(text) - ($n - 1) AS DOUBLE) / $n >= $MinMeanLen
       |  AND CAST(length(text) - ($n - 1) AS DOUBLE) / $n <= $MaxMeanLen
       |  AND len(list_filter(string_split(text, ' '), w -> w IN ($sw))) >= $MinStops
       |  AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $n >= $MinDistinctFrac
       |  AND CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
       |    w -> len(list_filter(string_split(text, ' '), x -> x = w)))) AS DOUBLE)
       |    / $n <= $MaxTopFrac)""".stripMargin
  }

  val gopherQualitySql: String = {
    val sw = GopherStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH b AS (
       | SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_words,
       |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS mean_word_len,
       |  len(list_filter(string_split(text, ' '), w -> w IN ($sw))) AS n_stop,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS distinct_frac,
       |  CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
       |    w -> len(list_filter(string_split(text, ' '), x -> x = w)))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS top_word_frac
       | FROM documents)
       |SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
       | CAST(n_stop AS INT) AS n_stop, distinct_frac, top_word_frac,
       | n_words >= $MinWords AND n_words <= $MaxWords AS words_ok,
       | mean_word_len >= $MinMeanLen AND mean_word_len <= $MaxMeanLen AS word_len_ok,
       | n_stop >= $MinStops AS stop_ok,
       | distinct_frac >= $MinDistinctFrac AS diversity_ok,
       | top_word_frac <= $MaxTopFrac AS dominance_ok,
       | n_words >= $MinWords AND n_words <= $MaxWords
       |  AND mean_word_len >= $MinMeanLen AND mean_word_len <= $MaxMeanLen
       |  AND n_stop >= $MinStops AND distinct_frac >= $MinDistinctFrac
       |  AND top_word_frac <= $MaxTopFrac AS keep
       |FROM b
       |ORDER BY doc_id""".stripMargin
  }

  /** Lexical diversity: Simpson repetition index (Σc²/n² — the
    * probability two random token draws agree), type-token ratio, and
    * hapax fraction (tokens occurring exactly once). All numerators are
    * exact integer sums folded in-row, so the single final division is
    * the only floating-point step — bit-identical across engines with no
    * ordering caveats. Row-local; scales as one scan.
    */
  def diversity(t: Tables): DataFrame =
    t.documents
      .withColumn("cnts",
        expr("""transform(array_distinct(split(text, ' ')),
               | w -> size(filter(split(text, ' '), x -> x = w)))""".stripMargin))
      .withColumn("n", size(toks))
      .select(col("doc_id"), col("n").as("n_tokens"),
        (expr("aggregate(cnts, 0L, (acc, c) -> acc + CAST(c AS BIGINT) * c)").cast("double")
          / (col("n").cast("long") * col("n"))).as("simpson"),
        (size(col("cnts")).cast("double") / col("n")).as("type_token_ratio"),
        (expr("size(filter(cnts, c -> c = 1))").cast("double") / col("n")).as("hapax_frac"))
      .orderBy("doc_id")

  val diversitySql: String =
    """WITH b AS (
      | SELECT doc_id,
      |  list_transform(list_distinct(string_split(text, ' ')),
      |    w -> len(list_filter(string_split(text, ' '), x -> x = w))) AS cnts,
      |  len(string_split(text, ' ')) AS n
      | FROM documents)
      |SELECT doc_id, CAST(n AS INT) AS n_tokens,
      | CAST(list_aggregate(list_transform(cnts, c -> CAST(c AS BIGINT) * c), 'sum') AS DOUBLE)
      |   / (CAST(n AS BIGINT) * n) AS simpson,
      | CAST(len(cnts) AS DOUBLE) / n AS type_token_ratio,
      | CAST(len(list_filter(cnts, c -> c = 1)) AS DOUBLE) / n AS hapax_frac
      |FROM b
      |ORDER BY doc_id""".stripMargin

  private val Bm25Terms = Seq("spark", "vector", "customer")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** BM25 relevance of every document against a fixed query term set —
    * the retrieval scorer behind quality-classifier bootstrapping and
    * targeted corpus slicing. Corpus statistics (N, avgdl, per-term df)
    * are one tiny aggregate broadcast back over the scan; the idf is the
    * ln-free odds form (N − df + ½)/(df + ½), keeping every arithmetic
    * step a rational expression both engines evaluate bit-identically
    * (libm `ln` ulp differences would otherwise leak into every score).
    * Term contributions are summed in fixed query order.
    */
  /** The scored frame behind [[bm25]] — (doc_id, bm25, tf_*) unordered —
    * shared with the hybrid-retrieval lexical arm ([[Hybrid.hybridRrf]])
    * so both consumers rank the IDENTICAL score expression tree.
    */
  private[operators] def bm25Scored(t: Tables): DataFrame = {
    def tf(term: String): Column =
      expr(s"size(filter(split(text, ' '), x -> x = '$term'))")
    val statCols =
      (sum(size(toks)).cast("double") / count(lit(1))).as("avgdl") +:
        Bm25Terms.map(term =>
          sum(when(tf(term) > 0, 1L).otherwise(0L)).as(s"df_$term"))
    val stats = t.documents.agg(count(lit(1)).as("n_docs"), statCols: _*)
    val scored = t.documents
      .withColumn("dl", size(toks))
      .crossJoin(broadcast(stats))
    val contribs = Bm25Terms.map { term =>
      val idf = (col("n_docs") - col(s"df_$term") + lit(0.5)) /
        (col(s"df_$term") + lit(0.5))
      val tfc = tf(term).cast("double")
      idf * (tfc * lit(Bm25K1 + 1.0)) /
        (tfc + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * (col("dl") / col("avgdl"))))
    }
    val outCols = col("doc_id") +: contribs.reduceLeft(_ + _).as("bm25") +:
      Bm25Terms.map(term => tf(term).cast("int").as(s"tf_$term"))
    scored.select(outCols: _*)
  }

  def bm25(t: Tables): DataFrame = bm25Scored(t).orderBy("doc_id")

  private def bm25TfSql(term: String) =
    s"len(list_filter(string_split(text, ' '), x -> x = '$term'))"

  // parenthesization mirrors the Spark Column tree exactly —
  // ((idf * num) / denom) — so every IEEE step matches bitwise
  private def bm25ContribsSql: String =
    Bm25Terms.map { term =>
      s"""((((s.n_docs - s.df_$term + 0.5) / (s.df_$term + 0.5))
         |  * (CAST(${bm25TfSql(term)} AS DOUBLE) * ${Bm25K1 + 1.0}))
         | / (CAST(${bm25TfSql(term)} AS DOUBLE)
         |    + ${Bm25K1} * ((1.0 - ${Bm25B}) + ${Bm25B} * (CAST(len(string_split(text, ' ')) AS DOUBLE) / s.avgdl))))"""
        .stripMargin
    }.mkString("(", " + ", ")")

  /** The corpus-stats CTE (named `s`) of the BM25 oracle — shared with
    * [[Hybrid.hybridRrfSql]]'s lexical arm.
    */
  private[operators] def bm25StatsCte: String = {
    val dfCols = Bm25Terms
      .map(term => s"CAST(SUM(CASE WHEN ${bm25TfSql(term)} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$term")
      .mkString(", ")
    s"""s AS (
       | SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avgdl,
       |  $dfCols
       | FROM documents)""".stripMargin
  }

  /** `SELECT doc_id, <score> AS bm25 FROM documents, s` — the scored
    * relation both the BM25 oracle and the hybrid oracle rank.
    */
  private[operators] def bm25ScoredSql: String =
    s"SELECT doc_id, $bm25ContribsSql AS bm25 FROM documents, s"

  val bm25Sql: String = {
    val tfCols = Bm25Terms
      .map(term => s"CAST(${bm25TfSql(term)} AS INT) AS tf_$term").mkString(", ")
    s"""WITH $bm25StatsCte
       |SELECT doc_id, $bm25ContribsSql AS bm25, $tfCols
       |FROM documents, s
       |ORDER BY doc_id""".stripMargin
  }

  private val PostingsCap = 10

  /** Inverted-index build: per term, document frequency, collection
    * frequency, and the first [[PostingsCap]] doc ids of the postings
    * list (as a compare-friendly CSV string). The capped postings come
    * from the [[graft.plans.TopKPerKey]] heap plan — per-term state is
    * bounded at k whatever the term's true df, which is what makes the
    * build safe for stopword-grade terms at corpus scale.
    */
  def invertedIndex(t: Tables): DataFrame = {
    val ex = t.documents.select(col("doc_id"), explode(toks).as("term"))
    val agg = ex.groupBy("term").agg(
      countDistinct(col("doc_id")).as("df"),
      count(lit(1)).as("cf"))
    val postings = graft.plans.TopKPerKey(
        ex.select("term", "doc_id").distinct(),
        Seq("term"), Seq(("doc_id", true)), PostingsCap)
      .groupBy("term")
      .agg(array_join(
        expr("transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING))"),
        ",").as("postings"))
    agg.join(postings, Seq("term")).orderBy("term")
  }

  val invertedIndexSql: String =
    s"""WITH e AS (
       | SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |a AS (
       | SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       |  CAST(COUNT(*) AS BIGINT) AS cf
       | FROM e GROUP BY term),
       |td AS (SELECT DISTINCT term, doc_id FROM e),
       |topk AS (
       | SELECT term, doc_id FROM td
       | QUALIFY row_number() OVER (PARTITION BY term ORDER BY doc_id) <= $PostingsCap),
       |ps AS (
       | SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
       | FROM topk GROUP BY term)
       |SELECT a.term, df, cf, postings
       |FROM a JOIN ps USING (term)
       |ORDER BY term""".stripMargin

  /** Source-overlap matrix: exact 3-gram-set Jaccard between every pair
    * of subcorpora ("sources") — the domain-overlap / cross-contamination
    * report a corpus curator reads before fixing mixture weights. Per
    * source the distinct gram set is built once (grams cross the shuffle
    * as xxhash64 longs — a collision merges two set elements corpus-wide
    * with probability ~|grams|²/2⁶⁴ ≈ 0, and the DuckDB string-gram
    * oracle confirms zero at test scale); intersections come from one
    * self-join on the gram key whose per-key fan-out is bounded by the
    * SOURCE count (tiny), never the corpus; union sizes derive as
    * |A|+|B|−|A∩B|. Output is sources² rows — bounded however large the
    * corpus — including zero-overlap pairs via a cross of the per-source
    * size aggregates.
    */
  def sourceOverlap(t: Tables): DataFrame = {
    // one aggregation gathers each gram's sorted source set (collect_set
    // dedups map-side — no separate distinct pass), then source pairs
    // expand IN-ROW per gram (≤ sources² per row, tiny) — the same
    // no-self-join trick as basket pairs; sizes fall out of the same
    // frame by exploding the sets
    val byGram = t.documents
      .select(col("source"), explode(graft.functions.Shingles.grams3(col("text"))).as("gs"))
      .select(col("source"), xxhash64(col("gs")).as("g"))
      .groupBy("g")
      .agg(array_sort(collect_set(col("source"))).as("srcs"))
    val sizes = byGram.select(explode(col("srcs")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = byGram
      .select(explode(expr(
        """flatten(transform(srcs, (a, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |    b -> named_struct('a', a, 'b', b))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("a_src"), col("p.b").as("b_src"))
      .agg(count(lit(1)).as("n_common"))
    val a = sizes.select(col("source").as("a_src"), col("sz").as("a_sz"))
    val b = sizes.select(col("source").as("b_src"), col("sz").as("b_sz"))
    a.crossJoin(b) // cross of two per-source AGGREGATES — sources², not corpus
      .where(col("a_src") < col("b_src"))
      .join(inter, Seq("a_src", "b_src"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .select(col("a_src"), col("b_src"), col("a_sz"), col("b_sz"), col("n_common"),
        (col("n_common").cast("double") /
          (col("a_sz") + col("b_sz") - col("n_common")).cast("double")).as("jaccard"))
      .orderBy(col("jaccard").desc, col("a_src"), col("b_src"))
  }

  private val ChunkLen = 10

  /** Duplicated-chunk REMOVAL with document reconstruction — the rewrite
    * sibling of [[substringDedup]] (which only scores): documents split
    * into fixed [[ChunkLen]]-token chunks, every repeat of a chunk after
    * its global first occurrence (ordered by doc_id, then position) is
    * dropped, and each document is re-assembled from its surviving
    * chunks in order. This is the "remove duplicated lines/paragraphs
    * across the corpus" pass of the public web-corpus recipes, with
    * fixed-width chunks standing in for line boundaries (the synthetic
    * corpus has no newlines).
    *
    * Scale shape: chunking is in-row (one `transform` over the token
    * array, no explode before the per-chunk projection); the global
    * first-occurrence decision is ONE window over chunk text (an
    * unordered partition — `min(struct)` needs no sort); reassembly is
    * one per-doc aggregation that also yields the chunk/removal counts
    * (keep is a flag, not a filter), so the source is scanned once and
    * nothing joins back. At corpus scale the window key would hash
    * the chunk to a long first (same trick as [[substringDedup]]); here
    * the string key keeps the oracle verbatim.
    */
  def chunkDedup(t: Tables): DataFrame = {
    val chunks = t.documents
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, (size(split(text, ' ')) - 1) div $ChunkLen),
             |  i -> concat_ws(' ', slice(split(text, ' '), i * $ChunkLen + 1, $ChunkLen)))"""
            .stripMargin)).as(Seq("idx", "chunk")))
    // keep is a FLAG, not a filter: carrying dropped chunks through the
    // per-doc rollup lets ONE aggregation produce clean_text, n_chunks
    // and n_removed together — one corpus scan, no second documents
    // projection, no join back (and no doc is lost to the filter, since
    // every doc contributes all of its chunk rows)
    val w = Window.partitionBy("chunk")
    chunks
      .withColumn("first", min(struct(col("doc_id"), col("idx"))).over(w))
      .withColumn("keep", col("first.doc_id") === col("doc_id") &&
        col("first.idx") === col("idx"))
      .groupBy("doc_id")
      .agg(
        concat_ws(" ", expr(
          """transform(filter(array_sort(collect_list(struct(idx, chunk, keep))),
            |  x -> x.keep), x -> x.chunk)""".stripMargin)).as("clean_text"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"))
      .orderBy("doc_id")
  }

  val chunkDedupSql: String =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |ch AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS idx,
       |         array_to_string(ts[(i*$ChunkLen+1):((i+1)*$ChunkLen)], ' ') AS chunk
       |  FROM tok, UNNEST(range(0, (len(ts)+${ChunkLen - 1})//$ChunkLen)) AS t(i)),
       |kp AS (SELECT doc_id, idx, chunk,
       |       ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
       |       FROM ch),
       |ag AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS clean_text,
       |       CAST(COUNT(*) AS BIGINT) AS n_kept
       |       FROM kp WHERE rn = 1 GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST((len(ts)+${ChunkLen - 1})//$ChunkLen AS BIGINT) AS n_chunks
       |        FROM tok)
       |SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text, t.n_chunks,
       |  t.n_chunks - COALESCE(a.n_kept, 0) AS n_removed
       |FROM tot t LEFT JOIN ag a USING (doc_id) ORDER BY t.doc_id""".stripMargin

  private val HashDims = 32

  /** Feature hashing (the "hashing trick" vectorizer): each token maps to
    * `portable_hash(token) mod 32` and the document becomes a sparse
    * 32-dim term-frequency vector — the tokenizer-free featurization for
    * clustering / classification over corpora whose vocabulary would not
    * fit a dictionary (no vocab build, no broadcast, unbounded-vocab
    * safe — exactly why the trick exists at web scale). Output is the
    * sparse exploded form (doc_id, dim, tf, weight = tf / n_tokens);
    * zero dims are absent. One explode + one aggregation; the 15-hex-md5
    * hash replays verbatim in the oracle.
    */
  def hashedFeatures(t: Tables): DataFrame = {
    val tot = t.documents.select(col("doc_id"), size(toks).as("n_tokens"))
    t.documents
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"),
        pmod(graft.functions.PortableHash.hash60(col("tok")),
          lit(HashDims.toLong)).as("dim"))
      .groupBy("doc_id", "dim")
      .agg(count(lit(1)).as("tf"))
      .join(tot, Seq("doc_id"))
      .select(col("doc_id"), col("dim").cast("int").as("dim"), col("tf"),
        (col("tf").cast("double") / col("n_tokens")).as("weight"))
      .orderBy("doc_id", "dim")
  }

  val hashedFeaturesSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |d AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % $HashDims AS dim
       |  FROM tok),
       |tf AS (SELECT doc_id, dim, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM d GROUP BY 1, 2),
       |tot AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |        FROM documents)
       |SELECT tf.doc_id, CAST(dim AS INT) AS dim, tf,
       |  CAST(tf AS DOUBLE) / tot.n AS weight
       |FROM tf JOIN tot USING (doc_id)
       |ORDER BY doc_id, dim""".stripMargin

  val sourceOverlapSql: String =
    s"""WITH e AS (
       | SELECT source, unnest(grams) AS g
       | FROM (SELECT source, ${graft.functions.Shingles.grams3Sql("text")} AS grams
       |       FROM documents)),
       |sg AS (SELECT DISTINCT source, g FROM e),
       |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM sg GROUP BY 1),
       |inter AS (
       | SELECT a.source AS a_src, b.source AS b_src, CAST(COUNT(*) AS BIGINT) AS n_common
       | FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
       | GROUP BY 1, 2)
       |SELECT a.source AS a_src, b.source AS b_src,
       | a.sz AS a_sz, b.sz AS b_sz,
       | COALESCE(n_common, CAST(0 AS BIGINT)) AS n_common,
       | CAST(COALESCE(n_common, 0) AS DOUBLE)
       |   / (a.sz + b.sz - COALESCE(n_common, 0)) AS jaccard
       |FROM sizes a JOIN sizes b ON a.source < b.source
       |LEFT JOIN inter ON inter.a_src = a.source AND inter.b_src = b.source
       |ORDER BY jaccard DESC, a_src, b_src""".stripMargin

  /** Corpus novelty curve — "how much NEW content does each document
    * add": per doc, the fraction of its distinct word-5-grams whose
    * FIRST corpus occurrence (minimum doc_id owner) is this doc. A
    * saturating corpus trends toward zero novelty; the curve decides
    * when further crawling stops paying. One hashed-gram aggregation
    * (min owner per gram) + one owner-keyed join back — linear, the
    * decontaminate shuffle shape.
    */
  def ngramNovelty(t: Tables): DataFrame = {
    val g = t.documents
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.WordNGrams(col("text"), Curation.ContamN))).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h"))
    val firstOwner = g.groupBy("h").agg(min(col("doc_id")).as("first_doc"))
    g.join(firstOwner, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum((col("first_doc") === col("doc_id")).cast("long")).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
      .orderBy("doc_id")
  }

  val ngramNoveltySql: String = {
    val grams = Curation.grams5SqlShared("text")
    s"""WITH g AS (
       | SELECT doc_id, $grams AS grams FROM documents),
       |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |fo AS (SELECT gram, MIN(doc_id) AS first_doc FROM e GROUP BY gram)
       |SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       | CAST(SUM(CASE WHEN fo.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_novel,
       | CAST(SUM(CASE WHEN fo.first_doc = e.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
       |   / COUNT(*) AS novelty
       |FROM e JOIN fo USING (gram)
       |GROUP BY e.doc_id
       |ORDER BY e.doc_id""".stripMargin
  }

  private val BurstMinDf = 20
  private val BurstTopK = 40

  /** Word burstiness — variance-to-mean ratio (index of dispersion) of
    * per-document counts for corpus words above [[BurstMinDf]] document
    * frequency: bursty words (VMR ≫ 1) concentrate in few docs (topic
    * words); Poisson-like words (VMR ≈ 1) spread evenly (function
    * words). The classic Church-Gale burstiness diagnostic that
    * separates content from glue vocabulary before IDF-style weighting.
    * ZERO counts matter: docs not containing the word contribute 0, so
    * the moments run over per-doc counts with N = corpus doc count
    * attached as a broadcast scalar — Σc and Σc² come from the posting
    * rows alone. VMR in exact ppm: `((N·Σc² − (Σc)²) · 10⁶) div
    * (Σc · N)` (population variance over mean, all integer). One
    * (word, doc) aggregation + one word aggregation + TakeOrdered.
    */
  def burstiness(t: Tables): DataFrame = {
    val nDocs = t.documents.agg(count(lit(1)).as("nd"))
    val wd = t.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
    wd.groupBy("w")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .where(col("df") >= BurstMinDf)
      .crossJoin(broadcast(nDocs))
      .select(col("w"), col("df"), col("s1").as("n_occurrences"),
        expr("((nd * s2 - s1 * s1) * 1000000L) div (s1 * nd)").as("vmr_ppm"))
      .orderBy(col("vmr_ppm").desc, col("w"))
      .limit(BurstTopK)
  }

  val burstinessSql: String =
    s"""WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
       |wd AS (
       | SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
       | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |       FROM documents)
       | GROUP BY 1, 2),
       |ws AS (
       | SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
       |  CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2
       | FROM wd GROUP BY w HAVING COUNT(*) >= $BurstMinDf)
       |SELECT w, df, s1 AS n_occurrences,
       | CAST(((nd.nd * s2 - s1 * s1) * 1000000) // (s1 * nd.nd) AS BIGINT)
       |   AS vmr_ppm
       |FROM ws, nd
       |ORDER BY vmr_ppm DESC, w
       |LIMIT $BurstTopK""".stripMargin
}
