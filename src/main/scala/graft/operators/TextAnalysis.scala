package graft.operators

import graft.Tables
import graft.functions.RollingHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token stats, quality
  * scoring, language ID, fingerprinting. Everything is a codegen'd
  * projection over the documents table — embarrassingly parallel, no
  * shuffle except the final presentation sort.
  */
object TextAnalysis {

  private def toks: Column = split(col("text"), " ")

  /** Token counting: whitespace tokens, distinct tokens, mean token
    * length (derived arithmetically so both engines agree exactly).
    */
  def tokenStats(t: Tables): DataFrame =
    t.documents.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        ((length(col("text")) - (size(toks) - 1)).cast("double") / size(toks))
          .as("mean_token_len"))
      .orderBy("doc_id")

  val tokenStatsSql: String =
    """SELECT doc_id,
      | len(string_split(text, ' ')) AS n_tokens,
      | len(list_distinct(string_split(text, ' '))) AS n_distinct,
      | CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |   / len(string_split(text, ' ')) AS mean_token_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** BPE-style pre-tokenization count: the GPT-2-family splitter shape
    * (letter runs / digit runs / punctuation runs, each with optional
    * leading space) — the standard cheap token-count estimator when the
    * real tokenizer can't ship to executors.
    */
  def bpeTokens(t: Tables): DataFrame =
    t.documents.select(
        col("doc_id"),
        size(expr("regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0)"))
          .as("n_bpe_tokens"),
        size(split(col("text"), " ")).as("n_ws_tokens"))
      .orderBy("doc_id")

  val bpeTokensSql: String =
    """SELECT doc_id,
      | len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS n_bpe_tokens,
      | len(string_split(text, ' ')) AS n_ws_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality scoring: stopword ratio, alphabetic-character ratio,
    * length factor — combined into one score. All double arithmetic uses
    * the same expression tree as the oracle, so scores match exactly.
    */
  def quality(t: Tables): DataFrame = {
    val sw = Stopwords.map(s => s"'$s'").mkString(", ")
    t.documents.select(
        col("doc_id"),
        (expr(s"size(filter(split(text, ' '), w -> w IN ($sw)))").cast("double")
          / size(toks)).as("stopword_ratio"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
          / length(col("text"))).as("alpha_ratio"),
        least(lit(1.0), size(toks).cast("double") / 100.0).as("length_factor"))
      .withColumn("quality_score",
        lit(0.4) * col("stopword_ratio") + lit(0.3) * col("alpha_ratio")
          + lit(0.3) * col("length_factor"))
      .orderBy("doc_id")
  }

  val qualitySql: String = {
    val sw = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, stopword_ratio, alpha_ratio, length_factor,
       | 0.4 * stopword_ratio + 0.3 * alpha_ratio + 0.3 * length_factor AS quality_score
       |FROM (
       | SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ($sw))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stopword_ratio,
       |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
       |    / length(text) AS alpha_ratio,
       |  least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) AS length_factor
       | FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  private val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Language ID: stopword-hit scoring per language plus a CJK
    * character check, highest count wins with a fixed priority order.
    * (A production system would use char-n-gram profiles; the contract
    * here is a deterministic, engine-portable heuristic.)
    */
  def langId(t: Tables): DataFrame = {
    def hits(wordsList: Seq[String]): Column = {
      val sw = wordsList.map(s => s"'$s'").mkString(", ")
      expr(s"size(filter(split(text, ' '), w -> w IN ($sw)))")
    }
    val scored = t.documents.select(
      (Seq(col("doc_id"), col("lang").as("declared_lang"),
        length(regexp_replace(col("text"), "[^一-鿿]", "")).as("cjk_chars")) ++
        LangStopwords.map { case (l, ws) => hits(ws).as(s"${l}_hits") }): _*)
    scored.withColumn("predicted_lang",
        when(col("cjk_chars") > 0, "zh")
          .when(col("es_hits") > col("en_hits") && col("es_hits") >= col("fr_hits")
            && col("es_hits") >= col("de_hits"), "es")
          .when(col("fr_hits") > col("en_hits") && col("fr_hits") >= col("de_hits"), "fr")
          .when(col("de_hits") > col("en_hits"), "de")
          .otherwise("en"))
      .orderBy("doc_id")
  }

  val langIdSql: String = {
    def hitsSql(ws: Seq[String]): String =
      s"len(list_filter(string_split(text, ' '), w -> w IN (${ws.map(s => s"'$s'").mkString(", ")})))"
    val cols = LangStopwords.map { case (l, ws) => s" ${hitsSql(ws)} AS ${l}_hits," }.mkString("\n")
    val cjkRe = "[^\\x{4e00}-\\x{9fff}]"
    s"""SELECT doc_id, declared_lang, cjk_chars, en_hits, es_hits, fr_hits, de_hits,
       | CASE WHEN cjk_chars > 0 THEN 'zh'
       |      WHEN es_hits > en_hits AND es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
       |      WHEN fr_hits > en_hits AND fr_hits >= de_hits THEN 'fr'
       |      WHEN de_hits > en_hits THEN 'de'
       |      ELSE 'en' END AS predicted_lang
       |FROM (
       | SELECT doc_id, lang AS declared_lang,
       |  length(regexp_replace(text, '$cjkRe', '', 'g')) AS cjk_chars,
       |$cols
       |  text
       | FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Key-collision fingerprint (OpenRefine style): sorted distinct
    * tokens re-joined and hashed — whitespace/order/duplication
    * insensitive duplicate key.
    */
  def fingerprint(t: Tables): DataFrame =
    t.documents.select(
        col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(lower(trim(col("text"))), " ")))))
          .as("fingerprint"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      | md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' ')) AS fingerprint
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Polynomial rolling-hash fingerprint via the custom codegen'd
    * Catalyst expression [[graft.functions.RollingHash]]. Rows-only (the
    * hash is implementation-defined).
    */
  def rollingHashFingerprint(t: Tables): DataFrame =
    t.documents.select(
        col("doc_id"),
        RollingHash(col("text")).as("rolling_hash"))
      .orderBy("doc_id")

  /** Oracle: the same base-257 mod-2⁶¹−1 fold replayed in SQL over
    * per-character code points with HUGEINT arithmetic. Valid because the
    * documents corpus is pure ASCII (code point == UTF-8 byte); a
    * non-ASCII corpus would make this comparison fail loudly rather than
    * silently pass — which is the behavior we want from an oracle.
    */
  val rollingHashFingerprintSql: String =
    """SELECT doc_id,
      | CAST(list_reduce(
      |   list_prepend(CAST(0 AS HUGEINT),
      |     list_transform(string_split(text, ''), c -> CAST(ascii(c) AS HUGEINT))),
      |   (h, b) -> (h * 257 + b) % 2305843009213693951) AS BIGINT) AS rolling_hash
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // PII patterns restricted to syntax with identical semantics in Java
  // regex and RE2 (DuckDB): no backrefs, no lookaround.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  private val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrubbing — the redaction pass a training corpus runs before
    * anything else: emails, phone numbers, and IPv4 literals replaced by
    * typed placeholders, with per-doc redaction counts for auditing.
    * Counts are taken on the PROGRESSIVELY scrubbed text (phones counted
    * after email redaction, etc.) so they equal the placeholders actually
    * emitted even when patterns overlap. Pure codegen'd
    * regexp_replace/extract chain: shuffle-free, a narrow map over the
    * corpus.
    */
  def piiScrub(t: Tables): DataFrame = {
    val noEmail = regexp_replace(col("text"), EmailRe, "[EMAIL]")
    val noPhone = regexp_replace(noEmail, PhoneRe, "[PHONE]")
    def count(in: org.apache.spark.sql.Column, re: String) =
      size(regexp_extract_all(in, lit(re), lit(0)))
    t.documents.select(
        col("doc_id"),
        regexp_replace(noPhone, Ipv4Re, "[IP]").as("scrubbed"),
        count(col("text"), EmailRe).as("n_emails"),
        count(noEmail, PhoneRe).as("n_phones"),
        count(noPhone, Ipv4Re).as("n_ips"))
      .orderBy("doc_id")
  }

  private val PackCapacity = 2048 // tokens per packed training sequence
  private val PackBucket   = 64   // docs per cumsum bucket (coarse prefix-sum level)

  /** Sequence packing — the concat-and-chunk step that turns a document
    * corpus into fixed-capacity training sequences: documents are laid
    * end-to-end in doc_id order and each doc belongs to the bin where its
    * first token lands (`floor(exclusive_cumsum / capacity)`).
    *
    * The global running offset is a DISTRIBUTED TWO-LEVEL PREFIX SUM:
    * per-bucket cumulative sums (windows partitioned by `doc_id div B`)
    * plus a second window over the per-bucket totals, which is n/B rows —
    * the single-partition stage shrinks by the bucket factor instead of
    * seeing every row. B is a constant 64 here (right for test scale);
    * at extreme corpus sizes pick B ≈ √n or add a third level — the
    * output is identical for any B. Integer token counts keep both
    * levels exact, and the oracle is the flat
    * `SUM() OVER (ORDER BY doc_id)` the two-level form provably equals.
    */
  def packSequences(t: Tables): DataFrame = {
    val toks = t.documents.select(
      col("doc_id"),
      (size(split(col("text"), " "))).as("n_tokens"),
      expr(s"doc_id div $PackBucket").as("bucket")) // integer div, not double `/`
    val wInBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = toks.withColumn("local_cum", sum(col("n_tokens")).over(wInBucket))
    val wBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("bucket_total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("bucket_total")).over(wBuckets), lit(0L)))
      .select("bucket", "bucket_offset")
    local.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start_offset",
        col("bucket_offset") + col("local_cum") - col("n_tokens"))
      .withColumn("bin", expr(s"start_offset div $PackCapacity"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("bin")
  }

  val packSequencesSql: String =
    s"""SELECT CAST(start_offset // $PackCapacity AS BIGINT) AS bin, -- floor div, surfaced as BIGINT
       | CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM (
       | SELECT doc_id, n_tokens,
       |  COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
       | FROM (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       |  FROM documents))
       |GROUP BY bin
       |ORDER BY bin""".stripMargin

  private val HhK = 200 // heavy hitter = gram with > 1/200 of all gram instances

  /** Corpus boilerplate detection: word-3-grams occurring in more than
    * 1/200 of all gram instances — the repeated headers/footers/templates
    * a curation pipeline strips before dedup.
    *
    * Pass 1 is the bounded-memory Misra-Gries sketch
    * ([[graft.functions.MisraGries]], a typed Aggregator: ≤ k counters
    * per partial, one shuffle of k-entry maps) which provably contains
    * every true heavy hitter; pass 2 re-counts ONLY the candidate grams
    * exactly and applies the integer threshold `count·k > total`. Output
    * is exact and deterministic, so the oracle is a plain HAVING over the
    * full gram multiset — at 100 TB the sketch pass is what makes this
    * feasible (the full gram cardinality never materializes).
    */
  def boilerplateGrams(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    val ex = graft.functions.Shingles.gramsOf(t.documents)
      .select(explode(col("grams")).as("gram")).localCheckpoint(true)
    val mg = new graft.functions.MisraGries(HhK)
    val candidates = ex.as[String].select(mg.toColumn.name("cands")).head()
    val out = ex.where(col("gram").isin(candidates: _*))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(ex.agg(count(lit(1)).as("total"))))
      .where(col("n") * HhK > col("total"))
      .select(col("gram"), col("n"), col("total"))
      .orderBy("gram")
    out
  }

  val boilerplateGramsSql: String =
    s"""WITH g AS (
       | SELECT doc_id, ${graft.functions.Shingles.grams3Sql("text")} AS grams
       | FROM documents),
       |e AS (SELECT unnest(grams) AS gram FROM g),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM e)
       |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n, total
       |FROM e, tot
       |GROUP BY gram, total
       |HAVING COUNT(*) * $HhK > total
       |ORDER BY gram""".stripMargin

  val piiScrubSql: String =
    s"""SELECT doc_id,
       | regexp_replace(no_phone, '$Ipv4Re', '[IP]', 'g') AS scrubbed,
       | CAST(len(regexp_extract_all(text, '$EmailRe', 0)) AS INT) AS n_emails,
       | CAST(len(regexp_extract_all(no_email, '$PhoneRe', 0)) AS INT) AS n_phones,
       | CAST(len(regexp_extract_all(no_phone, '$Ipv4Re', 0)) AS INT) AS n_ips
       |FROM (
       | SELECT doc_id, text, no_email,
       |  regexp_replace(no_email, '$PhoneRe', '[PHONE]', 'g') AS no_phone
       | FROM (
       |  SELECT doc_id, text,
       |   regexp_replace(text, '$EmailRe', '[EMAIL]', 'g') AS no_email
       |  FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Code keywords scored by [[codeDetect]] (language-agnostic core). */
  private val CodeKeywords = Seq(
    "def", "return", "import", "class", "if", "else", "for", "while",
    "var", "val", "function", "int", "void", "null", "new")

  /** Code-vs-prose heuristic — the [[langId]] sibling a corpus router
    * needs before sending documents down prose-only curation (Gopher
    * rules butcher source code): three row-local integer-ratio features
    * — symbol density (braces/brackets/operators per char), programming-
    * keyword hits per token, and digit density — combined by fixed
    * weights, verdict at 0.15. Every ratio is a small-int division with
    * the oracle's exact expression tree; one narrow projection, no
    * shuffle, trivially corpus-scale.
    */
  def codeDetect(t: Tables): DataFrame = {
    val kw = CodeKeywords.map(s => s"'$s'").mkString(", ")
    t.documents.select(
        col("doc_id"),
        (length(regexp_replace(col("text"), "[^{}()\\[\\];=<>+*/&|._-]", ""))
          .cast("double") / length(col("text"))).as("symbol_ratio"),
        (expr(s"size(filter(split(text, ' '), w -> w IN ($kw)))").cast("double")
          / size(split(col("text"), " "))).as("keyword_ratio"),
        (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
          / length(col("text"))).as("digit_ratio"))
      .withColumn("code_score",
        lit(0.5) * col("symbol_ratio") + lit(0.4) * col("keyword_ratio")
          + lit(0.1) * col("digit_ratio"))
      .withColumn("is_code", col("code_score") > 0.15)
      .orderBy("doc_id")
  }

  val codeDetectSql: String = {
    val kw = CodeKeywords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, symbol_ratio, keyword_ratio, digit_ratio,
       | 0.5 * symbol_ratio + 0.4 * keyword_ratio + 0.1 * digit_ratio
       |   AS code_score,
       | 0.5 * symbol_ratio + 0.4 * keyword_ratio + 0.1 * digit_ratio > 0.15
       |   AS is_code
       |FROM (
       | SELECT doc_id,
       |  CAST(length(regexp_replace(text, '[^{}()\\[\\];=<>+*/&|._-]', '', 'g'))
       |    AS DOUBLE) / length(text) AS symbol_ratio,
       |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ($kw)))
       |    AS DOUBLE) / len(string_split(text, ' ')) AS keyword_ratio,
       |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
       |    / length(text) AS digit_ratio
       | FROM documents)
       |ORDER BY doc_id""".stripMargin
  }
}
