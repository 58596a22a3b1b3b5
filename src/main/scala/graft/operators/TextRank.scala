package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics text operators: keyword extraction and
  * deterministic dataset splitting.
  */
object TextRank {

  /** Keyword extraction, tf-idf shaped but integer-exact: score =
    * tf · 10⁶ div df (term frequency over document frequency). Avoiding
    * `ln` keeps the score bit-identical across engines (libm vs JVM log
    * differ in the last ulp); the RANKING is the same monotone order as
    * tf·log-idf for fixed tf. Top-3 terms per doc, ties by term.
    */
  def keywords(t: Tables): DataFrame = {
    val terms = t.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score", expr("tf * 1000000L div df").cast("long"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("doc_id", "rk", "term", "tf", "df", "score")
      .orderBy("doc_id", "rk")
  }

  val keywordsSql: String =
    """SELECT doc_id, rk, term, tf, df, score FROM (
      | SELECT doc_id, term, tf, df,
      |  CAST(tf * 1000000 // df AS BIGINT) AS score,
      |  ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY CAST(tf * 1000000 // df AS BIGINT) DESC, term) AS rk
      | FROM (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY doc_id, term) tf
      | JOIN (
      |  SELECT term, COUNT(*) AS df
      |  FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY term) df USING (term))
      |WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  private val VocabSize = 200

  /** Corpus vocabulary build — the tokenizer-prep step of a training
    * pipeline: global token counts, the top-[[VocabSize]] tokens by
    * frequency (ties by token text) with 1-based ranks and corpus
    * coverage shares. One aggregation + a TakeOrdered top-k reduction;
    * the rank window runs over the already-truncated top-k rows (bounded
    * — never a corpus-wide single partition). The share is one
    * long/long IEEE division — portable bit-for-bit.
    */
  def vocab(t: Tables): DataFrame = {
    val counts = t.documents
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("long").as("total"))
    counts
      .orderBy(col("cnt").desc, col("token")).limit(VocabSize)
      .crossJoin(broadcast(total))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
      .select(col("rank"), col("token"), col("cnt"),
        (col("cnt").cast("double") / col("total")).as("share"))
      .orderBy("rank")
  }

  val vocabSql: String =
    s"""WITH c AS (
       | SELECT token, COUNT(*) AS cnt
       | FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
       | WHERE length(token) > 0
       | GROUP BY token),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
       |SELECT rank, token, cnt, share FROM (
       | SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank,
       |  token, cnt, CAST(cnt AS DOUBLE) / (SELECT total FROM tot) AS share
       | FROM c)
       |WHERE rank <= $VocabSize
       |ORDER BY rank""".stripMargin

  /** Corpus-LM familiarity scoring — the "perplexity-ish" quality signal
    * of a curation pipeline, computed from the corpus's own bigram
    * statistics instead of an external model: each bigram occurrence
    * (w1,w2) contributes `count(w1,w2)·10⁶ div count(w1)` (a scaled
    * integer P(w2|w1)) and a document scores the integer mean over its
    * bigrams. In-distribution text scores high; shuffled/rare text scores
    * low. All-integer math keeps it order-independent and bit-portable —
    * a true log-perplexity would hit libm divergence across engines.
    * Shape at scale: two count aggregations + two co-partitioned
    * equi-joins on the gram keys — linear, no pair space.
    */
  def lmScore(t: Tables): DataFrame = {
    val docs = t.documents.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val uni = docs.select(explode(col("ws")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("uc"))
    val bg = docs.select(col("doc_id"), explode(
        when(size(col("ws")) >= 2,
          expr("transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"))
          .otherwise(expr("array()"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // pre-aggregate per-doc occurrences to (doc_id, w1, w2, dc) BEFORE
    // joining the corpus count tables: a hot bigram ("of the") would
    // otherwise put every one of its occurrences in one join partition.
    // The join input shrinks by the per-doc repetition factor and skew is
    // bounded by the number of DOCS containing the bigram, not tokens;
    // each distinct bigram contributes its count-weighted score instead.
    val bgc = bg.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("dc"))
    val bc = bgc.groupBy("w1", "w2").agg(sum(col("dc")).as("bc"))
    bgc.join(bc, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .groupBy("doc_id")
      .agg(sum(col("dc")).as("n_bigrams"),
        sum(expr("dc * ((bc * 1000000L) div uc)")).as("fam_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("fam_sum div n_bigrams").cast("long").as("lm_score"))
      .orderBy("doc_id")
  }

  val lmScoreSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bg AS (
      | SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      | FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM d)),
      |bc AS (SELECT w1, w2, COUNT(*) AS bc FROM bg GROUP BY w1, w2),
      |uc AS (SELECT w1, COUNT(*) AS uc
      |       FROM (SELECT unnest(ws) AS w1 FROM d) GROUP BY w1)
      |SELECT bg.doc_id, COUNT(*) AS n_bigrams,
      | CAST(SUM((bc.bc * 1000000) // uc.uc) // COUNT(*) AS BIGINT) AS lm_score
      |FROM bg JOIN bc USING (w1, w2) JOIN uc USING (w1)
      |GROUP BY bg.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Deterministic train/val/test split by content hash — the standard
    * leakage-safe split for training corpora: the assignment depends only
    * on the document identity (md5 prefix), not on partitioning, order,
    * or RNG state, so it is stable across runs and engines.
    */
  def trainTestSplit(t: Tables): DataFrame =
    t.documents
      .withColumn("bucket", substring(md5(col("text")), 1, 2))
      .withColumn("split",
        when(col("bucket") < "cc", "train")          // ~80%
          .when(col("bucket") < "e6", "val")          // ~10%
          .otherwise("test"))                         // ~10%
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split", "lang")

  val trainTestSplitSql: String =
    """SELECT split, lang, COUNT(*) AS n_docs,
      | CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM (
      | SELECT lang, n_chars,
      |  CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
      |       WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      | FROM documents)
      |GROUP BY split, lang
      |ORDER BY split, lang""".stripMargin

  private val OovVocabSize = 20

  /** Out-of-vocabulary rate per document against the corpus's own
    * top-[[OovVocabSize]] token vocabulary — the tokenizer-prep metric
    * that decides vocab size and flags domain-shifted documents. The
    * vocabulary is a [[OovVocabSize]]-row broadcast; the per-doc pass is
    * one exploded left join + aggregation, linear at corpus scale.
    */
  def oovRate(t: Tables): DataFrame = {
    val ex = t.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
    val voc = ex.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(OovVocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    ex.join(broadcast(voc), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy("doc_id")
  }

  val oovRateSql: String =
    s"""WITH ex AS (
       | SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |exf AS (SELECT doc_id, token FROM ex WHERE length(token) > 0),
       |voc AS (
       | SELECT token FROM (
       |  SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rk
       |  FROM exf GROUP BY token)
       | WHERE rk <= $OovVocabSize)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       | CAST(SUM(CASE WHEN voc.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       | CAST(SUM(CASE WHEN voc.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_rate
       |FROM exf LEFT JOIN voc ON exf.token = voc.token
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Power-of-two ranks probed by [[zipfProfile]]. */
  private val ZipfRanks = (0 to 9).map(1L << _) // 1..512

  /** Zipf rank-frequency profile of the corpus vocabulary — the
    * distribution-shape fingerprint that tells a curation pipeline
    * whether a corpus looks like natural language (halving the rank
    * roughly doubles the frequency, slope ≈ −1 on log-log), machine
    * output (flat head), or boilerplate spam (cliff after a tiny
    * head): token frequencies at the power-of-two ranks 1..512, each
    * with its frequency ratio to the DOUBLED rank in exact micros
    * (`cnt[r]·10⁶ div cnt[2r]` ≈ 2·10⁶ under Zipf-1) — the discrete
    * log-log slope with no logs, so it replays bit-exactly. The
    * whitespace tokenization is [[vocab]]'s.
    *
    * Scale: one token-count aggregation; the rank cut is a bounded
    * TakeOrdered (top-1024 rows), and the probe/double-rank join runs
    * on the 10-row probe list. Linear in corpus tokens.
    */
  def zipfProfile(t: Tables): DataFrame = {
    val maxRank = (ZipfRanks.last * 2).toInt
    val ranked = t.documents
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(maxRank)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
      .localCheckpoint(true)
    ranked
      .where(col("rank").isInCollection(ZipfRanks.map(_.toInt)))
      .join(ranked.select(col("rank").as("rank2"), col("cnt").as("cnt2")),
        col("rank2") === col("rank") * 2, "left")
      .select(col("rank").cast("long").as("rank"), col("token"),
        col("cnt").cast("long").as("cnt"),
        when(col("cnt2").isNotNull,
          expr("(cnt * 1000000L) div cnt2")).as("halving_ratio_micros"))
      .orderBy("rank")
  }

  /** Oracle: identical tokenization, ranked counts, probe ranks, and
    * the doubled-rank self-join ratio.
    */
  val zipfProfileSql: String = {
    val probes = ZipfRanks.mkString(", ")
    s"""WITH c AS (
       | SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
       | FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
       | WHERE length(token) > 0
       | GROUP BY token),
       |r AS (
       | SELECT token, cnt,
       |  ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
       | FROM c QUALIFY rank <= ${ZipfRanks.last * 2})
       |SELECT CAST(a.rank AS BIGINT) AS rank, a.token, a.cnt,
       | CASE WHEN b.cnt IS NOT NULL
       |      THEN (a.cnt * 1000000) // b.cnt END AS halving_ratio_micros
       |FROM r a LEFT JOIN r b ON b.rank = a.rank * 2
       |WHERE a.rank IN ($probes)
       |ORDER BY a.rank""".stripMargin
  }
}
