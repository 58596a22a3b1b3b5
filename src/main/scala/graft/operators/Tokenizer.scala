package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer TRAINING: deterministic byte-pair-encoding merge learning
  * over the documents corpus — the step that turns a raw corpus into the
  * merge table `text_bpe_tokens` / `text_pack_sequences` would consume.
  *
  * Scale shape: the ONLY corpus-sized pass is the word-frequency
  * aggregation (map-side combinable groupBy). Every merge round after
  * that runs on the aggregated VOCABULARY table (≪ corpus — bounded by
  * distinct word forms, not tokens), the same reduction classic BPE
  * trainers rely on. Per round: one small shuffle (pair counts) and one
  * narrow projection (merge application); the only driver state is the
  * single best pair per round (2 short strings — the bounded-model
  * convention of the k-means centroids in [[Similarity]]).
  *
  * Merge semantics are defined EXACTLY as "leftmost non-overlapping
  * `replace` on the space-separated symbol string" (so `a a a a` under
  * merge (a,a) becomes `aa a a` after one round, not `aa aa` — the
  * scan resumes after each replacement). Both engines implement string
  * replace with that same standard scan, which is what makes the oracle
  * replay bit-exact; canonical BPE's repeat-run handling differs only on
  * degenerate all-same-letter runs.
  */
object Tokenizer {

  private[graft] val BpeMerges = 20

  /** Word-frequency vocabulary, each word exploded to a space-separated
    * character-symbol string: `hello` → `h e l l o`.
    */
  private def vocab(t: Tables): DataFrame =
    t.documents
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(trim(regexp_replace(col("word"), "(.)", "$1 ")).as("w"), col("freq"))

  /** Adjacent-symbol pair counts over the current vocabulary state. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("s", split(col("w"), " "))
      .where(size(col("s")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(s) - 1),
          |  j -> concat(element_at(s, j), ' ', element_at(s, j + 1)))"""
          .stripMargin)).as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))

  /** Learn [[BpeMerges]] merges: per round, the most frequent adjacent
    * symbol pair (ties broken lexicographically on the pair string) is
    * merged throughout the vocabulary. Output: one row per learned merge
    * (rank, left symbol, right symbol, merged symbol, pair frequency at
    * merge time).
    */
  /** The training loop itself, returning the merge table as driver
    * values (bounded: [[BpeMerges]] rows of short strings) so both the
    * registered trainer output and [[bpeApply]]'s merge fold share one
    * learned model.
    */
  private def learnMerges(t: Tables): Seq[(Int, String, String, String, Long)] = {
    // one corpus pass, then cache: every round re-reads the (small)
    // vocabulary, never the corpus. The vocabulary is orders of
    // magnitude smaller than the corpus (distinct word forms), so
    // coalesce the cache to a handful of partitions: the 2×rounds
    // follow-up jobs schedule 8 tasks instead of a full
    // shuffle-partition fan of near-empty ones (the rounds' cost is
    // dominated by per-round job latency, so this trims overhead
    // rather than transforms it — measured neutral-to-slightly-better)
    // hold the cached BASE in its own val: `words` is reassigned to the
    // withColumn-stacked derivative each round, so unpersisting `words`
    // at the end would target a plan that was never cached and leak the
    // vocabulary cache for the session (r9 ADVICE)
    val base = vocab(t).coalesce(8).cache()
    var words: DataFrame = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    def applyMerge(l: String, r: String): Unit =
      // leftmost non-overlapping merge application — a narrow
      // projection stacked on the cached vocab (no shuffle); symbols
      // are [a-z]+ so literal embedding in the expression is safe
      words = words.withColumn("w",
        expr(s"trim(replace(concat(' ', w, ' '), ' $l $r ', ' $l$r '))"))
    // Several merges per SCAN where provably sound (the scan —
    // pairCounts over the vocabulary — is the round's whole cost, so
    // each extra sound pick removes one full round). One scan ranks
    // pairs (cnt DESC, pair ASC); we then select a CONSECUTIVE prefix
    // of rows greedily, P1, S2, S3, … — row S_j is the true round-j
    // winner, with its recorded frequency exact, iff:
    //  (1) S_j shares no symbol (by string) with any previously
    //      selected pair — then those merges destroy no S_j-adjacency
    //      and create none (created adjacencies all involve the new
    //      concatenated symbols), so cnt(S_j) at round j EQUALS its
    //      round-1 count;
    //  (2) every collected row that could spawn a new merged-symbol
    //      pair — an (x, l_i) row feeding (x, l_i r_i) or an (r_i, y)
    //      row feeding (l_i r_i, y), for ANY previously selected pair
    //      i; every new-pair instance (cascades included: a chain like
    //      (l1r1, l2r2) maps back through (r1, l2)) maps injectively
    //      onto such an old adjacency, so new counts are bounded by
    //      those rows — counts strictly BELOW cnt(S_j), so no created
    //      pair can tie or beat S_j under the round-j ordering (for a
    //      doubled pair (a, a) the row matches its own pattern and
    //      blocks further picks, which also covers (aa, aa) chains);
    //  (3) the collected prefix provably contains every row with
    //      cnt ≥ cnt(S_j) — the last collected row is below it — so
    //      (2) was checked against the complete candidate set;
    //  (4) every symbol created earlier in this scan is a FRESH string:
    //      if some l_i+r_i collides with a symbol any earlier rank
    //      already created, that replace pours new instances into
    //      EXISTING (·, l_i r_i)/(l_i r_i, ·) pairs, whose counts could
    //      then exceed cnt(S_j) without any collected row revealing it
    //      (count + gain can top the prefix even when both parts sit
    //      below it) — a collision ends the scan's selection, never
    //      the merge itself.
    // Existing unselected pairs can only lose instances to the scan's
    // merges, and any count-tie at cnt(S_j) already lost the pair-ASC
    // tie-break in round 1 (it would otherwise BE an earlier selected
    // row), so S_j wins round j exactly.
    val ScanDepth = 32
    var exhausted = false
    var rank = 1
    while (rank <= BpeMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("pair")).head(ScanDepth)
      if (top.isEmpty) exhausted = true // corpus too small for more merges
      else {
        var selected = List.empty[(String, String)] // this scan's picks
        var idx = 0
        var continue = true
        while (continue && rank <= BpeMerges && idx < top.length) {
          val cnt = top(idx).getLong(1)
          val Array(l, r) = top(idx).getString(0).split(" ", 2)
          val sound = selected.isEmpty || {
            val syms = selected.flatMap { case (a, b) => Seq(a, b) }.toSet
            val disjoint = !syms(l) && !syms(r)
            val prefixComplete =
              top.length < ScanDepth || top.last.getLong(1) < cnt
            val noNewPairThreat = !top.exists { q =>
              val Array(x, y) = q.getString(0).split(" ", 2)
              q.getLong(1) >= cnt &&
                selected.exists { case (li, ri) => y == li || x == ri }
            }
            disjoint && prefixComplete && noNewPairThreat
          }
          if (sound) {
            val fresh = !merges.exists(_._4 == l + r) // condition (4)
            merges += ((rank, l, r, l + r, cnt))
            applyMerge(l, r)
            rank += 1
            idx += 1
            selected ::= ((l, r))
            if (!fresh) continue = false
          } else continue = false
        }
        // pin the post-scan state LAZILY: the pin is load-bearing (r17
        // measured the unpinned replace stack at +1.6 s — re-analyzing
        // and re-executing a quadratically growing projection stack per
        // scan costs more than materialization), but an EAGER checkpoint
        // is a whole extra job per scan; localCheckpoint(false)
        // materializes inside the NEXT scan's pairCounts job instead,
        // halving the per-scan job count at identical state.
        words = words.localCheckpoint(false)
      }
    }
    base.unpersist(false)
    merges.toSeq
  }

  /** Session-scoped merge-table memo per (session, dir) — the trained
    * BPE model is bounded driver state ([[BpeMerges]] rows of short
    * strings) consumed by BOTH [[bpeTrain]] and [[bpeApply]]; the
    * [[graft.SessionMemo]] convention trains it once.
    */
  private val mergesMemo =
    new graft.SessionMemo[Seq[(Int, String, String, String, Long)]]

  private def learnMergesShared(t: Tables): Seq[(Int, String, String, String, Long)] =
    mergesMemo.getOrCompute(t.spark, t.dir)(learnMerges(t))

  /** [[graft.Training]] forcer for the BPE merge table. */
  private[graft] def warmMerges(t: Tables): Unit = { learnMergesShared(t); () }

  def bpeTrain(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    learnMergesShared(t)
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** Tokenize the corpus WITH the learned merges — the apply half of
    * the tokenizer story (train → apply → count). Each document is
    * lowercased, split to [a-z]+ words, char-spaced, and the words are
    * joined with a `|` sentinel no merge pattern can cross; the learned
    * merge list then folds over the whole corpus as [[BpeMerges]]
    * stacked NARROW projections (replace is row-local — zero shuffles
    * beyond the training's vocabulary aggregations). Output: per-doc
    * post-merge token count next to the pre-merge symbol count.
    */
  def bpeApply(t: Tables): DataFrame = {
    val merges = learnMergesShared(t)
    val repr = t.documents.select(
      col("doc_id"),
      expr(
        """concat(' ', array_join(transform(
          |  regexp_extract_all(lower(text), '[a-z]+', 0),
          |  w -> trim(regexp_replace(w, '(.)', '$1 '))), ' | '), ' ')"""
          .stripMargin).as("u"))
    val folded = merges.foldLeft(repr) { case (df, (_, l, r, _, _)) =>
      df.withColumn("u", expr(s"replace(u, ' $l $r ', ' $l$r ')"))
    }
    folded.select(
        col("doc_id"),
        size(expr(
          "filter(split(trim(u), ' '), x -> x != '|' and x != '')"))
          .cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Oracle: the same merge rounds unrolled as CTEs (the
    * [[Graph.pageRankSql]] pattern) — per round, pair counts from the
    * current vocab state, argmax with the identical (cnt DESC, pair)
    * tie-break, and the identical sentinel-space `replace` application.
    */
  // MATERIALIZED is load-bearing throughout: every w$i / d$i is
  // referenced twice (next round's pair count + next state), so an
  // inlining planner would expand the chain exponentially — 2^rounds
  // scans of the documents table
  private def trainRoundsSql: String = {
    def round(i: Int, prev: String): String =
      s"""p$i AS MATERIALIZED (
         |  SELECT s[j] || ' ' || s[j+1] AS pair, SUM(freq) AS cnt FROM (
         |    SELECT s, freq, unnest(range(1, len(s))) AS j
         |    FROM (SELECT string_split(w, ' ') AS s, freq FROM $prev))
         |  GROUP BY 1),
         |b$i AS MATERIALIZED (
         |  SELECT pair, cnt, string_split(pair, ' ')[1] AS l,
         |         string_split(pair, ' ')[2] AS r
         |  FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT trim(replace(' ' || w || ' ',
         |    COALESCE((SELECT ' '||l||' '||r||' ' FROM b$i), chr(1)),
         |    COALESCE((SELECT ' '||l||r||' ' FROM b$i), chr(1)))) AS w, freq
         |  FROM $prev)""".stripMargin
    val rounds = (1 to BpeMerges).map(i => round(i, s"w${i - 1}")).mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS w,
       |         CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents)
       |  GROUP BY 1),
       |$rounds""".stripMargin
  }

  val bpeTrainSql: String = {
    val out = (1 to BpeMerges).map(i =>
      s"SELECT $i AS merge_rank, l AS lhs, r AS rhs, l||r AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $trainRoundsSql
       |SELECT merge_rank, lhs, rhs, merged, pair_count FROM (
       |$out)
       |ORDER BY merge_rank""".stripMargin
  }

  /** Oracle for [[bpeApply]]: the training chain re-derives b1..bN, then
    * the corpus representation folds through the same N sentinel-space
    * replaces before the post-merge token census.
    */
  val bpeApplySql: String = {
    def applyRound(i: Int, prev: String): String =
      s"""d$i AS MATERIALIZED (
         |  SELECT doc_id, replace(u,
         |    COALESCE((SELECT ' '||l||' '||r||' ' FROM b$i), chr(1)),
         |    COALESCE((SELECT ' '||l||r||' ' FROM b$i), chr(1))) AS u
         |  FROM $prev)""".stripMargin
    val applies = (1 to BpeMerges).map(i => applyRound(i, s"d${i - 1}")).mkString(",\n")
    s"""WITH $trainRoundsSql,
       |d0 AS MATERIALIZED (
       |  SELECT doc_id,
       |    ' ' || array_to_string(list_transform(
       |      regexp_extract_all(lower(text), '[a-z]+'),
       |      w -> trim(regexp_replace(w, '(.)', '\\1 ', 'g'))), ' | ') || ' ' AS u
       |  FROM documents),
       |$applies
       |SELECT doc_id,
       |  CAST(len(list_filter(string_split(trim(u), ' '),
       |    x -> x <> '|' AND x <> '')) AS BIGINT) AS n_tokens
       |FROM d$BpeMerges ORDER BY doc_id""".stripMargin
  }

  /** Tokenizer fertility report — the standard multilingual tokenizer
    * evaluation (how many subword tokens a word costs per language, and
    * how much text a token carries): the corpus tokenized through the
    * SAME learned merge list as [[bpeApply]] (one training per session
    * via the merges memo), then per-language exact integer ratios —
    * tokens-per-word and chars-per-token in micros (`div` over positive
    * sums ≡ DuckDB `//`). High fertility on a language = the vocabulary
    * underserves it — the report that decides whether a tokenizer is
    * fair across the data mix. Reference scope: the reference's
    * token-count summaries (transform.py:60-96) extended with the
    * public fertility metric (Scao et al. 2022, BLOOM §3.1 — public
    * knowledge).
    *
    * Scale: the merge fold is row-local narrow projections; the only
    * shuffles are training's vocabulary aggregations (memoized per
    * session/dir) and one per-language roll-up of four integer sums.
    */
  def fertility(t: Tables): DataFrame = {
    val merges = learnMergesShared(t)
    val base = t.documents.select(col("doc_id"), col("lang"),
      expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .select(col("lang"),
        size(col("ws")).cast("long").as("n_words"),
        expr("aggregate(ws, CAST(0 AS BIGINT), (a, w) -> a + length(w))")
          .as("n_chars"),
        expr(
          """concat(' ', array_join(transform(ws,
            |  w -> trim(regexp_replace(w, '(.)', '$1 '))), ' | '), ' ')"""
            .stripMargin).as("u"))
    val folded = merges.foldLeft(base) { case (df, (_, l, r, _, _)) =>
      df.withColumn("u", expr(s"replace(u, ' $l $r ', ' $l$r ')"))
    }
    folded.select(col("lang"), col("n_words"), col("n_chars"),
        size(expr(
          "filter(split(trim(u), ' '), x -> x != '|' and x != '')"))
          .cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words"),
        sum(col("n_tokens")).as("tokens"),
        sum(col("n_chars")).as("chars"))
      .where(col("words") > 0 && col("tokens") > 0)
      .select(col("lang"), col("n_docs").cast("long").as("n_docs"),
        col("words").cast("long").as("n_words"),
        col("tokens").cast("long").as("n_tokens"),
        expr("(tokens * 1000000) div words").as("tokens_per_word_micros"),
        expr("(chars * 1000000) div tokens").as("chars_per_token_micros"))
      .orderBy("lang")
  }

  /** Oracle: the training chain + merge fold with lang/word/char
    * counts carried through each round, then the identical per-language
    * integer ratio roll-up.
    */
  val fertilitySql: String = {
    def applyRound(i: Int, prev: String): String =
      s"""e$i AS MATERIALIZED (
         |  SELECT lang, n_words, n_chars, replace(u,
         |    COALESCE((SELECT ' '||l||' '||r||' ' FROM b$i), chr(1)),
         |    COALESCE((SELECT ' '||l||r||' ' FROM b$i), chr(1))) AS u
         |  FROM $prev)""".stripMargin
    val applies = (1 to BpeMerges).map(i => applyRound(i, s"e${i - 1}")).mkString(",\n")
    s"""WITH $trainRoundsSql,
       |e0 AS MATERIALIZED (
       |  SELECT lang,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
       |      AS n_words,
       |    CAST(COALESCE(list_sum(list_transform(
       |      regexp_extract_all(lower(text), '[a-z]+'), w -> len(w))), 0)
       |      AS BIGINT) AS n_chars,
       |    ' ' || array_to_string(list_transform(
       |      regexp_extract_all(lower(text), '[a-z]+'),
       |      w -> trim(regexp_replace(w, '(.)', '\\1 ', 'g'))), ' | ') || ' ' AS u
       |  FROM documents),
       |$applies,
       |per AS (
       |  SELECT lang, n_words, n_chars,
       |    CAST(len(list_filter(string_split(trim(u), ' '),
       |      x -> x <> '|' AND x <> '')) AS BIGINT) AS n_tokens
       |  FROM e$BpeMerges),
       |g AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_words) AS BIGINT) AS words,
       |    CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       |    CAST(SUM(n_chars) AS BIGINT) AS chars
       |  FROM per GROUP BY 1)
       |SELECT lang, n_docs, words AS n_words, tokens AS n_tokens,
       |  (tokens * 1000000) // words AS tokens_per_word_micros,
       |  (chars * 1000000) // tokens AS chars_per_token_micros
       |FROM g WHERE words > 0 AND tokens > 0
       |ORDER BY lang""".stripMargin
  }
}
