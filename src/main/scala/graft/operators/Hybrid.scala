package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
  * vector (IVF-PQ ADC) rankings — the two-tower retrieval stack LLM
  * data pipelines actually ship, where a text query form and an
  * embedded query form each rank the corpus and the fused list beats
  * either alone.
  *
  * RRF (Cormack/Clarke/Buettcher 2009): score(d) = Σ_arms 1/(k + rank)
  * with k = [[RrfK]] = 60, over each arm's top [[RrfDepth]] candidates.
  * Rank-based fusion needs NO score normalization across the two
  * incomparable score spaces — which is exactly why production hybrid
  * search defaults to it.
  *
  * Scale shape: each arm ends in a distributed top-[[RrfDepth]] cut
  * (TakeOrderedAndProject), so the only global windows run over ≤
  * [[RrfDepth]] surviving rows; the fusion join is bounded at
  * 2·[[RrfDepth]] rows however large the corpus. The lexical arm reuses
  * [[TextAnalysis2.bm25Scored]] verbatim and the vector arm
  * [[Similarity.ivfPqAdc]] verbatim, so the hybrid ranking can never
  * drift from the two standalone operators it fuses.
  *
  * The query: [[TextAnalysis2.bm25]]'s fixed term set on the lexical
  * side, vec_id 0's embedding on the vector side (the two forms of one
  * query); doc 0 itself is excluded from both arms.
  */
object Hybrid {

  private[operators] val RrfK = 60
  private[operators] val RrfDepth = 20
  private val TopN = 10

  def hybridRrf(t: Tables): DataFrame = {
    // lexical arm: distributed top-RrfDepth cut FIRST, then ranks over
    // the surviving handful only (never a global window over raw docs)
    val lex = TextAnalysis2.bm25Scored(t)
      .where(col("doc_id") =!= 0)
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(RrfDepth)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .as("lex_rank"))
    // vector arm: the shared IVF-PQ ADC scores, same cut + rank shape
    // (ivfPqAdc already excludes vec 0); vec_id ≡ doc_id in this corpus
    val vec = Similarity.ivfPqAdc(t)
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(RrfDepth)
      .select(col("vec_id").as("doc_id"),
        row_number().over(Window.orderBy(col("adc_dist"), col("vec_id")))
          .as("vec_rank"))
    // fusion: a doc absent from an arm contributes 0 from it
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        (coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(TopN)
  }

  /** Oracle: the two arms as ranked CTEs — the BM25 scored relation and
    * the full IVF-PQ replay chain, both shared verbatim with their
    * standalone oracles — fused by the same RRF formula (division
    * constants routed through CAST(... AS DOUBLE) so DuckDB's decimal
    * literal typing can't double-round them).
    */
  val hybridRrfSql: String =
    s"""WITH ${TextAnalysis2.bm25StatsCte},
       |bscore AS (${TextAnalysis2.bm25ScoredSql}),
       |lex AS (
       | SELECT doc_id,
       |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank
       | FROM bscore WHERE doc_id <> 0
       | QUALIFY row_number() OVER (ORDER BY bm25 DESC, doc_id) <= $RrfDepth),
       |${Similarity.ivfPqAdcCte},
       |vec AS (
       | SELECT vec_id AS doc_id,
       |  CAST(row_number() OVER (ORDER BY adc_dist, vec_id) AS INT) AS vec_rank
       | FROM adc
       | QUALIFY row_number() OVER (ORDER BY adc_dist, vec_id) <= $RrfDepth)
       |SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank,
       | COALESCE(CAST(1 AS DOUBLE) / ($RrfK + lex_rank), CAST(0 AS DOUBLE))
       |  + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + vec_rank), CAST(0 AS DOUBLE)) AS rrf
       |FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
       |ORDER BY rrf DESC, doc_id
       |LIMIT $TopN""".stripMargin

  private[operators] val TwoStageShortlist = 40

  /** Two-stage retrieval — retrieve-then-rerank, the other production
    * ANN composition next to [[hybridRrf]]: the compressed IVF-PQ index
    * proposes a [[TwoStageShortlist]]-deep candidate list (cheap ADC
    * scores over 4-bit codes), then ONLY those candidates are re-scored
    * against their full-precision vectors and the top [[TopN]] by exact
    * distance ship. This is how FAISS/vector-DB deployments recover
    * quantization loss without ever scanning full vectors corpus-wide.
    *
    * Scale shape: stage 1 ends in a distributed top-[[TwoStageShortlist]]
    * cut (TakeOrderedAndProject over the ADC scores); stage 2 joins that
    * bounded list back to the vector table BROADCAST (40 rows however
    * large the corpus), so full-precision reads are candidate-count, not
    * corpus-count. Exact distances use the shared codegen
    * [[graft.functions.DotProduct]] fold — identical op order to the
    * oracle's list_dot_product.
    */
  def twoStageTopK(t: Tables): DataFrame = {
    val short = Similarity.ivfPqAdc(t)
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(TwoStageShortlist)
    val vecs = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = vecs.where(col("vec_id") === 0).select(col("v").as("qv"))
    import graft.functions.DotProduct
    vecs.join(broadcast(short), Seq("vec_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("adc_dist"),
        (DotProduct(col("v"), col("v")) -
          lit(2.0) * DotProduct(col("qv"), col("v")) +
          DotProduct(col("qv"), col("qv"))).as("exact_dist"))
      .orderBy(col("exact_dist"), col("vec_id"))
      .limit(TopN)
  }

  private val RecallKs = Seq(1, 5, 10)

  /** Recall@k evaluation of the ANN ladder — the index-quality harness
    * a vector platform runs before shipping an index config: each
    * approximate tier's top-10 is scored against the EXACT top-10 under
    * that tier's own metric (LSH and binary approximate the angular
    * ranking → exact-cosine baseline; IVF-PQ's ADC approximates
    * squared-L2 → exact-L2 baseline), at k = 1/5/10. Every input is an
    * already-green deterministic operator, so "approximate" recall is
    * still hash-exact and regression-diffable round over round.
    *
    * All rankings are bounded 10-row frames; the joins and the k
    * expansion are driver-free constant-size work on top of the tiers'
    * own scans.
    */
  def recallReport(t: Tables): DataFrame = {
    def ranked(df: DataFrame, order: Seq[Column]): DataFrame =
      df.select(col("vec_id"),
        row_number().over(Window.orderBy(order: _*)).as("rank"))
    val exactCos = ranked(
      Similarity.bruteForceTopK(t), Seq(col("cosine").desc, col("vec_id")))
    val vecs = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = vecs.where(col("vec_id") === 0).select(col("v").as("qv"))
    import graft.functions.DotProduct
    val exactL2 = ranked(
      vecs.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"),
          (DotProduct(col("v"), col("v")) -
            lit(2.0) * DotProduct(col("qv"), col("v")) +
            DotProduct(col("qv"), col("qv"))).as("l2"))
        .orderBy(col("l2"), col("vec_id")).limit(10),
      Seq(col("l2"), col("vec_id")))
    val tiers = Seq(
      ("lsh", ranked(Similarity.lshTopK(t),
        Seq(col("cosine").desc, col("vec_id"))), exactCos),
      ("ivf_pq", ranked(Similarity.ivfPqTopK(t),
        Seq(col("adc_dist"), col("vec_id"))), exactL2),
      ("binary", ranked(Similarity.binaryTopK(t),
        Seq(col("hamming"), col("vec_id"))), exactCos))
    val spark = t.spark
    import spark.implicits._
    val ks = RecallKs.toDF("k")
    tiers.map { case (name, approx, exact) =>
      val j = approx.select(col("vec_id"), col("rank").as("ar"))
        .join(exact.select(col("vec_id"), col("rank").as("er")), Seq("vec_id"))
      ks.join(j, lit(true), "left")
        .groupBy("k")
        .agg((sum(when(col("ar") <= col("k") && col("er") <= col("k"), 1)
          .otherwise(0)).cast("double") / col("k")).as("recall"))
        .select(lit(name).as("tier"), col("k"), col("recall"))
    }.reduce(_ union _)
      .orderBy("tier", "k")
  }

  /** Oracle: the tiers' own CTE replays (shared IVF-PQ chain, plane
    * literals via bucketSqlExpr, the hamming fold) each ranked and
    * intersected with its exact baseline at the same ks.
    */
  val recallReportSql: String = {
    val probeList = ("qb" +: (0 until Similarity.NumPlanes)
      .map(i => s"xor(qb, ${1 << i})")).mkString(", ")
    def recallCte(name: String, approx: String, exact: String): String =
      s"""SELECT '$name' AS tier, ks.k,
         | CAST(SUM(CASE WHEN j.ar <= ks.k AND j.er <= ks.k THEN 1 ELSE 0 END)
         |   AS DOUBLE) / ks.k AS recall
         |FROM ks LEFT JOIN (
         |  SELECT a.vec_id, a.rank AS ar, x.rank AS er
         |  FROM $approx a JOIN $exact x USING (vec_id)) j ON TRUE
         |GROUP BY ks.k""".stripMargin
    s"""WITH ${Similarity.ivfPqAdcCte},
       |ks AS (SELECT unnest([1, 5, 10]) AS k),
       |cosr AS (
       | SELECT e.vec_id,
       |  list_dot_product(e.v, q.qv) /
       |    (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))
       |   AS cosine
       | FROM e, q WHERE e.vec_id <> 0),
       |excos AS (
       | SELECT vec_id, CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
       | FROM cosr QUALIFY rank <= 10),
       |l2r AS (
       | SELECT e.vec_id,
       |  list_dot_product(e.v, e.v) - 2 * list_dot_product(q.qv, e.v)
       |    + list_dot_product(q.qv, q.qv) AS l2
       | FROM e, q WHERE e.vec_id <> 0),
       |exl2 AS (
       | SELECT vec_id, CAST(row_number() OVER (ORDER BY l2, vec_id) AS INT) AS rank
       | FROM l2r QUALIFY rank <= 10),
       |lshb AS (SELECT vec_id, v, ${Similarity.bucketSqlExpr} AS bucket FROM e),
       |lq AS (SELECT v AS qv, bucket AS qb FROM lshb WHERE vec_id = 0),
       |lprobes AS (SELECT qv, unnest([$probeList]) AS probe FROM lq),
       |lshr AS (
       | SELECT b.vec_id,
       |  list_dot_product(b.v, p.qv) /
       |    (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(p.qv, p.qv)))
       |   AS cosine
       | FROM lshb b JOIN lprobes p ON b.bucket = p.probe
       | WHERE b.vec_id <> 0),
       |lsh10 AS (
       | SELECT vec_id, CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
       | FROM lshr QUALIFY rank <= 10),
       |pq10 AS (
       | SELECT vec_id, CAST(row_number() OVER (ORDER BY adc_dist, vec_id) AS INT) AS rank
       | FROM adc QUALIFY rank <= 10),
       |binr AS (
       | SELECT e.vec_id,
       |  CAST(list_sum(list_transform(range(1, len(e.v) + 1),
       |    i -> CASE WHEN (e.v[i] > 0.0) <> (q.qv[i] > 0.0) THEN 1 ELSE 0 END))
       |   AS INT) AS hamming
       | FROM e, q WHERE e.vec_id <> 0),
       |bin10 AS (
       | SELECT vec_id, CAST(row_number() OVER (ORDER BY hamming, vec_id) AS INT) AS rank
       | FROM binr QUALIFY rank <= 10)
       |SELECT tier, CAST(k AS INT) AS k, recall FROM (
       |${recallCte("lsh", "lsh10", "excos")}
       |UNION ALL
       |${recallCte("ivf_pq", "pq10", "exl2")}
       |UNION ALL
       |${recallCte("binary", "bin10", "excos")})
       |ORDER BY tier, k""".stripMargin
  }

  /** Oracle: the shared IVF-PQ CTE chain proposes, the full-precision
    * relation `e` re-scores with the identical dot-product expression.
    */
  val twoStageTopKSql: String =
    s"""WITH ${Similarity.ivfPqAdcCte},
       |short AS (
       | SELECT vec_id, adc_dist FROM adc
       | ORDER BY adc_dist, vec_id LIMIT $TwoStageShortlist),
       |qq AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       |SELECT s.vec_id, s.adc_dist,
       | list_dot_product(v, v) - 2 * list_dot_product(qv, v)
       |   + list_dot_product(qv, qv) AS exact_dist
       |FROM short s JOIN e USING (vec_id) CROSS JOIN qq
       |ORDER BY exact_dist, vec_id
       |LIMIT $TopN""".stripMargin
}
