package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
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
