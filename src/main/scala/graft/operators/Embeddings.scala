package graft.operators

import graft.Tables
import graft.functions.DotProduct
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-column utilities beyond search: normalization and exact
  * centroid aggregation — the preprocessing steps an embedding-dedup /
  * clustering pipeline runs before LSH or IVF.
  */
object Embeddings {

  /** Unit-normalize each vector (L2); carries the norm for inspection.
    * Element math mirrors the oracle exactly (x / sqrt(dot(v,v))).
    * Output is the exploded (vec_id, pos, x, norm, u) form: doubles stay
    * doubles (bitwise-comparable across engines) instead of going through
    * engine-specific array/string formatting.
    */
  def normalize(t: Tables): DataFrame =
    t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(DotProduct(col("v"), col("v"))))
      .select(col("vec_id"), col("norm"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x"), col("norm"),
        (col("x") / col("norm")).as("u"))
      .orderBy("vec_id", "pos")

  val normalizeSql: String =
    """SELECT vec_id, CAST(pos AS INT) AS pos, x,
      | sqrt(list_dot_product(v, v)) AS norm,
      | x / sqrt(list_dot_product(v, v)) AS u
      |FROM (
      | SELECT vec_id, v, unnest(range(len(v))) AS pos, unnest(v) AS x
      | FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))
      |ORDER BY vec_id, pos""".stripMargin

  /** Exact per-label centroids: element-wise mean computed through
    * DECIMAL sums (floats expand exactly into decimal(38,30) at this
    * magnitude), so the result is partition-order independent and
    * engine-portable — the same trick [[graft.functions.Exact]] uses for
    * money, applied to vector math. At scale this is one partial-agg
    * shuffle keyed by (label, dim).
    */
  def centroids(t: Tables): DataFrame =
    t.embeddings
      .select(col("label"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(
        // decimal sum → order-independent; the final 12-decimal rounding
        // absorbs the engines' differing double→decimal conversion paths
        // (shortest-string vs binary expansion), and decimal(24,12)→double
        // is correctly rounded in both (unscaled value < 2^53)
        (sum(col("x").cast(DecimalType(38, 30))).cast("double") / count(lit(1)))
          .cast(DecimalType(24, 12)).cast("double").as("m"),
        count(lit(1)).as("n_vecs"))
      .orderBy("label", "pos")

  val centroidsSql: String =
    """SELECT label, CAST(pos AS INT) AS pos,
      | CAST(CAST(CAST(SUM(CAST(x AS DECIMAL(38,30))) AS DOUBLE) / COUNT(*)
      |   AS DECIMAL(24,12)) AS DOUBLE) AS m,
      | CAST(COUNT(*) AS BIGINT) AS n_vecs
      |FROM (
      | SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS x
      | FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings))
      |GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin
}
