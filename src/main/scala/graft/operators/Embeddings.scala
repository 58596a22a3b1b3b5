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
    */
  def normalize(t: Tables): DataFrame =
    t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(DotProduct(col("v"), col("v"))))
      .withColumn("unit", expr("transform(v, x -> x / norm)"))
      .select("vec_id", "norm", "unit")
      .orderBy("vec_id")

  val normalizeSql: String =
    """SELECT vec_id,
      | sqrt(list_dot_product(v, v)) AS norm,
      | list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS unit
      |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |ORDER BY vec_id""".stripMargin

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
      .agg((sum(col("x").cast(DecimalType(38, 30))).cast("double") / count(lit(1)))
        .as("m"))
      .groupBy("label")
      .agg(
        expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("centroid"),
        count(lit(1)).as("dims"))
      .orderBy("label")

  val centroidsSql: String =
    """SELECT label,
      | list(m ORDER BY pos) AS centroid,
      | CAST(COUNT(*) AS BIGINT) AS dims
      |FROM (
      | SELECT label, pos,
      |  CAST(SUM(CAST(x AS DECIMAL(38,30))) AS DOUBLE) / COUNT(*) AS m
      | FROM (
      |  SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS x
      |  FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings))
      | GROUP BY label, pos)
      |GROUP BY label
      |ORDER BY label""".stripMargin
}
