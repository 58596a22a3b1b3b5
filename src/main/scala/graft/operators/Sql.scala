package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame

/** SQL interface: the engine's tables exposed as views so users can run
  * plain Spark SQL (with the graft-native functions registered by
  * [[graft.plans.GraftExtensions]]) instead of the Column API.
  */
object Sql {

  private val TableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Session conf key recording which data directory the views currently
    * point at — registration is idempotent per (session, dir), so
    * repeated queries skip the ten-view catalog round-trip, while a
    * Tables over a DIFFERENT dir still swaps the views instead of
    * silently serving stale data.
    */
  private val RegisteredDirKey = "graft.sql.registeredViewsDir"

  /** Register every test-schema table as a temp view named like the
    * underlying table (no-op when this session already has views for
    * `t.dir`).
    */
  def registerViews(t: Tables): Unit = {
    if (!t.spark.conf.getOption(RegisteredDirKey).contains(t.dir)) {
      t.region.createOrReplaceTempView("region")
      t.nation.createOrReplaceTempView("nation")
      t.customer.createOrReplaceTempView("customer")
      t.supplier.createOrReplaceTempView("supplier")
      t.part.createOrReplaceTempView("part")
      t.orders.createOrReplaceTempView("orders")
      t.lineitem.createOrReplaceTempView("lineitem")
      t.events.createOrReplaceTempView("events")
      t.documents.createOrReplaceTempView("documents")
      t.embeddings.createOrReplaceTempView("embeddings")
      t.spark.conf.set(RegisteredDirKey, t.dir)
    }
  }

  /** A query authored purely in SQL against the registered views — same
    * exactness rules as the Column-API operators.
    */
  def sqlInterface(t: Tables): DataFrame = {
    registerViews(t)
    t.spark.sql(
      """SELECT n_name,
        | COUNT(DISTINCT c_custkey) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin)
  }

  val sqlInterfaceSql: String =
    """SELECT n_name,
      | COUNT(DISTINCT c_custkey) AS n_customers,
      | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin
}
