package graft

import graft.operators.{Similarity, Sql}

class SqlSpec extends SparkSpec {

  test("view registration is idempotent per dir and swaps on a new dir") {
    Sql.registerViews(sf)
    // poison one view; a same-dir re-registration must be a no-op and
    // NOT repair it (that's what makes repeated sql queries cheap)
    spark.sql("SELECT 1 AS marker").createOrReplaceTempView("nation")
    Sql.registerViews(sf)
    assert(spark.table("nation").columns.sameElements(Array("marker")))
    // a Tables over a DIFFERENT dir must swap all views — stale data
    // would be a silent correctness bug
    Sql.registerViews(Tables(spark, "/root/testdata/sf0.01"))
    assert(spark.table("nation").columns.contains("n_name"))
    // leave the spec session pointing back at the spec dataset
    Sql.registerViews(sf)
    assert(spark.table("nation").columns.contains("n_name"))
  }

  test("ivf topk and kmeans release their training caches") {
    spark.catalog.clearCache()
    Similarity.ivfTopK(sf).collect()
    Similarity.kmeansClusters(sf).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "training caches must be unpersisted before the operator returns")
  }
}
