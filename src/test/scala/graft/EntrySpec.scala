package graft

class EntrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registered query analyzes against the test schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, dir).schema // analysis only — resolves plan
      assert(schema.fields.nonEmpty, s"$name has an empty schema")
    }
  }

  test("every oracle key has a matching query key") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracle keys: ${ok diff qk}")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("a representative sample of queries executes end-to-end at sf0.001") {
    val sample = Seq("q1_pricing_summary", "q5_local_supplier", "q_asof_join",
      "dedup_minhash_lsh", "ann_bruteforce_topk", "text_quality",
      "etl_fact_sales", "q_session_window", "q_topk_heap", "dedup_clusters")
    sample.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
