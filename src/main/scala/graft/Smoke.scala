package graft

/** Dev-only smoke: print schemas (notably the ns-timestamp events table). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val t = Tables(spark, "/root/testdata/sf0.001")
    t.events.printSchema()
    t.events.show(3, truncate = false)
    t.embeddings.printSchema()
    spark.stop()
  }
}
