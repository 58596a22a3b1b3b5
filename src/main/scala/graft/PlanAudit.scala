package graft

/** Dev tool: print formatted physical plans for plan-shape review. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val t = Tables(spark, args.headOption.getOrElse("/root/testdata/sf0.01"))
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names.contains(name)) {
        println(s"\n########## $name ##########")
        fn(spark, args.headOption.getOrElse("/root/testdata/sf0.01")).explain("formatted")
      }
    }
    spark.stop()
  }
}
