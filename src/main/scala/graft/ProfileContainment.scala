package graft

import org.apache.spark.sql.functions._

/** Dev tool (not part of the contract): sizes each stage of the
  * dedup_containment candidate pipeline — posting rows, prefix rows,
  * raw equi-join matches, positional-filter survivors, distinct pairs —
  * so the corpus²/vocab term can be attributed before tuning the
  * blocking (r13 VERDICT item 1).
  */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/gen/sf1")
    val spark = GraftSession.builder("local[32]", 32)
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val g = functions.Shingles.gramsOf(docs).localCheckpoint(true)
    val ex = g.select(col("doc_id"), explode(col("grams")).as("gs"))
      .select(col("doc_id"), xxhash64(col("gs")).as("gram"))
    val gramDf = ex.groupBy("gram").agg(count(lit(1)).as("df"))
    val posted = ex.join(gramDf, Seq("gram"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("gram")))).as("rg"))
      .select(col("doc_id"), size(col("rg")).as("sz"),
        posexplode(col("rg")).as(Seq("pos", "pg")))
      .select(col("doc_id"), col("sz"), col("pg.gram").as("gram"), col("pos"))
      .localCheckpoint(true)
    println(s"docs=${docs.count}  postings=${posted.count}")
    println("doc sz: " + posted.groupBy("doc_id").agg(first("sz").as("sz"))
      .agg(min("sz"), expr("percentile(sz, 0.5)"), max("sz")).collect().mkString)
    println("gram df: " + gramDf
      .agg(count(lit(1)).as("vocab"), max("df"),
        expr("percentile(df, 0.99)")).collect().mkString)
    val aPref = posted.where(col("pos") <
        (col("sz") - ceil(lit(0.8) * col("sz")) + 1).cast("int"))
      .select(col("doc_id").as("a_id"), col("sz").as("a_sz"),
        col("gram"), col("pos").as("a_pos"))
    println(s"prefix rows=${aPref.count}")
    val bAll = posted.select(col("doc_id").as("b_id"), col("sz").as("b_sz"),
      col("gram"), col("pos").as("b_pos"))
    val alpha = ceil(lit(0.8) * col("a_sz"))
    val joined = aPref.join(bAll, Seq("gram")).where(col("a_id") =!= col("b_id"))
    println(s"raw join rows=${joined.count}")
    val posFiltered = joined
      .where((col("b_sz") - col("b_pos")) >= alpha &&
        (col("a_sz") - col("a_pos")) >= alpha)
    println(s"pos-filtered rows=${posFiltered.count}")
    println(s"distinct pairs=${posFiltered.select("a_id", "b_id").distinct.count}")
    // which prefix grams drive the raw join volume
    println("top joint grams (prefdf*df):")
    val prefDf = aPref.groupBy("gram").agg(count(lit(1)).as("prefdf"))
    prefDf.join(gramDf, Seq("gram"))
      .withColumn("vol", col("prefdf") * col("df"))
      .orderBy(desc("vol")).limit(10).collect()
      .foreach(r => println("  " + r))
    spark.stop()
  }
}
// appended: count the TRUE output at a dir: run the real operator
object ProfileContainmentOut {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/gen/sf1")
    val spark = GraftSession.builder("local[32]", 32)
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.queries("dedup_containment")(spark, sfDir).count()
    println(s"TRUE containment pairs: $n")
    spark.stop()
  }
}
