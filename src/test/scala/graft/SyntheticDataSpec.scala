package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Hand-computable answers over CONSTRUCTED corpora: each test writes
  * its own tiny parquet tables into a temp Tables directory, so the
  * operators are exercised on data the authors control completely —
  * proving both the math and that the library runs on any directory
  * shaped like the contract, not just the driver testdata.
  */
class SyntheticDataSpec extends SparkSpec {
  import spark.implicits._

  private def tempTables(): (Tables, String) = {
    val dir = Files.createTempDirectory("graft-synth").toString
    (Tables(spark, dir), dir)
  }

  test("substring dedup: identical docs fully duplicated, unique doc untouched") {
    val (t, dir) = tempTables()
    val twelve = (1 to 12).map(i => s"w$i").mkString(" ")
    val unique = (1 to 12).map(i => s"u$i").mkString(" ")
    Seq(
      (1L, twelve, "en", "s", twelve.length.toLong),
      (2L, twelve, "en", "s", twelve.length.toLong),
      (3L, unique, "en", "s", unique.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis2.substringDedup(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 12 tokens -> 3 ten-token spans; docs 1,2 share all of them
    assert(rows(1L) == ((3L, 3L, 1.0)))
    assert(rows(2L) == ((3L, 3L, 1.0)))
    assert(rows(3L) == ((3L, 0L, 0.0)))
  }

  test("substring dedup pre-aggregates spans per (doc, gram) before the frequency join") {
    val (t, dir) = tempTables()
    val cycle = (0 until 10).map(i => s"w$i")
    // 200 tokens -> 191 spans but only 10 DISTINCT grams (the cycle's
    // rotations): the skew shape a boilerplate-heavy corpus produces
    val heavy = Seq.fill(20)(cycle).flatten.mkString(" ")
    val once = cycle.mkString(" ")
    Seq((1L, heavy, "en", "s", heavy.length.toLong),
      (2L, once, "en", "s", once.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val df = graft.operators.TextAnalysis2.substringDedup(t)
    val rows = df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc2's single span is rotation 0, shared with doc1's 20 rotation-0
    // spans; doc1's other 171 spans are rotations only doc1 contains
    assert(rows(1L) == ((191L, 20L)))
    assert(rows(2L) == ((1L, 1L)))
    // the frequency join consumes one row per (doc, gram): an Aggregate
    // grouped on (doc_id, g) sits below the join, bounding a hot gram's
    // join partition by distinct containing docs, not occurrences
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = df.queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    assert(joins.exists(_.children.exists(_.collectFirst {
      case a: Aggregate if a.groupingExpressions.size == 2 => a
    }.isDefined)), lp.toString)
  }

  test("source overlap: constructed gram sets give exact pairwise jaccard incl. zero pairs") {
    val (t, dir) = tempTables()
    // srcA: grams {a b c, b c d}  srcB: {b c d, c d e}  srcC: disjoint
    val d1 = "a b c d"      // grams: "a b c", "b c d"
    val d2 = "b c d e"      // grams: "b c d", "c d e"
    val d3 = "x y z w"      // grams: "x y z", "y z w"
    Seq(
      (1L, d1, "en", "srcA", d1.length.toLong),
      (2L, d2, "en", "srcB", d2.length.toLong),
      (3L, d3, "en", "srcC", d3.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis2.sourceOverlap(t).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // A={abc,bcd} B={bcd,cde}: common {bcd}=1, union 3 -> 1/3
    assert(rows(("srcA", "srcB")) == ((2L, 2L, 1L, 1.0 / 3.0)))
    // disjoint pairs present with jaccard 0
    assert(rows(("srcA", "srcC")) == ((2L, 2L, 0L, 0.0)))
    assert(rows(("srcB", "srcC")) == ((2L, 2L, 0L, 0.0)))
    assert(rows.size == 3)
  }

  test("skyline: constructed frontier is exactly the non-dominated points") {
    val (t, dir) = tempTables()
    // (price, size): frontier = (1,9), (3,4), (8,1); dominated: rest
    Seq(
      (1L, "a", "B", "T", 9, 1.0),
      (2L, "b", "B", "T", 4, 3.0),
      (3L, "c", "B", "T", 1, 8.0),
      (4L, "d", "B", "T", 9, 2.0),  // dominated by (1,9)? price 2>1, size equal -> dominated
      (5L, "e", "B", "T", 5, 3.0),  // dominated by (3,4)
      (6L, "f", "B", "T", 2, 9.0))  // dominated by (8,1)? no: price 9>8? it IS (9,2)... see below
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    // dominance recount in plain Scala
    val pts = Seq((1L, 1.0, 9), (2L, 3.0, 4), (3L, 8.0, 1), (4L, 2.0, 9), (5L, 3.0, 5), (6L, 9.0, 2))
    val expect = pts.filter { case (_, pr, sz) =>
      !pts.exists { case (_, pr2, sz2) => pr2 <= pr && sz2 <= sz && (pr2 < pr || sz2 < sz) }
    }.map(_._1).sorted
    val got = graft.operators.Relational6.skyline(t).collect().map(_.getLong(0))
    assert(got.sameElements(expect), s"got ${got.toSeq}, want $expect")
  }

  test("balanced classes: skewed labels all cut to the smallest class") {
    val (t, dir) = tempTables()
    val rows =
      (1 to 5).map(i => (i.toLong, Seq(0.1f), 0)) ++
        (6 to 8).map(i => (i.toLong, Seq(0.2f), 1)) ++
        (9 to 15).map(i => (i.toLong, Seq(0.3f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = graft.operators.Sampling.balancedClasses(t).collect()
    val perLabel = out.groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(perLabel == Map(0 -> 3, 1 -> 3, 2 -> 3))
  }

  test("knn join: orthogonal corners rank neighbours by exact cosine") {
    val (t, dir) = tempTables()
    // unit vectors: 0 and 1 nearly parallel, 2 orthogonal, 3 anti-aligned with 2
    Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.0f, 1.0f), 1),
      (3L, Seq(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.knnJoin(t).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    assert(got(0L) == Seq(1L, 3L, 2L)) // cos(0,1) max; 3 = (0.1,0.9) beats pure y
    assert(got(2L) == Seq(3L, 1L, 0L))
  }

  test("gopher gate keeps a clean doc and rejects a degenerate one") {
    val (t, dir) = tempTables()
    val good = "the a of and in " + (1 to 45).map(i => s"token$i").mkString(" ")
    val bad = "spam " * 40 // one dominant token, no stopwords
    Seq(
      (1L, good, "en", "s", good.length.toLong),
      (2L, bad.trim, "en", "s", bad.trim.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val keep = graft.operators.TextAnalysis2.gopherQuality(t).collect()
      .map(r => r.getLong(0) -> r.getBoolean(11)).toMap
    assert(keep(1L), "clean doc should pass the gate")
    assert(!keep(2L), "degenerate doc should fail the gate")
  }
}
