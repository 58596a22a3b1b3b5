package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Hybrid RRF retrieval on a CONSTRUCTED corpus where the lexical and
  * vector orders provably disagree (lexical relevance rises with doc id,
  * vector closeness falls with it), so the fusion has real work to do.
  * Lives in the operators package to fold the expected fusion from the
  * same arm frames the operator consumes.
  */
class HybridSpec extends graft.SparkSpec {
  import spark.implicits._

  private val Dim = 64

  private def corpus(): graft.Tables = {
    val dir = Files.createTempDirectory("graft-hybrid").toString
    // 40 docs of 40 tokens each (constant dl): doc i holds i copies of
    // the query term "spark" → bm25 strictly INCREASES with doc id.
    // Exception: doc 2 gets 39 copies → lexically top while also
    // vector-close, the doc that must win the fusion.
    def text(i: Int): String = {
      val sparks = if (i == 2) 39 else i
      (Seq.fill(sparks)("spark") ++ Seq.fill(40 - sparks)("xx")).mkString(" ")
    }
    (0 until 40).map(i => (i.toLong, text(i), "en", "s", text(i).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // embeddings: v_i = (1, 0.01·i, 0…) → cosine to the query v_0
    // strictly DECREASES with vec id (opposite of the lexical order)
    (0 until 40).map { i =>
      val v = Array.fill(Dim)(0.0f)
      v(0) = 1.0f; v(1) = 0.01f * i
      (i.toLong, v, i % 3)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    graft.Tables(spark, dir)
  }

  test("hybrid rrf fuses disagreeing arms by the reciprocal-rank formula") {
    val t = corpus()
    // the arm rankings, folded exactly as the operator defines them
    val lexTop = TextAnalysis2.bm25Scored(t)
      .where(col("doc_id") =!= 0).select("doc_id", "bm25").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.take(20).map(_._1)
    val vecTop = Similarity.ivfPqAdc(t).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, d) => (d, id) }.take(20).map(_._1)
    // the construction makes the arms genuinely disagree
    assert(lexTop.head != vecTop.head,
      s"arms agree on top-1 (${lexTop.head}) — corpus construction broken")
    assert(lexTop.toSeq != vecTop.toSeq)
    // doc 2 is in both top lists (lexical #1 by construction)
    assert(lexTop.head == 2L && vecTop.contains(2L))
    val lexRank = lexTop.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val vecRank = vecTop.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val expected = (lexTop ++ vecTop).distinct.map { id =>
      (id,
        lexRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          vecRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = Hybrid.hybridRrf(t).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == expected.toSeq)
    // the both-arms doc beats every single-arm doc: fusion top-1 = doc 2
    assert(got.head._1 == 2L)
    // ranks surface for audit: doc 2's lexical rank is 1
    val row2 = Hybrid.hybridRrf(t).where(col("doc_id") === 2).collect()(0)
    assert(row2.getInt(1) == 1)
  }

  test("two-stage rerank: exact top-10 of the ADC top-40, exact distances bit-equal") {
    val sf = graft.Tables(spark, "/root/testdata/sf0.001")
    // in-memory replay: shortlist = ADC top-40, rerank by exact L2 form
    val adc = Similarity.ivfPqAdc(sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, d) => (d, id) }.take(Hybrid.TwoStageShortlist)
    val vecs = sf.embeddings.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qv = vecs(0L)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    val expected = adc.map { case (id, d) =>
      val v = vecs(id)
      (id, d, dot(v, v) - 2.0 * dot(qv, v) + dot(qv, qv))
    }.sortBy { case (id, _, e) => (e, id) }.take(10)
    val got = Hybrid.twoStageTopK(sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // every reranked hit came from the shortlist
    val shortIds = adc.map(_._1).toSet
    assert(got.forall(g => shortIds.contains(g._1)))
  }

  test("recall report: recalls replay from the tiers' own outputs, bounded and complete") {
    val sf = graft.Tables(spark, "/root/testdata/sf0.001")
    val got = Hybrid.recallReport(sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // complete grid: 3 tiers x 3 ks
    assert(got.map(t => (t._1, t._2)).toSet ==
      (for (t <- Seq("lsh", "ivf_pq", "binary"); k <- Seq(1, 5, 10)) yield (t, k)).toSet)
    got.foreach { case (tier, k, r) =>
      assert(r >= 0.0 && r <= 1.0, s"$tier@$k: $r")
      // recall is a multiple of 1/k (an intersection count over k)
      assert(math.abs(r * k - math.round(r * k)) < 1e-9, s"$tier@$k: $r")
    }
    // replay one tier end-to-end: binary vs exact cosine
    val exact = Similarity.bruteForceTopK(sf).collect().map(_.getLong(0))
    val bin = Similarity.binaryTopK(sf).collect().map(_.getLong(0))
    Seq(1, 5, 10).foreach { k =>
      val expected = bin.take(k).toSet.intersect(exact.take(k).toSet).size.toDouble / k
      val reported = got.find(t => t._1 == "binary" && t._2 == k).get._3
      assert(reported == expected, s"binary@$k: $reported vs $expected")
    }
  }
}
