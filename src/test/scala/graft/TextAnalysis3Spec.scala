package graft

import graft.operators.TextAnalysis3

class TextAnalysis3Spec extends SparkSpec {
  import spark.implicits._

  test("collocations surfaces a planted phrase above independent pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-colloc").toString
    // "alpha beta" always adjacent (a collocation); filler words mix freely
    val glue = (1 to 8).map(i => s"alpha beta x$i y$i")
    val noise = (1 to 8).map(i => s"x$i common y$i common z$i")
    (glue ++ noise).zipWithIndex
      .map { case (txt, i) => (i.toLong, txt, "en", "s", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis3.collocations(Tables(spark, dir)).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert((top.getString(0), top.getString(1)) == ("alpha", "beta"),
      s"expected the planted phrase on top, got $top")
    // every emitted pair clears the min-count gate
    assert(rows.forall(_.getLong(2) >= TextAnalysis3.MinPair))
  }

  test("collocations on the sf corpus matches an in-memory PMI replay") {
    // same tokenization as the operator: split on ' ' KEEPING empties
    val tokss = sf.documents.select("text").collect()
      .map(_.getString(0).split(" ", -1).toSeq)
    val uni = tokss.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nBig = tokss.map(ts => math.max(ts.size - 1, 0).toLong).sum
    val pairCnt = tokss.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= TextAnalysis3.MinPair)
    val exp = pairCnt.toSeq.map { case ((a, b), np) =>
      val score = math.floor(math.floor(np.toDouble * TextAnalysis3.PmiScale /
        uni(a).toDouble) * nBig.toDouble / uni(b).toDouble).toLong
      (a, b, np, uni(a), uni(b), score)
    }.sortBy { case (a, b, _, _, _, s) => (-s, a, b) }.take(50)
    val got = TextAnalysis3.collocations(sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == exp, s"first diff: ${got.zip(exp).find(p => p._1 != p._2)}")
  }

  test("collocations plan: broadcast marginals, top-k cut, no cartesian") {
    val plan = TextAnalysis3.collocations(sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("wordpiece: whole-vocab corpus keeps 1 piece per short word, splits >6-char words") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wp").toString
    // tiny corpus: every substring is a vocab candidate, so short words
    // are single pieces and the 8-char word splits exactly at the
    // 6-char piece cap: abcdef + gh
    Seq((0L, "xy xy z q", "en", "s", 9L), (1L, "abcdefgh", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis3.wordpiece(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 4L, 4L), (1L, 1L, 2L)), s"got $got")
  }

  test("wordpiece on the sf corpus matches an in-memory seed+greedy replay") {
    val docs = sf.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def wordsOf(text: String): Seq[String] =
      "[a-z]+".r.findAllIn(text.toLowerCase).toSeq.filter(_.length <= 16)
    val wf = docs.flatMap(d => wordsOf(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // substring candidates counted per occurrence position, freq-weighted
    val cnts = wf.toSeq.flatMap { case (w, f) =>
      for (s <- 0 until w.length; e <- s until math.min(s + 6, w.length))
        yield (w.substring(s, e + 1), f)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val top = cnts.toSeq.sortBy { case (p, c) => (-c, p) }.take(200).map(_._1)
    val vocab = (top ++ cnts.keys.filter(_.length == 1)).toSet
    def nPieces(w: String): Long = {
      var pos = 0; var n = 0L
      while (pos < w.length) {
        val l = (6 to 2 by -1).find(k =>
          vocab.contains(w.substring(pos, math.min(pos + k, w.length))))
          .getOrElse(1)
        pos += l; n += 1
      }
      n
    }
    val exp = docs.flatMap { case (id, text) =>
      val ws = wordsOf(text)
      if (ws.isEmpty) None
      else Some((id, ws.size.toLong, ws.map(nPieces).sum))
    }.sortBy(_._1).toSeq
    val got = TextAnalysis3.wordpiece(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exp, s"first diff: ${got.zip(exp).find(p => p._1 != p._2)}")
  }

  test("nb classifier confusion matrix matches the exact integer-weight replay") {
    val docs = sf.documents.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq
    val classes = docs.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1) }.toMap
    val counts = docs.flatMap { case (_, s, t) => toks(t).map(tok => (tok, s)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tots = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val vocab = counts.keys.map(_._1).toSet
    val v = vocab.size.toLong
    def w(tok: String, s: String): Long =
      (counts.getOrElse((tok, s), 0L) + 1L) * 1000000L / (tots(s) + v)
    val confusion = docs
      .filter { case (_, _, t) => toks(t).nonEmpty }
      .map { case (_, actual, t) =>
        val tf = toks(t).groupBy(identity).view.mapValues(_.size.toLong)
        val best = classes.toSeq.map { case (s, sid) =>
          (tf.map { case (tok, f) => f * w(tok, s) }.sum, sid, s)
        }.maxBy { case (score, sid, _) => (score, -sid) }
        (actual, best._3)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.TextAnalysis3.nbClassify(sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == confusion)
  }

  test("nb classifier is diagonal on a planted separable corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nbsep").toString
    // disjoint vocabularies per source -> classification must be perfect
    val docs = (0 until 30).map { i =>
      val src = s"src${i % 3}"
      val words = Seq.fill(12)(s"tok_${i % 3}_${i % 4}")
      (i.toLong, words.mkString(" "), "en", src, 60L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis3.nbClassify(Tables(spark, dir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.forall { case (a, p, _) => a == p },
      s"off-diagonal predictions: ${rows.filter(r => r._1 != r._2).toSeq}")
    assert(rows.map(_._3).sum == 30L)
  }

  test("chunk overlap: windows, stride, tail, and provenance are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    // 100, 40, 35, 5, and 1-token docs pin every boundary case
    Seq(100, 40, 35, 5, 1).zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w$j").mkString(" "), "en", "s", n.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis3.chunkOverlap(Tables(spark, dir))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getInt(5)))
    def chunksOf(id: Long) = rows.filter(_._1 == id).sortBy(_._2)
    // 100 tokens -> starts 0,30,60,90; tail chunk is the short one
    assert(chunksOf(0).map(c => (c._3, c._4)).toSeq ==
      Seq((0, 40), (30, 70), (60, 100), (90, 100)))
    // 40 tokens -> full window at 0 plus the 10-token tail at 30
    assert(chunksOf(1).map(c => (c._3, c._4)).toSeq == Seq((0, 40), (30, 40)))
    // 35 tokens (< window, > stride) -> one full-doc chunk + 5-token tail
    assert(chunksOf(2).map(c => (c._3, c._4)).toSeq == Seq((0, 35), (30, 35)))
    // short docs -> exactly one chunk, never empty
    assert(chunksOf(3).map(c => (c._3, c._4)).toSeq == Seq((0, 5)))
    assert(chunksOf(4).map(c => (c._3, c._4)).toSeq == Seq((0, 1)))
    rows.foreach { case (_, _, st, en, text, nt) =>
      assert(en - st == nt && nt >= 1)
      assert(text.split(" ").length == nt) // text matches the token span
    }
    // consecutive chunks overlap by window - stride tokens
    val c0 = chunksOf(0)
    assert(c0(0)._5.split(" ").drop(30).toSeq == c0(1)._5.split(" ").take(10).toSeq)
    // chunking is row-local: no exchange before the presentation sort
    val plan = graft.operators.TextAnalysis3.chunkOverlap(Tables(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("readability replays the integer Flesch formula from raw text") {
    val texts = sf.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis3.readability(sf).collect()
    assert(rows.length == texts.size)
    rows.take(50).foreach { r =>
      val (id, w, sn, sy, fm, band) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      val txt = texts(id)
      assert(w == txt.split(" ", -1).length)
      assert(sn == math.max(1, "[.!?]+".r.findAllIn(txt).length))
      assert(sy == "[aeiouy]+".r.findAllIn(txt).length)
      assert(fm == 206835L - (1015L * w) / sn - (84600L * sy) / w)
      val expBand =
        if (fm >= 90000) "very_easy" else if (fm >= 70000) "easy"
        else if (fm >= 50000) "medium" else if (fm >= 30000) "hard"
        else "very_hard"
      assert(band == expBand)
    }
  }

  test("ocr artifacts gate flags planted fragmentation, merge junk, and speckle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ocr").toString
    val clean = "the quiet morning light settled over the harbor as fishermen prepared their nets"
    val fragmented = "t h e q u i e t morning light settled over the harbor again today"
    val merged = "tlhe qttrn morning lsrtght settled over the harbor as fishermen prepared"
    val speckled = "the qu#et m*rn@ng li?ht settled %ver the harb§r as f!shermen prepared"
    val docs = Seq((0L, clean), (1L, fragmented), (2L, merged), (3L, speckled))
      .map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis3.ocrArtifacts(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))).toMap
    val (fs0, fc0, fn0, _, k0) = rows(0L)
    assert(k0 && fs0 == 0.0 && fc0 == 0.0 && fn0 == 0.0, s"clean: ${rows(0L)}")
    assert(!rows(1L)._5 && rows(1L)._1 > 0.05, s"fragmented: ${rows(1L)}")
    assert(!rows(2L)._5 && rows(2L)._2 > 0.1, s"merged: ${rows(2L)}")
    assert(!rows(3L)._5 && rows(3L)._3 > 0.05, s"speckled: ${rows(3L)}")
    // score replays the fixed op order on a sample row
    val r1 = rows(1L)
    assert(r1._4 == r1._1 * 0.5 + r1._2 * 0.3 + r1._3 * 0.2)
  }

  test("ocr artifacts gate splits the sf corpus on the single-char signal") {
    val rows = TextAnalysis3.ocrArtifacts(sf).collect()
    assert(rows.length == sf.documents.count())
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)),
      "thresholds must split the corpus")
    // clean synthetic corpus: only the fragmentation signal fires
    rows.foreach { r =>
      assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    }
  }
}
