package graft

import graft.operators.TextAnalysis2

class TextAnalysis2Spec extends SparkSpec {

  private def tokensOf(text: String): Array[String] = text.split(" ")

  test("substring dedup marks planted near-dup spans and nothing on unique docs") {
    val rows = TextAnalysis2.substringDedup(sf).collect()
    assert(rows.length == sf.documents.count())
    rows.foreach { r =>
      val spans = r.getLong(1); val dup = r.getLong(2); val frac = r.getDouble(3)
      assert(dup >= 0 && dup <= spans)
      assert(frac >= 0.0 && frac <= 1.0)
      if (spans > 0) assert(math.abs(frac - dup.toDouble / spans) == 0.0)
    }
    // the corpus plants near-duplicates, so duplicated spans must exist,
    // and docs with fully unique content must exist too
    assert(rows.exists(_.getLong(2) > 0))
    assert(rows.exists(r => r.getLong(1) > 0 && r.getLong(2) == 0))
  }

  test("span dedup stitches maximal spans at arbitrary alignments and rewrites text") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-span").toString
    // a 14-token passage shared by docs 0 and 1 at DIFFERENT offsets
    // (alignment 3 vs 0 — the case fixed-chunk dedup misses), unique
    // padding everywhere else, and a fully unique doc 2
    val dup = (0 until 14).map(i => s"dup$i").mkString(" ")
    def pad(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val d0 = s"${pad("a", 3)} $dup ${pad("b", 5)}"
    val d1 = s"$dup ${pad("c", 7)}"
    val d2 = pad("u", 30)
    val docs = Seq((0L, d0, "en", "s", d0.length.toLong),
      (1L, d1, "en", "s", d1.length.toLong),
      (2L, d2, "en", "s", d2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis2.spanDedup(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4), r.getString(5)))).toMap
    // doc 0: the dup passage occupies 1-based tokens 4..17 — ONE maximal
    // span at its true boundaries, not 5 overlapping 10-gram reports
    val (s0, t0, _, sp0, ct0) = rows(0L)
    assert(s0 == 1L && t0 == 14L && sp0 == "4-17", s"doc0: ${rows(0L)}")
    assert(ct0 == s"${pad("a", 3)} ${pad("b", 5)}", s"doc0 rewrite: $ct0")
    // doc 1: same passage at offset 0 → span 1-14
    val (s1, t1, _, sp1, ct1) = rows(1L)
    assert(s1 == 1L && t1 == 14L && sp1 == "1-14", s"doc1: ${rows(1L)}")
    assert(ct1 == pad("c", 7), s"doc1 rewrite: $ct1")
    // doc 2: untouched
    assert(rows(2L) == ((0L, 0L, 0.0, "", d2)), s"doc2: ${rows(2L)}")
  }

  test("span dedup on the corpus: stats are consistent and both outcomes occur") {
    val rows = TextAnalysis2.spanDedup(sf).collect()
    assert(rows.length == sf.documents.count())
    val nTok = sf.documents.collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1)).length).toMap
    rows.foreach { r =>
      val (id, ns, nd, frac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nd >= 0 && nd <= nTok(id))
      assert(frac == nd.toDouble / nTok(id))
      // every maximal span is at least one gram long
      if (ns > 0) assert(nd >= 10 * ns - 9 * (ns - 1) || nd >= 10,
        s"doc $id: $ns spans but only $nd tokens")
      // span inventory parses and its lengths sum to the covered count
      val spans = r.getString(4)
      if (ns == 0) assert(spans.isEmpty)
      else {
        val parts = spans.split(",").map { s =>
          val Array(a, b) = s.split("-").map(_.toInt); (a, b)
        }
        assert(parts.length == ns)
        assert(parts.map { case (a, b) => b - a + 1 }.sum.toLong == nd)
        parts.foreach { case (a, b) => assert(a >= 1 && b >= a + 9) }
      }
      // rewrite drops exactly the covered tokens
      val kept = r.getString(5)
      val keptLen = if (kept.isEmpty) 0 else kept.split(" ").length
      assert(keptLen == nTok(id) - nd, s"doc $id rewrite length")
    }
    assert(rows.exists(_.getLong(1) > 0) && rows.exists(_.getLong(1) == 0))
  }

  test("substring dedup span counts equal max(0, n_tokens - 9)") {
    val expected = sf.documents.collect()
      .map(r => r.getLong(0) -> math.max(0, tokensOf(r.getString(1)).length - 9).toLong)
      .toMap
    TextAnalysis2.substringDedup(sf).collect().foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)))
    }
  }

  test("gopher quality flags match their measured ratios and split the corpus") {
    val rows = TextAnalysis2.gopherQuality(sf).collect()
    rows.foreach { r =>
      val n = r.getInt(1); val mwl = r.getDouble(2); val stop = r.getInt(3)
      val df = r.getDouble(4); val top = r.getDouble(5)
      assert(r.getBoolean(6) == (n >= 30 && n <= 100000))
      assert(r.getBoolean(7) == (mwl >= 3.0 && mwl <= 10.0))
      assert(r.getBoolean(8) == (stop >= 2))
      assert(r.getBoolean(9) == (df >= 0.45))
      assert(r.getBoolean(10) == (top <= 0.15))
      assert(r.getBoolean(11) ==
        (r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8) &&
          r.getBoolean(9) && r.getBoolean(10)))
    }
    // every rule must actually separate documents at this corpus's
    // distributions (a constant flag tests nothing)
    Seq(6, 8, 9, 10).foreach { i =>
      assert(rows.exists(_.getBoolean(i)) && rows.exists(!_.getBoolean(i)), s"flag $i constant")
    }
    assert(rows.exists(_.getBoolean(11)) && rows.exists(!_.getBoolean(11)))
  }

  test("diversity stats agree with a by-hand recount") {
    val byId = TextAnalysis2.diversity(sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    sf.documents.collect().take(20).foreach { d =>
      val toks = tokensOf(d.getString(1))
      val n = toks.length
      val counts = toks.groupBy(identity).view.mapValues(_.length).values.toSeq
      val r = byId(d.getLong(0))
      assert(r.getInt(1) == n)
      assert(r.getDouble(2) == counts.map(c => c.toLong * c).sum.toDouble / (n.toLong * n))
      assert(r.getDouble(3) == counts.length.toDouble / n)
      assert(r.getDouble(4) == counts.count(_ == 1).toDouble / n)
    }
  }

  test("bm25 is zero iff no query term appears, and rises with tf at fixed dl") {
    val rows = TextAnalysis2.bm25(sf).collect()
    rows.foreach { r =>
      val noTerms = (2 to 4).forall(r.getInt(_) == 0)
      assert((r.getDouble(1) == 0.0) == noTerms)
      assert(r.getDouble(1) >= 0.0)
    }
    assert(rows.exists(_.getDouble(1) > 0.0))
  }

  test("inverted index caps postings at 10 and keeps df/cf consistent") {
    val rows = TextAnalysis2.invertedIndex(sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1); val cf = r.getLong(2)
      val postings = r.getString(3).split(",").map(_.toLong)
      assert(cf >= df && df >= 1)
      assert(postings.length == math.min(df, 10L))
      assert(postings.sameElements(postings.sorted), "postings not ascending")
    }
    // terms are emitted in sorted order
    val terms = rows.map(_.getString(0))
    assert(terms.sameElements(terms.sorted))
  }

  test("inverted index postings use the TopKPerKey heap plan") {
    val plan = TextAnalysis2.invertedIndex(sf).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
  }

  test("substring dedup shuffles hashed longs, no UDF, no cartesian") {
    val plan = TextAnalysis2.substringDedup(sf).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
    // the span hash column crossing the gram aggregation is a bigint
    assert(plan.contains("xxhash64"), plan)
  }

  test("bm25 broadcasts the one-row corpus stats, never shuffles the scan") {
    val plan = TextAnalysis2.bm25(sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("gopher gate and diversity are single-scan projections (no shuffle before sort)") {
    Seq(
      TextAnalysis2.gopherColumns(sf.documents),
      TextAnalysis2.diversity(sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), plan)
    }
    // gopherColumns itself introduces NO exchange at all
    val gate = TextAnalysis2.gopherColumns(sf.documents)
      .queryExecution.executedPlan.toString
    assert(!gate.contains("Exchange"), gate)
  }

  test("oov rate counts exactly the tokens outside the corpus top-20 vocab") {
    val rows = graft.operators.TextRank.oovRate(sf).collect()
    assert(rows.length == sf.documents.count())
    // recount with a driver-side vocabulary
    val toks = sf.documents.collect().flatMap(r =>
      r.getString(1).split(" ").filter(_.nonEmpty).map(tok => (r.getLong(0), tok)))
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (tok, c) => (-c, tok) }.take(20).map(_._1).toSet
    val byDoc = toks.groupBy(_._1)
    rows.foreach { r =>
      val ts = byDoc(r.getLong(0)).map(_._2)
      assert(r.getLong(1) == ts.length)
      assert(r.getLong(2) == ts.count(!vocab.contains(_)))
      assert(r.getDouble(3) == ts.count(!vocab.contains(_)).toDouble / ts.length)
    }
  }

  test("chunk dedup removes exactly the post-first chunk occurrences and rebuilds docs") {
    val docs = sf.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.map { case (id, text) =>
      val chunks = text.split(" ").grouped(10).map(_.mkString(" ")).toVector
      val kept = chunks.filter(seen.add)
      (id, kept.mkString(" "), chunks.length.toLong,
        (chunks.length - kept.length).toLong)
    }
    val got = TextAnalysis2.chunkDedup(sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    // the pass must actually fire at this SF (repeated chunks exist)
    assert(expected.map(_._4).sum > 0)
    // and must not fire on everything
    assert(expected.exists(_._4 == 0L))
  }

  test("hashed features: portable-hash dims, tf sums to token count, weights exact") {
    val rows = TextAnalysis2.hashedFeatures(sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    def dim(tok: String): Int = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(md5.substring(0, 15), 16) % 32).toInt
    }
    val docs = sf.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val expected = docs.flatMap { case (id, ts) =>
      ts.groupBy(dim).map { case (d, g) =>
        (id, d, g.length.toLong, g.length.toDouble / ts.length)
      }
    }.toSet
    assert(rows.toSet == expected)
    // per-doc tf mass equals the token count
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.map(_._3).sum == docs(id).length)
    }
    assert(rows.forall(r => r._2 >= 0 && r._2 < 32))
  }
}
