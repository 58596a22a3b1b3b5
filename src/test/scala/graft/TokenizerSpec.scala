package graft

import graft.operators.Tokenizer

class TokenizerSpec extends SparkSpec {

  private def train(dir: String) =
    Tokenizer.bpeTrain(Tables(spark, dir)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("bpe_train learns the hand-computed merge sequence on a tiny corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    // vocab: "the"×3, "cat"×1 → pair counts round 1: (t,h)=3, (h,e)=3,
    // (c,a)=1, (a,t)=1 → tie at 3 broken lexicographically: "h e" < "t h"
    Seq((0L, "the the cat"), (1L, "the"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = train(dir)
    assert(got.take(4).toSeq == Seq(
      (1, "h", "e", "he", 3L),
      (2, "t", "he", "the", 3L),
      (3, "a", "t", "at", 1L),
      (4, "c", "at", "cat", 1L)))
    // corpus exhausts after 4 merges — no padding rows, ranks contiguous
    assert(got.length == 4)
  }

  test("bpe_train merge application is leftmost non-overlapping on repeat runs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe2").toString
    // "aaaa": round 1 counts (a,a)=3 → merge; leftmost-nonoverlap turns
    // `a a a a` into `aa a a` (scan resumes AFTER the replacement), so
    // round 2 sees (aa,a)=1,(a,a)=1 → "a a" < "aa a" wins the tie
    Seq((0L, "aaaa")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = train(dir)
    assert(got.head == ((1, "a", "a", "aa", 3L)))
    assert(got(1) == ((2, "a", "a", "aa", 1L)), s"got ${got(1)}")
  }

  test("bpe_apply tokenizes with the learned merges (hand-computed counts)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe3").toString
    // merges learned (per the first test): (h,e) (t,he) (a,t) (c,at) —
    // "the" collapses to 1 token, "cat" to 1; an unseen word "hat"
    // becomes h+at = 2 tokens (uses merge 3 but not 1: 'h a t' has no
    // 'h e'); "chat" = c+h+at = 3 (the c-at merge needs 'c a' adjacent)
    Seq((0L, "the the cat"), (1L, "the"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val applied = Tokenizer.bpeApply(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(applied == Map(0L -> 3L, 1L -> 1L), s"got $applied")

    val dir2 = java.nio.file.Files.createTempDirectory("graft-bpe4").toString
    Seq((0L, "the the cat"), (1L, "the hat chat"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val applied2 = Tokenizer.bpeApply(Tables(spark, dir2)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same merge sequence learns (hat/chat add 'a t','h a','c h','t c'
    // singleton pairs that lose every tie to the dominant the/cat pairs
    // until rank 3+); doc 1 = the(1) + h·at(2) + c·h·at(3)
    assert(applied2(0L) == 3L, s"got $applied2")
    assert(applied2(1L) <= 6L && applied2(1L) >= 3L, s"got $applied2")
  }

  test("bpe_train on the sf corpus: full merge budget, contiguous ranks, well-formed merges") {
    val got = train("/root/testdata/sf0.001")
    assert(got.length == Tokenizer.BpeMerges)
    assert(got.map(_._1).toSeq == (1 to Tokenizer.BpeMerges))
    got.foreach { case (_, l, r, m, c) =>
      assert(m == l + r)
      assert(c >= 1L)
      assert(l.nonEmpty && r.nonEmpty && (l + r).matches("[a-z]+"))
    }
  }

  test("fertility aggregates bpe_apply token counts with exact integer ratios") {
    import org.apache.spark.sql.functions._
    val sf = Tables(spark, "/root/testdata/sf0.001")
    val got = Tokenizer.fertility(sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty)
    // independent per-doc tokens from bpeApply + direct word/char counts
    val tokens = Tokenizer.bpeApply(sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = sf.documents.select(col("doc_id"), col("lang"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .collect().map { r =>
        val ws = r.getSeq[String](2)
        (r.getString(1), ws.size.toLong, ws.map(_.length.toLong).sum,
          tokens(r.getLong(0)))
      }
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val (nd, nw, nt, tpw, cpt) = got(lang)
      val (w, c, tk) = (ds.map(_._2).sum, ds.map(_._3).sum, ds.map(_._4).sum)
      assert(nd == ds.length && nw == w && nt == tk, s"$lang counts")
      assert(tpw == tk * 1000000L / w, s"$lang tokens/word")
      assert(cpt == c * 1000000L / tk, s"$lang chars/token")
    }
  }
}
