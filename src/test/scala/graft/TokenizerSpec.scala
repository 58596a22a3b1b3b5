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
}
