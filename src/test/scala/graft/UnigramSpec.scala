package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Hand-computed unigram-LM trainer runs on constructed corpora —
  * including the knife-edge Viterbi tie the smallest-start rule must
  * resolve identically to the oracle's (sc DESC, s ASC) window.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(text: String): Tables = {
    val dir = Files.createTempDirectory("graft-unigram").toString
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("trainer replays the hand computation, incl. the equal-product tie") {
    // words: aa ×3, ab ×1. Seed counts: a=7, aa=3, ab=1, b=1; round-1
    // Laplace (total 12, V 4): p(a)=.5 p(aa)=.25 p(ab)=p(b)=.125.
    // Viterbi "aa" position 2 is an EXACT tie: [aa] = 1·.25 = .25 and
    // [a,a] = .5·.5 = .25 — the smallest-start rule must pick [aa].
    // "ab": [ab]=.125 beats [a,b]=.0625. Re-counts: aa=3, ab=1, a=b=0;
    // nothing prunes (≪ KeepSize); round 2 repeats the same choices.
    // Final (total 4, V 4): p = (cnt+1)/8.
    val t = corpus("aa aa aa ab")
    val rows = graft.operators.Unigram.unigramTrain(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1L, "aa", 3L, 0.5),
      (2L, "ab", 1L, 0.25),
      (3L, "a", 0L, 0.125),
      (4L, "b", 0L, 0.125)))
  }

  test("words beyond MaxWordLen are excluded from training") {
    val long17 = "q" * 17
    val t = corpus(s"$long17 ab ab")
    val pieces = graft.operators.Unigram.unigramTrain(t)
      .select("piece").collect().map(_.getString(0)).toSet
    assert(!pieces.exists(_.contains("q")))
    assert(pieces.contains("ab"))
  }
}
