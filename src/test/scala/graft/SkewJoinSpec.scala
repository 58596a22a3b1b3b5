package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    // skewed big side: 90% of rows share key 1
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 5 + 2 else 1, i))
      .toDF("k", "payload")
    val small = Seq((1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "d"), (6, "e"))
      .toDF("sk", "label")

    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "payload", "label")
      .as[(Int, Int, String)].collect().sorted
    val salted = SkewJoin.saltedJoin(big, small, "k", "sk", numSalts = 8)
      .select("k", "payload", "label")
      .as[(Int, Int, String)].collect().sorted

    assert(salted.sameElements(plain))
    assert(plain.nonEmpty)
  }

  test("salted join replicates the small side once per salt") {
    val big = Seq((1, "x")).toDF("k", "v")
    val small = Seq((1, "y")).toDF("sk", "w")
    // one big row matches exactly one of the 8 replicas → exactly 1 row out
    val out = SkewJoin.saltedJoin(big, small, "k", "sk", numSalts = 8)
    assert(out.count() == 1)
  }
}
