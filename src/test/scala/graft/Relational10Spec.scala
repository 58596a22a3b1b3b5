package graft

import graft.operators.Relational10

class Relational10Spec extends SparkSpec {

  test("audience overlap replays exact set arithmetic per type pair") {
    val rows = Relational10.audienceOverlap(sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(rows.nonEmpty)
    val m = sf.events.select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = m.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keys.toSeq.sorted
    // every unordered pair with a nonempty intersection is present
    for (a <- types; b <- types if a < b) {
      val (sa, sb) = (byType(a), byType(b))
      val inter = (sa & sb).size.toLong
      rows.get((a, b)) match {
        case Some((na, nb, nBoth, j)) =>
          assert(na == sa.size && nb == sb.size && nBoth == inter)
          assert(math.abs(j - inter.toDouble / (sa ++ sb).size) < 1e-12)
        case None => assert(inter == 0, s"missing pair ($a,$b)")
      }
    }
  }

  test("dup payments pairs stay inside their blocking group and window") {
    val rows = Relational10.dupPayments(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val orders = sf.orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact)).toMap
    rows.foreach { case (cust, a, b, ca, cb, days) =>
      assert(a < b)
      assert(days >= 0 && days <= 90)
      val (custA, centsA) = orders(a)
      val (custB, centsB) = orders(b)
      assert(custA == cust && custB == cust)
      assert(ca == centsA && cb == centsB)
      // same 20k-dollar bucket
      assert(centsA / 2000000L == centsB / 2000000L)
    }
  }
}
