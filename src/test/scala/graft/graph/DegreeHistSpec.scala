package graft.graph

import graft.SparkSuite

/** Differential test for [[GraphOps.graphDegreeHist]]: rebuild the
  * capped item graph on the driver (same cap, same distinct-pair
  * symmetrization), bucket degrees by bit length, and compare every
  * census row; plus the histogram identities (node counts sum to the
  * graph's node count, degree mass sums to 2·|edges|, bucket ranges
  * really are [2^(b-1), 2^b)).
  */
class DegreeHistSpec extends SparkSuite {

  test("graph_degree_hist matches a driver rebuild") {
    val inter = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id", "get_json_object(props, '$.k')")
      .collect()
      .flatMap(r => Option(r.getString(1)).map(k => (r.getLong(0), k.toInt)))
      .distinct
    val capped = inter.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.map(_._2).sorted.take(GraphOps.ItemGraphCap)
        .map(i => (xs.head._1, i))
    }
    val pairs = capped.groupBy(_._1).values.flatMap { items =>
      val is = items.map(_._2).sorted
      for (i <- is.indices; j <- (i + 1) until is.size)
        yield (is(i), is(j))
    }.toSet
    val deg = (pairs.toSeq.map(_._1) ++ pairs.toSeq.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = deg.values.groupBy(d =>
      (64 - java.lang.Long.numberOfLeadingZeros(d)).toInt).toSeq
      .map { case (b, ds) =>
        (b, ds.size.toLong, ds.min, ds.max, ds.sum)
      }
      .sortBy(_._1)
    val got = GraphOps.graphDegreeHist(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == deg.size.toLong)
    assert(got.map(_._5).sum == 2L * pairs.size)
    got.foreach { case (b, _, lo, hi, _) =>
      assert(lo >= (1L << (b - 1)) && hi < (1L << b),
        s"bucket $b range [$lo,$hi] outside [2^${b - 1}, 2^$b)")
    }
  }
}
