package graft.graph

import graft.SparkSuite

/** Differential test for [[GraphOps.graphAssortativity]]: rebuild the
  * capped graph on the driver, recompute the directed-edge degree
  * moments in BigInt and the Pearson r with the same double display
  * rule, and assert the symmetry identities (sx = sy, sxx = syy) the
  * operator's doc claims rather than assumes.
  */
class AssortativitySpec extends SparkSuite {

  test("graph_assortativity matches a driver recompute") {
    val inter = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id", "get_json_object(props, '$.k')")
      .collect()
      .flatMap(r => Option(r.getString(1)).map(k => (r.getLong(0), k.toInt)))
      .distinct
    val pairs = inter.groupBy(_._1).values.flatMap { xs =>
      val is = xs.map(_._2).distinct.sorted.take(GraphOps.ItemGraphCap)
      for (i <- is.indices; j <- (i + 1) until is.size)
        yield (is(i), is(j))
    }.toSet
    val directed = pairs.toSeq.flatMap(p => Seq(p, (p._2, p._1)))
    val deg = directed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = directed.map { case (a, b) => (BigInt(deg(a)), BigInt(deg(b))) }
    val n = BigInt(xs.size)
    val sx = xs.map(_._1).sum
    val sy = xs.map(_._2).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    assert(sx == sy && sxx == syy, "directed-edge symmetry must hold")
    val r = BigDecimal(
      (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (xs.size.toLong / 2,
      (sx * 1000000 / n).toLong, r)

    val row = GraphOps.graphAssortativity(spark, sf0001).collect()(0)
    val got = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(got == expected)
    assert(got._3 >= -1.0 && got._3 <= 1.0)
  }
}
