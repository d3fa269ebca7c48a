package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for q61_rolling_7d: the RANGE-frame window must
  * equal a brute per-order trailing-window recount on the driver.
  */
class Rolling7dSpec extends SparkSuite {

  test("trailing 7-day count/sum equals a brute recount") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("us"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = orders.groupBy(_._2)
    val windowUs = 6L * 86400L * 1000000L

    val got = AnalyticsOps.q61Rolling7d(spark, sf0001).collect()
    assert(got.length == orders.length)
    got.foreach { r =>
      val (key, cust, us) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val peers = byCust(cust).filter(o => o._3 >= us - windowUs && o._3 <= us)
      assert(r.getLong(3) == peers.length.toLong, s"n_7d at order $key")
      assert(r.getLong(4) == peers.map(_._4).sum, s"sum_7d_c at order $key")
    }
  }
}
