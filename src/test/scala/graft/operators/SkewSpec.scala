package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {

  test("salted join equals the plain join even with every key salted") {
    val allSalted = SkewOps.q28SaltedJoin(spark, sf0001, hotThreshold = 1)
      .collect()
    val default = SkewOps.q28SaltedJoin(spark, sf0001).collect()
    assert(allSalted.toSeq == default.toSeq)
  }

  test("salted join equals the plain join") {
    val salted = SkewOps.q28SaltedJoin(spark, sf0001).collect()
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderpriority")
      .collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt spreads a hot key's rows across the salt range") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf0001)
      .withColumn("salt",
        pmod(hash(col("l_linenumber"), col("l_partkey")), lit(8)))
    val hot = li.groupBy("l_orderkey").count()
      .orderBy(desc("count")).limit(1).collect()(0).getLong(0)
    val salts = li.filter(col("l_orderkey") === hot)
      .select("salt").distinct().count()
    assert(salts > 1, s"hot key $hot landed on $salts salt value(s)")
  }

  test("two-phase distinct matches count(DISTINCT) and keeps a partial agg") {
    val rewritten = SkewOps.q27SaltedDistinct(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val naive = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rewritten.toSeq == naive.toSeq)
  }
}
