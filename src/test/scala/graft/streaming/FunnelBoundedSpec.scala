package graft.streaming

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Differential check for ev_funnel_bounded. */
class FunnelBoundedSpec extends SparkSuite {

  test("bounded stages equal a driver recount and never exceed unbounded") {
    val evs = Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) as us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = evs.groupBy(_._1)
    val clickWin = 3600000000L
    val purchWin = 86400000000L

    val want = byUser.map { case (u, es) =>
      val view = es.filter(_._3 == "view").map(_._2).minOption
      val click = view.flatMap(v => es.filter(e => e._3 == "click" &&
        e._2 > v && e._2 <= v + clickWin).map(_._2).minOption)
      val purch = click.flatMap(c => es.filter(e => e._3 == "purchase" &&
        e._2 > c && e._2 <= c + purchWin).map(_._2).minOption)
      val stage =
        if (purch.isDefined) 3
        else if (click.isDefined) 2 else if (view.isDefined) 1 else 0
      u -> (view, click, purch, stage)
    }

    val got = EventWindows.funnelBounded(spark, sf0001).collect()
      .map { r =>
        def opt(i: Int): Option[Long] =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> (opt(1), opt(2), opt(3), r.getInt(4))
      }.toMap
    assert(got == want, "bounded funnel disagrees with driver recount")

    val unbounded = EventWindows.funnel(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    got.foreach { case (u, (_, _, _, stage)) =>
      assert(stage <= unbounded(u),
        s"user $u: bounded stage $stage above unbounded ${unbounded(u)}")
    }
    // deadlines really cut something in this fixture
    assert(got.values.map(_._4).sum < unbounded.values.sum,
      "bound is vacuous on the fixture")
  }
}
