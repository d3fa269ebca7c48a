package graft.text

import graft.SparkSuite
import graft.core.Tables

/** Differential + plan-shape checks for the per-domain median gate. */
class TextDomainGateSpec extends SparkSuite {

  test("domain gate keeps exactly the docs at/above their source's lower median") {
    val rows = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // independent lower median: sorted values, element at ceil(n/2)
    val med = rows.groupBy(_._2).map { case (s, xs) =>
      val sorted = xs.map(_._3).sorted
      s -> sorted((sorted.length + 1) / 2 - 1)
    }
    val expected = rows.collect {
      case (id, s, n) if n >= med(s) => (id, s, n, med(s))
    }.sortBy(_._1).toSeq
    val got = TextOps.textDomainGate(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // fixture must gate something in every source, and keep something
    assert(got.size < rows.length && got.nonEmpty)
  }

  test("the gate is a broadcast join over a pruned 3-column scan") {
    val plan = TextOps.textDomainGate(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // no data-sized shuffle: every Exchange in the plan is either the
    // tiny (source, n_chars) count aggregate or the final ORDER BY
    val m = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(m.contains("doc_id") && m.contains("source") &&
      m.contains("n_chars") && !m.contains("text"),
      s"scan not pruned to the 3 gate columns: $m")
  }
}
