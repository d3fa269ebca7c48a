package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PartitionedSpec extends SparkSuite {

  test("date predicate lands in PartitionFilters, not data filters") {
    val df = PartitionedOps.q29PartitionPruning(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.replaceAll("\\s+", " ")
      .matches(".*PartitionFilters: \\[[^\\]]*dt[^\\]]*\\].*"),
      s"dt bounds not in PartitionFilters:\n$plan")
    // the dt predicate must NOT appear as a pushed data filter — it is
    // resolved against the directory listing before any file IO
    assert(!plan.replaceAll("\\s+", " ")
      .matches(".*PushedFilters: \\[[^\\]]*dt[^\\]]*\\].*"),
      s"dt leaked into PushedFilters:\n$plan")
  }

  test("dim filter on non-partition column triggers dynamic pruning") {
    val df = PartitionedOps.q30DynamicPruning(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in:\n$plan")
  }

  test("pruned queries return the same rows as the raw-table formulation") {
    val got = PartitionedOps.q29PartitionPruning(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val raw = graft.core.Tables.events(spark, sf0001)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("dt") >= "2024-01-10" && col("dt") <= "2024-01-16")
      .groupBy("dt", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("dt", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == raw.toSeq)
  }
}
