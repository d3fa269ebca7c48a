package graft.pipeline

import graft.SparkSuite
import graft.core.Tables

/** Cross-operator consistency for pipe_curation_funnel: its stage
  * counts must agree with the ops that implement each stage.
  */
class CurationFunnelSpec extends SparkSuite {

  test("funnel stages reconcile with the stage operators") {
    val rows = PipelineOps.curationFunnel(spark, sf001).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set(0, 1, 2, 3))
    // monotone shrink in both docs and tokens
    (0 to 2).foreach { i =>
      assert(rows(i)._2 >= rows(i + 1)._2, s"docs grew at stage ${i + 1}")
      assert(rows(i)._3 >= rows(i + 1)._3, s"tokens grew at stage ${i + 1}")
    }
    // stage 0 = raw corpus
    assert(rows(0)._2 == Tables.documents(spark, sf001).count())
    // stage 1 = the quality gate's keep population
    val keeps = graft.text.TextOps
      .withQualityReason(Tables.documents(spark, sf001))
      .filter(org.apache.spark.sql.functions.col("reason") === "keep")
      .count()
    assert(rows(1)._2 == keeps, "quality stage disagrees with the gate")
    // stage 3 = exactly what pipe_e2e_curation emits
    assert(rows(3)._2 == PipelineOps.e2eCuration(spark, sf001).count(),
      "mix stage disagrees with the end-to-end pipeline output")
    // every stage drops something in this fixture (real funnel)
    assert(rows(3)._2 < rows(0)._2)
  }
}
