package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.ExplainMode

/** q63/q64 contract checks: the SQL UDF must inline into codegen (no
  * ScalaUDF island) and the parameterized plan must still push the
  * filter to the scan.
  */
class SqlUdfSpec extends SparkSuite {

  test("SQL UDF inlines — no ScalaUDF/eval island in the plan") {
    val df = SqlSurfaceOps.q63SqlUdf(spark, sf0001)
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("ScalaUDF"), s"UDF did not inline:\n$plan")
    assert(!plan.contains("BatchEvalPython"))
    assert(plan.contains("HashAggregate"), "agg shape changed")
    assert(df.count() > 0)
  }

  test("parameter markers bind as literals and push to the scan") {
    val df = SqlSurfaceOps.q64ParamSql(spark, sf0001)
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(o_totalprice,150000"),
      s"param filter not pushed:\n$plan")
    assert(df.count() > 0)
  }
}
