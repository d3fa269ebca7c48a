package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ThetaSketchSpec extends SparkSuite {
  import spark.implicits._

  test("exact regime: estimate and intersection equal true counts") {
    // A = 0..999, B = 500..1499 -> |A|=|B|=1000, |A ∩ B| = 500
    val df = ((0 until 1000).map(i => ("A", s"u$i")) ++
      (500 until 1500).map(i => ("B", s"u$i")))
      .toDF("seg", "uid").repartition(8)
    val sk = df.groupBy("seg")
      .agg(ThetaSketch.thetaSketch(col("uid")).as("sk"))
    val ests = sk.select(col("seg"), ThetaSketch.thetaEst(col("sk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ests == Map("A" -> 1000L, "B" -> 1000L))
    val overlap = sk.as("a").join(sk.as("b"),
        col("a.seg") < col("b.seg"))
      .select(ThetaSketch.thetaIntersectEst(col("a.sk"), col("b.sk")))
      .head().getLong(0)
    assert(overlap == 500L)
  }

  test("estimates are expressions, not UDFs; both eval paths agree") {
    val sk = (0 until 100).map(i => s"u$i").toDF("uid")
      .agg(ThetaSketch.thetaSketch(col("uid")).as("sk"))
    val proj = sk.select(ThetaSketch.thetaEst(col("sk")).as("est"))
    // the whole point of the expression rewrite: no opaque ScalaUDF
    // node anywhere in the plan
    assert(!proj.queryExecution.optimizedPlan.toString.contains("ScalaUDF"))
    assert(proj.head().getLong(0) == 100L)
    // interpreted path (direct eval on the serialized bytes) must
    // agree with the codegen'd DataFrame result above
    val bytes = sk.head().getAs[Array[Byte]](0)
    val interp = ThetaEstimate(
      org.apache.spark.sql.catalyst.expressions.Literal(bytes))
      .eval(null)
    assert(interp == 100L)
    val interpI = ThetaIntersectEstimate(
      org.apache.spark.sql.catalyst.expressions.Literal(bytes),
      org.apache.spark.sql.catalyst.expressions.Literal(bytes))
      .eval(null)
    assert(interpI == 100L)
  }

  test("sampling regime: estimate within 5% at 100k distinct, lgK 12") {
    val n = 100000
    val df = (0 until n).map(i => s"user_$i").toDF("uid").repartition(16)
    val est = df.agg(ThetaSketch.thetaSketch(col("uid"), lgK = 12).as("sk"))
      .select(ThetaSketch.thetaEst(col("sk"))).head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.05,
      s"estimate $est off by ${math.abs(est - n).toDouble / n}")
  }
}
