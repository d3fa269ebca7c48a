package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def cosDf = Seq(
    (Array(1.0, 0.0), Array(1.0, 0.0)), // identical -> 1
    (Array(1.0, 0.0), Array(0.0, 1.0)), // orthogonal -> 0
    (Array(1.0, 0.0), Array(-1.0, 0.0)), // opposite -> -1
    (Array(1.0, 2.0), Array(2.0, 4.0))) // colinear -> 1
    .toDF("a", "b")

  test("cosine_sim matches hand values (codegen path)") {
    val got = cosDf
      .select(round(CosineSimilarity.cosineSim(col("a"), col("b")), 6))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 0.0, -1.0, 1.0))
  }

  test("cosine_sim matches the HOF formulation on real embeddings") {
    val e = graft.core.Tables.embeddings(spark, sf0001)
      .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
      .limit(50)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(
        CosineSimilarity.cosineSim(col("a.vec"), col("b.vec")).as("native"),
        (expr("aggregate(zip_with(a.vec, b.vec, (p, q) -> p * q), " +
          "cast(0 as double), (acc, v) -> acc + v)") /
          (expr("sqrt(aggregate(a.vec, cast(0 as double), (acc, x) -> acc + x * x))") *
            expr("sqrt(aggregate(b.vec, cast(0 as double), (acc, x) -> acc + x * x))")))
          .as("hof"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("nulls and mismatches: null input, length mismatch, zero norm") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array(1.0, 2.0)), Some(Array(1.0))),
      (Some(Array(0.0, 0.0)), Some(Array(1.0, 2.0))))
      .toDF("a", "b")
    val got = df.select(CosineSimilarity.cosineSim(col("a"), col("b")))
      .collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("SQL registration: cosine_sim usable from spark.sql") {
    CosineSimilarity.register(spark)
    cosDf.createOrReplaceTempView("cos_pairs")
    val got = spark
      .sql("select round(cosine_sim(a, b), 6) from cos_pairs")
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 0.0, -1.0, 1.0))
  }

  test("interpreted eval path agrees with codegen") {
    // force interpreted evaluation through the expression directly
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    val v = e.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 24.0 / 25.0) < 1e-12)
  }
}
