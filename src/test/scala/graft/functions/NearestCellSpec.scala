package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[NearestCell]] — the native replacement for the IVF family's cell
  * assignment UDF (r15 verdict #4). Contract: squared-L2 argmin over
  * the centroid table, strict-< first-wins tie-break — bit-identical to
  * the driver-side Lloyd assignment loop.
  */
class NearestCellSpec extends SparkSuite {
  import spark.implicits._

  // the same loop SimilarityOps' driver-side training uses
  private def refNearest(cs: Array[Array[Double]],
      v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  test("hand values, ties go to the lowest cell index") {
    val cents = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      Array(0.1, 0.1), // cell 0
      Array(0.9, 0.1), // cell 1
      Array(0.1, 0.9), // cell 2
      Array(0.5, 0.5)) // equidistant from 1 and 2; 0 is closer? d0=0.5, d1=d2=0.5 -> tie with 0 too: first wins = 0
      .toDF("v")
    val got = df.select(NearestCell.nearestCell(col("v"), cents))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 2, 0))
  }

  test("property: codegen result equals the driver reference loop") {
    val dim = 8
    val genVec = Gen.listOfN(dim, Gen.chooseNum(-4.0, 4.0)).map(_.toArray)
    def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).map(i =>
        g.pureApply(Gen.Parameters.default, Seed(seed + i)))
    (1 to 10).foreach { trial =>
      val nc = 1 + trial % 12
      val vs = samples(genVec, 40, 1000L * trial)
      // deterministic centroids carved from the vectors themselves
      val cents = (0 until nc)
        .map(i => vs(i % vs.size).map(x => x + i * 0.01)).toArray
      val got = vs.toDF("v")
        .select(NearestCell.nearestCell(col("v"), cents))
        .collect().map(_.getInt(0)).toSeq
      val want = vs.map(refNearest(cents, _))
      assert(got == want, s"trial $trial (nc=$nc)")
    }
  }

  test("interpreted eval agrees with codegen") {
    val cents = Array(Array(1.0, 2.0), Array(2.0, 1.0))
    val e = NearestCell(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.9, 1.2), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), cents)
    assert(e.eval(null) == 1)
  }

  test("null input stays null; dim mismatch is a hard error") {
    val cents = Array(Array(0.0, 0.0))
    val df = Seq(Option.empty[Array[Double]]).toDF("v")
    assert(df.select(NearestCell.nearestCell(col("v"), cents))
      .collect().head.isNullAt(0))
    val bad = Seq(Array(1.0, 2.0, 3.0)).toDF("v")
    val ex = intercept[Exception] {
      bad.select(NearestCell.nearestCell(col("v"), cents)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("a null ELEMENT nulls the result in both eval paths") {
    // the unsafe buffer would otherwise read a null element as 0.0
    // and silently return a wrong cell (review finding, r16)
    val cents = Array(Array(0.0, 0.0), Array(5.0, 5.0))
    val got = spark.sql(
      "select cast(array(5.0, null) as array<double>) as v")
      .select(NearestCell.nearestCell(col("v"), cents))
      .collect().head
    assert(got.isNullAt(0), "codegen path must null, not read 0.0")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = NearestCell(Literal.create(
      new GenericArrayData(Array[Any](5.0, null)),
      ArrayType(DoubleType, containsNull = true)), cents)
    assert(e.eval(null) == null, "interpreted path must null, not NPE")
  }

  test("assignment stage whole-stage-codegens, no ScalaUDF") {
    // mirror the production shape: vec is materialized (localCheckpoint
    // in the IVF ops) BEFORE assignment — the float→double transform is
    // a CodegenFallback HOF and must not sit in the assignment stage
    val e = graft.core.Tables.embeddings(spark, sf0001)
      .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
      .localCheckpoint()
    val cents = Array(Array.fill(64)(0.0), Array.fill(64)(0.1))
    val q = e.select(NearestCell.nearestCell(col("vec"), cents).as("cell"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // codegen'd stages print as *(n) in the simple plan string; the
    // assignment Project must be inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("nearest_cell") && l.trim.startsWith("*")), plan)
    assert(q.collect().length == e.count())
  }
}
