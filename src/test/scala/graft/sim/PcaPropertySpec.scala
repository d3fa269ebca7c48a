package graft.sim

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Generator-driven checks for the PCA invariant panel: every boolean
  * invariant must hold on ADVERSARIAL spectra, not just the fixture —
  * the sf0.1 sweep caught pc1_ge_pc2 flipping on a near-flat spectrum
  * (power iteration left the deflated direction marginally stronger),
  * exactly the class a generator reaches on every build.
  */
class PcaPropertySpec extends SparkSuite {

  private def embDf(vecs: Seq[Array[Float]]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.zipWithIndex.map { case (v, i) =>
          Row(i.toLong, v.toIndexedSeq, i % 3)
        }, 4),
      schema)
  }

  private def checkAllOk(vecs: Seq[Array[Float]], tag: String): Unit = {
    val rows = PcaOps.pcaInvariantsDf(spark, embDf(vecs)).collect()
      .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rows.size == 13, tag)
    rows.foreach { case (name, ok) => assert(ok, s"$tag: $name") }
  }

  private def rngVecs(seed: Long, n: Int, dim: Int)
      (f: (scala.util.Random, Int) => Double): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.tabulate(dim)(j => f(rnd, j).toFloat))
  }

  test("invariants hold on isotropic (flat-spectrum) data") {
    // every eigenvalue ~equal: the ordering edge that flipped at sf0.1
    (1 to 3).foreach { s =>
      checkAllOk(rngVecs(s, 150, 16)((r, _) => r.nextGaussian() * 0.05),
        s"isotropic seed $s")
    }
  }

  test("invariants hold on strongly anisotropic data") {
    // one dominant direction + noise: the easy spectrum
    checkAllOk(rngVecs(7, 120, 12) { (r, j) =>
      val t = r.nextGaussian()
      (if (j == 3) 0.8 * t else 0.0) + r.nextGaussian() * 0.01
    }, "anisotropic")
  }

  test("invariants hold on two balanced directions (degenerate top-2)") {
    // λ1 ≈ λ2 exactly — the hardest ordering case for deflation
    checkAllOk(rngVecs(11, 200, 10) { (r, j) =>
      val a = r.nextGaussian(); val b = r.nextGaussian()
      (if (j == 1) 0.5 * a else 0.0) + (if (j == 7) 0.5 * b else 0.0) +
        r.nextGaussian() * 0.005
    }, "balanced-pair")
  }

  test("invariants hold on clustered data with duplicate rows") {
    val rnd = new scala.util.Random(13)
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian() * 0.1))
    val vecs = (0 until 90).map { i =>
      val c = centers(i % 3)
      Array.tabulate(8)(j =>
        (c(j) + (if (i < 60) rnd.nextGaussian() * 0.02 else 0.0)).toFloat)
    }
    checkAllOk(vecs, "clustered+duplicates")
  }
}
