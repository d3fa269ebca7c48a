package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.Tables

/** Checks for stat_cov_matrix: the decimal-exact quantized moments
  * must reproduce Spark's own covar_samp/corr on the raw doubles to
  * within the e4 quantization error, and the matrix must satisfy the
  * structural invariants (unit diagonal, |corr| <= 1, symmetry of the
  * emitted upper triangle with the built-in's value).
  */
class CovMatrixSpec extends SparkSuite {

  test("matches built-in covar_samp/corr within quantization error") {
    val got = StatsOps.statCovMatrix(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.size == 10)
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    val li = Tables.lineitem(spark, sf0001)
    val ref = li.agg(
      count(lit(1)).as("n"),
      (for {
        i <- cols.indices; j <- i until cols.size
      } yield Seq(
        covar_samp(col(cols(i)), col(cols(j))).as(s"cov_${i}_$j"),
        corr(col(cols(i)), col(cols(j))).as(s"corr_${i}_$j")
      )).flatten: _*).collect()(0)
    val n = ref.getLong(0)
    for {
      i <- cols.indices; j <- i until cols.size
    } {
      val (gn, gcov, gcorr) = got((cols(i), cols(j)))
      assert(gn == n)
      val rcov = ref.getAs[Double](s"cov_${i}_$j")
      val rcorr = ref.getAs[Double](s"corr_${i}_$j")
      // e4 quantization perturbs each value by <= 5e-5, so the
      // sample covariance moves by at most ~1e-4 * (sd_x + sd_y);
      // a mixed abs/rel band covers every magnitude in the matrix
      val covTol = 1e-4 * (math.sqrt(got((cols(i), cols(i)))._2) +
        math.sqrt(got((cols(j), cols(j)))._2)) + 1e-6
      assert(math.abs(gcov - rcov) <= covTol,
        s"cov(${cols(i)},${cols(j)}): $gcov vs $rcov tol $covTol")
      assert(math.abs(gcorr - rcorr) <= 1e-3 + 1e-6,
        s"corr(${cols(i)},${cols(j)}): $gcorr vs $rcorr")
      assert(math.abs(gcorr) <= 1.0 + 1e-9)
      if (i == j) assert(gcorr == 1.0, s"diagonal corr ${cols(i)}")
    }
  }
}
