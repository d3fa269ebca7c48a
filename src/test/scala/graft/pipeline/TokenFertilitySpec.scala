package graft.pipeline

import graft.SparkSuite

/** Differential test for [[PipelineOps.tokenFertility]]: recompute
  * the (lang, source) fertility census on the driver with Java's own
  * regex engine, plus a synthetic all-spaces edge case pinning the
  * pieces = 0 NULL guard (the fixture never exercises it).
  */
class TokenFertilitySpec extends SparkSuite {

  private val piece = java.util.regex.Pattern
    .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")

  test("pipe_token_fertility matches a driver recompute at sf0.001") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("lang", "source", "text", "cast(n_chars as long)")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val expected = docs.groupBy(d => (d._1, d._2)).toSeq.sortBy(_._1)
      .map { case ((lang, src), rows) =>
        val words = rows.map(_._3.split(" ", -1).length.toLong).sum
        val pieces = rows.map { d =>
          val m = piece.matcher(d._3)
          var k = 0L; while (m.find()) k += 1; k
        }.sum
        val chars = rows.map(_._4).sum
        (lang, src, rows.size.toLong, words, pieces, chars,
          (pieces * 1000000L + words / 2) / words,
          (chars * 1000000L + pieces / 2) / pieces)
      }
    val got = PipelineOps.tokenFertility(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
  }

  test("all-symbol/space corpus hits the zero-pieces NULL guard") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fertility_edge").toString
    Seq(("en", "src0", "   ", 3L, 0L))
      .toDF("lang", "source", "text", "n_chars", "doc_id")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = PipelineOps.tokenFertility(spark, dir).collect()(0)
    // "   ".split(" ") -> 4 empty words, 0 pieces
    assert(row.getLong(3) == 4L && row.getLong(4) == 0L)
    assert(!row.isNullAt(6), "fertility defined (words > 0)")
    assert(row.isNullAt(7), "chars_per_piece must be NULL at pieces = 0")
  }
}
