package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSuite {
  import spark.implicits._

  test("rolling hash matches hand computation") {
    // "ab": ((0*31+97)*31 + 98) % p = 97*31 + 98 = 3105
    val got = Seq("ab", "", "a").toDF("s")
      .select(RollingHash.rollingHash(col("s")))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3105L, 0L, 97L))
  }

  test("null input yields null; values stay within [0, p)") {
    val rows = Seq(Some("hello world"), None).toDF("s")
      .select(RollingHash.rollingHash(col("s")))
      .collect()
    assert(!rows(0).isNullAt(0) &&
      rows(0).getLong(0) >= 0 && rows(0).getLong(0) < 1000000007L)
    assert(rows(1).isNullAt(0))
  }

  test("interpreted eval agrees with codegen result") {
    val e = RollingHash(
      org.apache.spark.sql.catalyst.expressions.Literal("ab"))
    assert(e.eval(null) == 3105L)
  }
}
