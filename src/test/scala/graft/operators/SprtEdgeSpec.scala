package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Adversarial synthetic-census tests for [[StatsOps.statSprt]] — the
  * decision-logic branches the real fixture cannot be relied on to
  * force: a FIRST-day crossing (no 'continue' prefix at all), the
  * FREEZE despite the LLR wandering back inside the band after the
  * crossing (the property that makes it a sequential test rather than
  * a pointwise threshold), an accept_h0 lower-bound exit, and a
  * never-crossing arm. Events are written through the engine's own
  * parquet schema so the full production path runs — Tables.events
  * conform, md5 arm split, census, windows, freeze.
  */
class SprtEdgeSpec extends SparkSuite {

  private val LogS = math.round(math.log(0.25 / 0.15) * 1e6)  //  510826
  private val LogF = math.round(math.log(0.75 / 0.85) * 1e6)  // -125163
  private val Upper = math.round(math.log(0.95 / 0.05) * 1e6) // 2944439

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // deterministic pools of user ids landing in each arm
  private lazy val aIds =
    (0L to 400L).filter(id => md5Hex(s"ab42:$id").head < '8')
  private lazy val bIds =
    (0L to 400L).filter(id => md5Hex(s"ab42:$id").head >= '8')

  /** Write (arm, day, purchases, failures) censuses as a real events
    * table in the engine's pinned schema and run production statSprt. */
  private def runSprt(census: Seq[(Char, String, Int, Int)]) = {
    import spark.implicits._
    val rows = census.flatMap { case (arm, day, nPurch, nFail) =>
      val pool = if (arm == 'A') aIds else bIds
      (0 until nPurch).map(i => (pool(i % pool.size), "purchase", day)) ++
        (0 until nFail).map(i => (pool(i % pool.size), "click", day))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_sprt_edge")
    try {
      rows.toDF("user_id", "event_type", "day")
        .select(
          monotonically_increasing_id().as("event_id"),
          to_timestamp(concat(col("day"), lit(" 12:00:00"))).as("ts"),
          col("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(dir.resolve("events.parquet").toString)
      StatsOps.statSprt(spark, dir.toString).collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(5), r.getString(6), r.getInt(7))).toSeq
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  test("first-day crossing has no continue prefix; overrun is post_stop") {
    val got = runSprt(Seq(
      ('A', "2024-03-01", 6, 0),  // +6·LogS = 3064956 >= Upper on day 1
      ('A', "2024-03-02", 0, 1),
      ('B', "2024-03-01", 1, 4),  // +10174/day — drifts, never crosses
      ('B', "2024-03-02", 1, 4),
      ('B', "2024-03-03", 1, 4)))
    val expected = Seq(
      ("A", "2024-03-01", 6L, 6L, 6 * LogS, "accept_h1", 0),
      ("A", "2024-03-02", 1L, 0L, 6 * LogS + LogF, "accept_h1", 1),
      ("B", "2024-03-01", 5L, 1L, LogS + 4 * LogF, "continue", 0),
      ("B", "2024-03-02", 5L, 1L, 2 * (LogS + 4 * LogF), "continue", 0),
      ("B", "2024-03-03", 5L, 1L, 3 * (LogS + 4 * LogF), "continue", 0))
    assert(got == expected)
    assert(6 * LogS >= Upper && LogS + 4 * LogF < Upper) // premises
  }

  test("the decision stays frozen when the LLR returns inside the band") {
    val got = runSprt(Seq(
      // arm A exits through the LOWER bound on day 2 (accept_h0)
      ('A', "2024-03-01", 0, 12), // -1501956: in band
      ('A', "2024-03-02", 0, 12), // -3003912 <= -Upper: cross
      ('A', "2024-03-03", 1, 0),  // overrun
      // arm B crosses UP on day 1 then wanders BACK IN BAND on day 2 —
      // a pointwise threshold would read 'continue'; SPRT must not
      ('B', "2024-03-01", 6, 0),   // 3064956 >= Upper: cross
      ('B', "2024-03-02", 0, 20))) // cum 561696: inside the band
    val expected = Seq(
      ("A", "2024-03-01", 12L, 0L, 12 * LogF, "continue", 0),
      ("A", "2024-03-02", 12L, 0L, 24 * LogF, "accept_h0", 0),
      ("A", "2024-03-03", 1L, 1L, 24 * LogF + LogS, "accept_h0", 1),
      ("B", "2024-03-01", 6L, 6L, 6 * LogS, "accept_h1", 0),
      ("B", "2024-03-02", 20L, 0L, 6 * LogS + 20 * LogF, "accept_h1", 1))
    assert(got == expected)
    // premises: day-2 cum really is back inside the open band, and the
    // A exit really is through the lower bound
    assert(6 * LogS + 20 * LogF > -Upper && 6 * LogS + 20 * LogF < Upper)
    assert(24 * LogF <= -Upper && 12 * LogF > -Upper)
  }
}
