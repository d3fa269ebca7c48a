package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan: Catalyst pushes filters and prunes
  * columns into the scan, so callers should select/filter on the returned
  * DataFrame rather than asking for pre-filtered variants. At 100 TB these
  * would be partitioned tables (e.g. lineitem by ship-month); the API is
  * unchanged — `spark.read.parquet` handles partition pruning transparently.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else {
      // a nanos-encoded regen fails at scan time unless the flag is on;
      // no-op for micros files (see eventsRaw's doc on session scope)
      ensureNanosFlag(spark)
      normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"), name)
    }

  private def ensureNanosFlag(spark: SparkSession): Unit = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
  }

  /** Timestamp columns whose parquet encoding has drifted across
    * testdata regenerations (see [[eventsRaw]]). Each is normalized to
    * the type the engine (and its green oracle runs) has always seen:
    * TIMESTAMP_NTZ for the TPC-H date columns. A nanos regen arrives as
    * LongType (via the session-wide `nanosAsLong` flag) and would
    * otherwise fail analysis in every reader of the column.
    */
  private val ntzColumns: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  private def normalizeTs(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    ntzColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case TimestampNTZType => d
        case LongType => // nanos-as-long: micros → UTC instant → NTZ wall-clock
          d.withColumn(c,
            timestamp_micros(expr(s"$c div 1000")).cast(TimestampNTZType))
        case TimestampType => d.withColumn(c, col(c).cast(TimestampNTZType))
        case other => throw new IllegalStateException(
          s"$name.$c arrived as unsupported type $other")
      }
    }
  }

  /** `events.parquet`'s `ts` encoding has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as a long via `nanosAsLong`) and TIMESTAMP(MICROS) (read
    * natively, as TIMESTAMP_NTZ when the file is not UTC-adjusted). Branch
    * on the type the scan actually yields so either generation loads with
    * identical UTC semantics — DuckDB/the oracle sees the same instants.
    *
    * nanosAsLong is a session-wide flag (the parquet schema converter
    * reads SQLConf, not per-scan options) and is a no-op for non-nanos
    * files, so setting it up front is safe for both encodings.
    * [[GraftSession]] and the engine mains set it at session construction;
    * the guarded set here only covers foreign sessions and fires at most
    * once, so it never flips behavior mid-session for other reads.
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    ensureNanosFlag(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long generation: truncate to micros
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // micros generation, not UTC-adjusted: interpret the wall-clock in
        // the session TZ (pinned UTC engine-wide) to keep the old instants.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other; expected " +
            "LongType (nanos-as-long), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
