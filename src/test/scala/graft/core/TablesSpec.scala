package graft.core

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSuite

/** Encoding robustness for [[Tables.events]].
  *
  * The driver has regenerated `events.parquet` with different `ts`
  * encodings across rounds — TIMESTAMP(NANOS) (which Spark only reads
  * via `nanosAsLong`, arriving as LongType) and TIMESTAMP(MICROS)
  * non-UTC-adjusted (arriving as TIMESTAMP_NTZ). Round 9 lost all 24
  * events queries to exactly such a regen. This spec writes the same
  * tiny events table in every arrival encoding the loader branches on
  * and asserts identical rows come back, so the next regen cannot
  * silently break the family again.
  */
class TablesSpec extends SparkSuite {

  // three instants, exercising sub-second micros precision
  private val micros =
    Seq(1700000000000000L, 1700000123456789L, 1700009999999999L)

  private val base = {
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, 100L + i, s"type_$i", i * 1.5, s"""{"k":$i}""")
    }
    rows
  }

  private def writeVariant(encode: String): String = {
    val dir = Files.createTempDirectory(s"graft_events_$encode").toString
    val schemaTs = encode match {
      case "long_nanos" => LongType
      case "ntz_micros" => TimestampNTZType
      case "utc_micros" => TimestampType
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", schemaTs),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = base.map { case (id, us, uid, et, v, p) =>
      val ts: Any = encode match {
        case "long_nanos" => us * 1000L // TIMESTAMP(NANOS) read as long
        case "ntz_micros" =>
          java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
        case "utc_micros" => // session TZ pinned UTC → same wall-clock
          Timestamp.from(java.time.Instant.ofEpochSecond(
            us / 1000000L, (us % 1000000L) * 1000L))
      }
      Row(id, ts, uid, et, v, p)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loaded(dir: String): Seq[(Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

  test("events loads identically from all ts encodings") {
    val expected = base.map { case (id, us, uid, _, _, _) => (id, us, uid) }
    for (enc <- Seq("long_nanos", "ntz_micros", "utc_micros")) {
      val dir = writeVariant(enc)
      val got = loaded(dir)
      assert(got == expected, s"encoding $enc mismatched")
      val tsType = Tables.events(spark, dir).schema("ts").dataType
      assert(tsType == TimestampType, s"encoding $enc arrived as $tsType")
    }
  }

  test("events on driver testdata has timestamp ts and nonzero rows") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
  }

  // Drift guard for EVERY table: the loader must present exactly these
  // columns and types regardless of how the driver re-encodes the
  // parquet (the r9 events outage, generalized). Timestamp columns are
  // pinned to the NORMALIZED type the engine has always exposed, not to
  // whatever encoding the current files happen to carry.
  private val expectedSchemas: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every table loads with the engine's pinned schema") {
    for (name <- Tables.all) {
      val got = Tables.load(spark, sf0001, name).schema
        .map(f => f.name -> f.dataType)
      assert(got == expectedSchemas(name),
        s"$name drifted: got $got, expected ${expectedSchemas(name)}")
    }
  }

  test("numeric width drift conforms back to the pinned schema") {
    // a regen that re-encodes ids as int32 (the next plausible drift
    // after r9's timestamp-unit switch) must load transparently
    val dir = Files.createTempDirectory("graft_events_narrow").toString
    Tables.events(spark, sf0001)
      .selectExpr("cast(event_id as int) as event_id", "ts",
        "cast(user_id as int) as user_id", "event_type",
        "cast(value as float) as value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("event_id").dataType == LongType)
    assert(ev.schema("user_id").dataType == LongType)
    assert(ev.schema("value").dataType == DoubleType)
    assert(ev.count() == Tables.events(spark, sf0001).count())
  }

  test("non-numeric drift fails loudly at load, not downstream") {
    val dir = Files.createTempDirectory("graft_events_bad").toString
    Tables.events(spark, sf0001)
      .selectExpr("cast(event_id as string) as event_id", "ts", "user_id",
        "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("event_id"),
      s"error should name the drifted column: ${e.getMessage}")
  }
}
