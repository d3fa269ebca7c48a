package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** GATED end-to-end Kafka smoke (r12 verdict #8): this environment has
  * no broker or connector jar, so the facade is contract-pinned only
  * (SourcesContractSpec). The day a broker exists, setting
  * SPARK_GRAFT_KAFKA_BROKER (and optionally SPARK_GRAFT_KAFKA_TOPIC)
  * proves the real path in one command:
  *
  *   SPARK_GRAFT_KAFKA_BROKER=host:9092 sbt "testOnly *KafkaSmokeSpec"
  *
  * Unset, the test is CANCELED (skipped, not failed) — the suite stays
  * green in broker-less environments. The spark-sql-kafka connector jar
  * must be on the classpath for the gated run; the skip message names
  * it so a half-configured environment fails loudly, not silently.
  */
class KafkaSmokeSpec extends SparkSuite {

  private val contract = StructType(Seq(StructField("value", StringType)))

  test("KafkaSource round-trips messages through a real broker (gated)") {
    val broker = sys.env.get("SPARK_GRAFT_KAFKA_BROKER")
    assume(broker.isDefined,
      "SPARK_GRAFT_KAFKA_BROKER not set — no broker in this " +
        "environment; facade stays contract-pinned (SourcesContractSpec)")
    assume(
      try {
        Class.forName(
          "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        true
      } catch { case _: ClassNotFoundException => false },
      "spark-sql-kafka connector jar missing from the classpath — " +
        "add spark-sql-kafka-0-10 to run the gated smoke")
    val topic = sys.env.getOrElse("SPARK_GRAFT_KAFKA_TOPIC", "graft_smoke")
    import spark.implicits._

    // produce through the stock Kafka batch sink, consume through the
    // SAME facade the pipelines use — with the reference's measured
    // earliest-offsets variant so the produced batch is replayed
    val msgs = (0 until 32).map(i => s"""{"user": $i, "rating": 5}""")
    msgs.toDF("value").write.format("kafka")
      .option("kafka.bootstrap.servers", broker.get)
      .option("topic", topic)
      .save()

    val src = KafkaSource(broker.get, topic, startingOffsets = "earliest")
    val df = src.load(spark)
    assert(df.isStreaming, "facade must yield a streaming DataFrame")
    assert(df.schema == contract, s"schema ${df.schema} != $contract")

    val q = df.writeStream.format("memory").queryName("kafka_smoke")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("kafka_smoke").as[String].collect().toSet
      // the topic may hold older messages from prior runs — assert
      // containment of this run's batch, not set equality
      val missing = msgs.toSet -- got
      assert(missing.isEmpty, s"${missing.size} produced messages " +
        s"never arrived through the facade: ${missing.take(3)}")
    } finally q.stop()
  }
}
