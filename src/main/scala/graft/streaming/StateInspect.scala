package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline inspection of Structured Streaming state (Spark 4 state
  * data source). The reference debugs its streaming pipelines by
  * printing memory-sink tables (`app3/live_counts.py:64-69`); at
  * 100 TB the state lives in per-partition RocksDB/HDFS stores inside
  * the checkpoint, and THIS is the production way to look at it: a
  * batch read over the committed state files, no running query
  * required, parallel across state partitions.
  *
  * Use cases: verifying what a stateful operator actually retained
  * (watermark bugs show up as unexpected rows here), sizing state
  * before a replay, and migrating state between query versions.
  */
object StateInspect {

  /** Committed state rows of one operator at the latest batch:
    * `key struct<...>, value struct<...>, partition_id int`.
    */
  def state(spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0): DataFrame =
    spark.read.format("statestore")
      .option("operatorId", operatorId)
      .load(checkpointDir)

  /** Operator/store topology of a checkpoint: operator ids and names,
    * store names, partition counts, min/max usable batch ids.
    */
  def metadata(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.format("state-metadata").load(checkpointDir)
}
