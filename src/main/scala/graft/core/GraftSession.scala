package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (`local[N]`, N from
  * SPARK_GRAFT_CPUS); on a real cluster the same builder settings apply
  * except `master`, which spark-submit provides. Shuffle partitions match
  * core count locally — on a 1000-executor cluster this would be set to
  * ~2-3x total cores (AQE coalesces down as needed).
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.parquet is TIMESTAMP(NANOS); set once here instead of
      // mutating the live session from inside a table loader
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
