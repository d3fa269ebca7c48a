package graft.tools

import org.apache.spark.sql.SparkSession

/** Developer timing harness: time a subset of the SparkEntry catalog
  * without a full Bench run.
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> <passes> <q1,q2,...>
  * Each query is warmed once, then timed <passes> times; prints one
  * JSON line per query with min/median. Same session conf as Bench so
  * numbers are comparable.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, passesS, names) = args
    val passes = passesS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drop(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { _ => fn(spark, sfDir).count(); drop() }
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        drop()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.size / 2)
      println(f"""{"query":"$name","min":${ts.min}%.3f,"median":$med%.3f}""")
    }
    spark.stop()
  }
}
