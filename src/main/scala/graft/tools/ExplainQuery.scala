package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Developer plan inspector: print the EXECUTED formatted plan of a
  * catalog query (AQE final plan — run first, then explain) plus the
  * number of FileScan/Exchange/ReusedExchange nodes.
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <q1,q2,...>
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // execute THIS QueryExecution (df.count() would plan a separate
      // one and leave this plan isFinalPlan=false) so the printed
      // AdaptiveSparkPlan is the final, stage-reused runtime plan
      df.queryExecution.executedPlan.executeCollect()
      val raw = df.queryExecution.executedPlan.toString
      // an executed AdaptiveSparkPlan prints final AND initial plans;
      // keep only the final section so node counts aren't inflated
      val plan =
        if (raw.contains("== Initial Plan =="))
          raw.substring(0, raw.indexOf("== Initial Plan =="))
        else raw
      println(s"===== $name =====")
      println(plan)
      def n(pat: String) = pat.r.findAllIn(plan).size
      println(s"[counts] FileScan=${n("FileScan")} Exchange=${n("Exchange")} " +
        s"ReusedExchange=${n("ReusedExchange")} " +
        s"BroadcastHashJoin=${n("BroadcastHashJoin")} " +
        s"SortMergeJoin=${n("SortMergeJoin")} BNLJ=${n("BroadcastNestedLoop")}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
