package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.{Entities, TypedTables}

/** Typed `Dataset[T]` surface (SURVEY §1.1 / §2.9 extension point):
  * case-class entities, a custom `Aggregator[IN, BUF, OUT]`, and
  * `groupByKey` — the API a library consumer uses when compile-time
  * row types matter.
  *
  * Scale tradeoff, demonstrated and tested: the typed FILTER here is a
  * column expression, so it still reaches the parquet scan as a pushed
  * filter; `groupByKey(_.field)` + Aggregator shuffles the key plus
  * the aggregator's partial buffer only (map-side partial aggregation
  * applies to typed Aggregators too). What is sacrificed is COLUMN
  * PRUNING on the aggregated side — the Aggregator's reduce sees the
  * whole case class, so the scan reads every Lineitem field. That is
  * why the engine's default surface is the DataFrame API and the typed
  * path is opt-in for type-safety-critical logic.
  */
object TypedOps {
  import Entities.Lineitem

  /** Aggregation buffer: all-integer-exact stats (quantity is
    * integer-valued in the data, so the double sum is exact and
    * order-independent — oracle-safe without rounding games). */
  final case class QtyStats(n: Long, sumQty: Double, maxPrice: Double)

  /** Typed per-group stats: count, total quantity, max price. */
  object QtyStatsAgg extends Aggregator[Lineitem, QtyStats, QtyStats] {
    override def zero: QtyStats = QtyStats(0L, 0.0, Double.NegativeInfinity)
    override def reduce(b: QtyStats, a: Lineitem): QtyStats =
      QtyStats(b.n + 1, b.sumQty + a.l_quantity,
        math.max(b.maxPrice, a.l_extendedprice))
    override def merge(x: QtyStats, y: QtyStats): QtyStats =
      QtyStats(x.n + y.n, x.sumQty + y.sumQty,
        math.max(x.maxPrice, y.maxPrice))
    override def finish(r: QtyStats): QtyStats = r
    override def bufferEncoder: Encoder[QtyStats] = Encoders.product[QtyStats]
    override def outputEncoder: Encoder[QtyStats] = Encoders.product[QtyStats]
  }

  /** Typed pipeline: schema-asserted Dataset[Lineitem] → column-expr
    * filter (pushdown survives) → groupByKey on a field → custom
    * Aggregator. Returns a DataFrame for the catalog/oracle contract.
    */
  def q46TypedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TypedTables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 10) // column predicate: pushed down
      .groupByKey(_.l_returnflag)
      .agg(QtyStatsAgg.toColumn.name("stats"))
      .select(
        col("key").as("l_returnflag"),
        col("stats.n").as("n"),
        round(col("stats.sumQty"), 2).as("sum_qty"),
        col("stats.maxPrice").as("max_price"))
      .orderBy("l_returnflag")
  }

  val q46Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  max(l_extendedprice) AS max_price
      |FROM lineitem
      |WHERE l_quantity >= 10
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Seq(("q46_typed_agg", q46TypedAgg _, q46Sql))
}
