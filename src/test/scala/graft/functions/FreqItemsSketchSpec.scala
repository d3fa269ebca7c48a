package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FreqItemsSketchSpec extends SparkSuite {
  import spark.implicits._

  test("exact regime: distinct values fit the map, estimates are counts") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("v").repartition(8) // force partial sketches + merges
    val got = df.agg(FreqItemsSketch.freqItems(col("v"), 64).as("fi"))
      .select(explode(col("fi")).as("f"))
      .select("f.item", "f.est")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("overflow regime: the true heavy hitter still surfaces first") {
    // 300 distinct light items vs one item at 40% frequency, map of 16:
    // Misra-Gries guarantees any item with freq > N/maxMapSize survives
    val rows = (0 until 300).map(i => s"light_$i") ++ Seq.fill(200)("heavy")
    val got = rows.toDF("v").repartition(8)
      .agg(FreqItemsSketch.freqItems(col("v"), 16).as("fi"))
      .select(explode(col("fi")).as("f"))
      .select("f.item", "f.est")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty && got.head._1 == "heavy",
      s"heavy hitter not first: ${got.take(3).mkString(",")}")
    // estimate bounded: true count <= est <= true count + N/maxMapSize
    assert(got.head._2 >= 200L && got.head._2 <= 200L + 500L / 16 + 1)
  }

  test("partial aggregation: plan shows a two-phase sketch merge") {
    val plan = Seq("x").toDF("v")
      .agg(FreqItemsSketch.freqItems(col("v"), 8))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_freqitemssketch"),
      s"expected two-phase agg:\n$plan")
  }
}
