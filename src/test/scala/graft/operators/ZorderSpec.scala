package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Differential test for [[PartitionedOps.q57ZorderLayout]]: Morton
  * interleave, tiling, and bounding boxes recomputed in plain driver
  * Scala (bit twiddling, no Spark expressions), plus the layout
  * property the operator exists to demonstrate — z-order tiles bound
  * BOTH dimensions, a single-column sort only one.
  */
class ZorderSpec extends SparkSuite {

  private def morton(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("z-order tile stats match an independent driver recompute") {
    val keys = graft.core.Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0) % 65536L, r.getLong(1) % 65536L))

    val expected = keys
      .groupBy { case (x, y) => morton(x, y) / 16777216L }
      .map { case (tile, pts) =>
        val xs = pts.map(_._1); val ys = pts.map(_._2)
        (tile, pts.length.toLong, xs.min, xs.max, ys.min, ys.max,
          (xs.max - xs.min + 1) * (ys.max - ys.min + 1))
      }.toSeq.sortBy(_._1)

    val got = PartitionedOps.q57ZorderLayout(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq

    assert(got == expected)
  }

  test("z-order tiles bound both dimensions tighter than a 1-D sort") {
    // the point of the layout: with the same number of buckets, tiles
    // cut from the Morton order bound BOTH dims, while buckets cut
    // from an x-only sort leave y unbounded — a point query on the
    // un-sorted dimension then touches EVERY file. The planner-visible
    // metric is per-dimension fan-out: the sum of bucket ranges along
    // a dim ~ how many buckets a point query on that dim hits. Judge
    // the WORST dimension (total area sums are equal on uniform data
    // — the curve trades per-dim tightness, it doesn't create it).
    // Deterministic seeded points over the full 16-bit domain: the
    // sf0.001 fixture's suppkey has only ~10 distinct values, which
    // bounds every y-range by 10 and makes ANY layout look fine.
    val rnd = new scala.util.Random(42)
    val keys = Array.fill(4096)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    def worstFanout(buckets: Iterable[Array[(Long, Long)]]): BigInt = {
      val xs = buckets.map(p => BigInt(p.map(_._1).max - p.map(_._1).min + 1)).sum
      val ys = buckets.map(p => BigInt(p.map(_._2).max - p.map(_._2).min + 1)).sum
      xs.max(ys)
    }
    val nB = 16
    val zSorted = keys.sortBy { case (x, y) => (morton(x, y), x, y) }
    val xSorted = keys.sortBy(identity)
    def cut(a: Array[(Long, Long)]): Iterable[Array[(Long, Long)]] =
      a.grouped(math.max(1, a.length / nB + 1)).toSeq
    val zWorst = worstFanout(cut(zSorted))
    val xWorst = worstFanout(cut(xSorted))
    info(s"worst-dim fan-out: zorder=$zWorst vs x-sort=$xWorst")
    assert(zWorst * 2 < xWorst,
      s"z-order worst-dim fan-out ($zWorst) should at least halve " +
        s"the x-sort's ($xWorst)")
  }
}
