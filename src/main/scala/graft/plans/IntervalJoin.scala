package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.DataType

/** Interval (range) join as a first-class operator — logical plan +
  * optimizer rule + planner strategy + physical exec, the full custom-
  * operator stack registered through `spark.experimental` or
  * [[graft.core.GraftExtensions]].
  *
  * Why: open-source Spark plans `fact JOIN dim ON p >= lo AND p < hi`
  * as BroadcastNestedLoopJoin — every probe row scans every interval,
  * O(|fact| x |dim|). This operator builds a lo-sorted interval index
  * with a prefix-max-hi array from the (small, broadcast) dim side and
  * answers each probe in O(log |dim| + matches): binary-search the
  * rightmost lo <= p, then walk left only while some interval can
  * still contain p. The fact side never shuffles or sorts — the probe
  * stays partition-local — so at 100 TB x 10k intervals this is the
  * difference between one pass over the fact table and 10,000.
  *
  * Reference analog: age binning and zip->state range lookup
  * (`app3/live_counts.py:52-61`, `Explorativa1_pyspark.ipynb:230-249`)
  * — both tiny dims here, but the operator is what makes the same
  * query shape survive a dim with thousands of ranges.
  */
object IntervalJoin {

  /** Marker logical node produced by [[RewriteRule]]. */
  final case class IntervalJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      probe: Expression, lo: Attribute, hi: Attribute,
      loStrict: Boolean, hiStrict: Boolean,
      joinType: JoinType)
    extends BinaryNode {
    override def output: Seq[Attribute] = joinType match {
      case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
      case _ => left.output ++ right.output
    }
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Rewrites a qualifying Join into [[IntervalJoinPlan]]. Conservative
    * match: inner/left-outer, condition is EXACTLY a lower and an upper
    * bound on the same fact-side expression against two dim-side
    * attributes, all three the same type, and the dim side is
    * broadcast-hinted (the index lives on every task, so smallness is
    * the user's promise — same contract as `broadcast()`).
    */
  object RewriteRule extends Rule[LogicalPlan] {
    // AtomicType only: the exec orders runtime values with Catalyst's
    // interpreted ordering, and non-scalar orderable types (array/
    // struct) as well as exotic equal-but-distinct cases are exactly
    // where a silent rewrite could diverge from the stock join. Those
    // fall through to Spark's own BroadcastNestedLoopJoin.
    private def sameType(a: DataType, b: DataType): Boolean =
      a == b && org.apache.spark.sql.graftbridge.ColumnBridge.isAtomic(a)

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case j @ Join(l, r, jt @ (Inner | LeftOuter), Some(cond), hint)
          if hint.rightHint.exists(_.strategy.exists(
            _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) =>
        val conjuncts = splitConjuncts(cond)
        matchBounds(conjuncts, l, r) match {
          case Some((probe, lo, hi, loStrict, hiStrict))
              if sameType(probe.dataType, lo.dataType) &&
                sameType(probe.dataType, hi.dataType) =>
            IntervalJoinPlan(l, r, probe, lo, hi, loStrict, hiStrict, jt)
          case _ => j
        }
    }

    private def splitConjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
      case other => Seq(other)
    }

    /** Orients two comparison conjuncts into (probe, lo, hi, strictness).
      * probe must reference only the left plan; lo/hi must be right-side
      * attributes.
      */
    private def matchBounds(cs: Seq[Expression], l: LogicalPlan,
        r: LogicalPlan): Option[(Expression, Attribute, Attribute, Boolean, Boolean)] = {
      if (cs.length != 2) return None
      def fromLeft(e: Expression) = e.references.subsetOf(l.outputSet) &&
        e.references.nonEmpty && e.deterministic
      def rightAttr(e: Expression): Option[Attribute] = e match {
        case a: Attribute if r.outputSet.contains(a) => Some(a)
        case _ => None
      }
      // normalize each conjunct to (probe op bound) with op in {>=, >, <, <=}
      case class Bound(probe: Expression, attr: Attribute,
          isLower: Boolean, strict: Boolean)
      def norm(e: Expression): Option[Bound] = e match {
        case GreaterThanOrEqual(p, b) if fromLeft(p) =>
          rightAttr(b).map(Bound(p, _, isLower = true, strict = false))
        case GreaterThan(p, b) if fromLeft(p) =>
          rightAttr(b).map(Bound(p, _, isLower = true, strict = true))
        case LessThan(p, b) if fromLeft(p) =>
          rightAttr(b).map(Bound(p, _, isLower = false, strict = true))
        case LessThanOrEqual(p, b) if fromLeft(p) =>
          rightAttr(b).map(Bound(p, _, isLower = false, strict = false))
        // reversed orientations: lo <= p, hi > p, ...
        case LessThanOrEqual(b, p) if fromLeft(p) =>
          rightAttr(b).map(Bound(p, _, isLower = true, strict = false))
        case LessThan(b, p) if fromLeft(p) =>
          rightAttr(b).map(Bound(p, _, isLower = true, strict = true))
        case GreaterThan(b, p) if fromLeft(p) =>
          rightAttr(b).map(Bound(p, _, isLower = false, strict = true))
        case GreaterThanOrEqual(b, p) if fromLeft(p) =>
          rightAttr(b).map(Bound(p, _, isLower = false, strict = false))
        case _ => None
      }
      (norm(cs(0)), norm(cs(1))) match {
        case (Some(a), Some(b))
            if a.isLower != b.isLower && a.probe.semanticEquals(b.probe) =>
          val (loB, hiB) = if (a.isLower) (a, b) else (b, a)
          Some((loB.probe, loB.attr, hiB.attr, loB.strict, hiB.strict))
        case _ => None
      }
    }
  }

  /** Plans [[IntervalJoinPlan]] as [[IntervalJoinExec]]. */
  object JoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case IntervalJoinPlan(l, r, probe, lo, hi, loS, hiS, jt) =>
        IntervalJoinExec(probe, lo, hi, loS, hiS, jt,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Physical interval join: dim side collected once, sorted by lo,
    * augmented with a running max of hi; probes binary-search lo and
    * walk left while the prefix max-hi can still cover the probe.
    */
  final case class IntervalJoinExec(
      probe: Expression, lo: Attribute, hi: Attribute,
      loStrict: Boolean, hiStrict: Boolean, joinType: JoinType,
      left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

    override def output: Seq[Attribute] = joinType match {
      case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
      case _ => left.output ++ right.output
    }

    override protected def doExecute(): RDD[InternalRow] = {
      // Catalyst's interpreted ordering, NOT Comparable.compareTo: for
      // doubles Spark's >=/< compare -0.0 == 0.0 (SQLOrderingUtil)
      // where Double.compareTo orders them, and the same instance
      // covers every atomic type the rule admits. Local val so task
      // closures never capture the SparkPlan.
      val ord = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(probe.dataType)
      val cmp: (Any, Any) => Int = (a, b) => ord.compare(a, b)
      val loBound = BindReferences.bindReference(lo: Expression, right.output)
      val hiBound = BindReferences.bindReference(hi: Expression, right.output)
      val dim = right.executeCollect()
      // sort intervals by lo; prefixMaxHi[i] = max hi over [0..i]
      val sorted = dim
        .map(r => (loBound.eval(r), hiBound.eval(r), r))
        .filter(t => t._1 != null && t._2 != null)
        .sortWith((x, y) => cmp(x._1, y._1) < 0)
      val prefixMaxHi = new Array[Any](sorted.length)
      var running: Any = null
      var i = 0
      while (i < sorted.length) {
        if (running == null || cmp(sorted(i)._2, running) > 0)
          running = sorted(i)._2
        prefixMaxHi(i) = running
        i += 1
      }
      val bcIndex = sparkContext.broadcast((sorted, prefixMaxHi))
      val loStrictL = loStrict
      val hiStrictL = hiStrict
      val isOuter = joinType == LeftOuter
      val rightWidth = right.output.size
      val probeExpr = BindReferences.bindReference(probe, left.output)

      left.execute().mapPartitions { iter =>
        val (idx, maxHi) = bcIndex.value
        val joined = new JoinedRow
        // bind against `output` (right side nullability-adjusted for
        // LeftOuter): binding against the child attrs would declare the
        // null-row fields non-nullable and codegen would read them as 0
        val proj = UnsafeProjection.create(output, output)
        val nullRight = new GenericInternalRow(rightWidth)
        def matches(p: Any): Iterator[InternalRow] = {
          if (idx.isEmpty) return Iterator.empty
          // rightmost index with lo <= p (or lo < p when loStrict)
          var leftB = 0; var rightB = idx.length - 1; var pos = -1
          while (leftB <= rightB) {
            val mid = (leftB + rightB) >>> 1
            val c = cmp(idx(mid)._1, p)
            val ok = if (loStrictL) c < 0 else c <= 0
            if (ok) { pos = mid; leftB = mid + 1 } else rightB = mid - 1
          }
          if (pos < 0) return Iterator.empty
          val buf = ArrayBuffer.empty[InternalRow]
          var k = pos
          var continue = true
          while (k >= 0 && continue) {
            // no interval at or before k can reach p: stop
            val reach = cmp(maxHi(k), p)
            if (if (hiStrictL) reach <= 0 else reach < 0) continue = false
            else {
              val c = cmp(idx(k)._2, p)
              if (if (hiStrictL) c > 0 else c >= 0) buf += idx(k)._3
              k -= 1
            }
          }
          buf.iterator
        }
        iter.flatMap { lrow =>
          val p = probeExpr.eval(lrow)
          val ms = if (p == null) Iterator.empty else matches(p)
          if (ms.hasNext) ms.map(r => proj(joined(lrow, r)))
          else if (isOuter) Iterator.single(proj(joined(lrow, nullRight)))
          else Iterator.empty
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotently registers the rule + strategy on a LIVE session (the
    * extensions path in [[graft.core.GraftExtensions]] covers sessions
    * built with `.withExtensions`).
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRule
    if (!spark.experimental.extraStrategies.contains(JoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ JoinStrategy
  }
}

/** Catalog query driving [[IntervalJoin]] on testdata. */
object IntervalJoinQueries {
  import org.apache.spark.sql.{DataFrame, functions => F}
  import graft.core.Tables

  /** Orders binned into 2,000 price intervals via the custom operator
    * (the dim is wide enough that the stock BroadcastNestedLoopJoin
    * does 2,000 comparisons per order where the index does ~11).
    * Interval bounds are exact multiples of 300, so Spark and DuckDB
    * agree bit-for-bit on the double comparisons.
    */
  def q31IntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    IntervalJoin.install(spark)
    val step = 300.0
    val dim = spark.range(0, 2000).select(
      F.col("id").as("bin"),
      (F.col("id") * step).cast("double").as("lo"),
      ((F.col("id") + 1) * step).cast("double").as("hi"))
    val o = Tables.orders(spark, sfDir)
    o.join(F.broadcast(dim),
        o("o_totalprice") >= dim("lo") && o("o_totalprice") < dim("hi"))
      .groupBy("bin")
      .agg(F.count(F.lit(1)).as("n"),
        F.round(F.sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("bin")
  }

  val q31Sql: String =
    """SELECT bin, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders JOIN (
      |  SELECT i AS bin, i * 300.0 AS lo, (i + 1) * 300.0 AS hi
      |  FROM generate_series(0, 1999) AS t(i)) dim
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY bin
      |ORDER BY bin""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Seq(("q31_interval_join", q31IntervalJoin _, q31Sql))
}
