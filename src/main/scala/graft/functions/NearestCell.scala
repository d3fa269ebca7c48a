package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd IVF cell assignment: index of the nearest centroid
  * (squared L2, strict-< first-wins tie-break — the exact contract of
  * the driver-side Lloyd assignment and the SQL oracles' row_number
  * argmin) over a centroid table embedded in the expression.
  *
  * Replaces the closure UDF the IVF family used for corpus assignment
  * (`udf { v => nearestCell(cents, v) }`): the UDF deserialized every
  * row's array into a `Seq[Double]`, boxed each element, and fenced
  * whole-stage codegen at the widest stage of the ANN pipeline. This
  * expression reads the unsafe array buffer directly inside the
  * generated loop — no boxing, no codegen fence.
  *
  * The centroid table is plan-embedded data (16–64 cells × 64 dims ≈
  * 8–32 KB), shipped to executors once per stage with the serialized
  * plan — the same transport a `lit(array(...))` literal gets, without
  * the 4096-term expression-tree pathology a literal formulation showed
  * in the LSH family (SURVEY §4 C11). Reference behavior: the flat IVF
  * assignment loop of the reference's ANN module (`reference` ann
  * index build — assign each vector to its nearest coarse centroid).
  *
  * Null if the input is null OR any element is null (standard SQL
  * semantics — the unsafe buffer would otherwise read a null element
  * as 0.0 and return a wrong cell); a length mismatch against the
  * centroid dim is a hard error (a build bug, not a data condition).
  */
case class NearestCell(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "nearest_cell needs at least one centroid")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell expects array<double> input, got " +
            other.catalogString)
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // null input OR null element

  /** Flattened row-major copy for the generated code: one reference
    * object, cache-linear scan order. */
  @transient private lazy val flat: Array[Double] = {
    val d = cents(0).length
    val out = new Array[Double](cents.length * d)
    var c = 0
    while (c < cents.length) {
      System.arraycopy(cents(c), 0, out, c * d, d); c += 1
    }
    out
  }
  private def dim: Int = cents(0).length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    require(n == dim,
      s"nearest_cell: input dim $n != centroid dim $dim")
    // a null ELEMENT nulls the whole result (standard SQL semantics;
    // the unsafe buffer would otherwise silently read it as 0.0 and
    // return a wrong cell)
    var i0 = 0
    while (i0 < n) { if (v.isNullAt(i0)) return null; i0 += 1 }
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0; val off = c * dim
      while (i < n) {
        val t = v.getDouble(i) - flat(off + i); d += t * t; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cents", flat, "double[]")
    val nCells = cents.length
    val d = dim
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val dist = ctx.freshName("dist")
      val bestD = ctx.freshName("bestD")
      val t = ctx.freshName("t")
      s"""
         |if ($v.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "nearest_cell: input dim " + $v.numElements() + " != $d");
         |}
         |for (int $j = 0; $j < $d; $j++) {
         |  if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  double $bestD = Double.MAX_VALUE;
         |  ${ev.value} = 0;
         |  for (int $c = 0; $c < $nCells; $c++) {
         |    double $dist = 0.0;
         |    final int $off = $c * $d;
         |    for (int $i = 0; $i < $d; $i++) {
         |      final double $t = $v.getDouble($i) - $flatRef[$off + $i];
         |      $dist += $t * $t;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; ${ev.value} = $c; }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCell = copy(child = newChild)

  override def prettyName: String = "nearest_cell"

  // centroid arrays compare by reference under case-class equality;
  // value semantics keep plan canonicalization / spec assertions sane
  override def equals(other: Any): Boolean = other match {
    case NearestCell(oc, ocents) =>
      oc == child && ocents.length == cents.length &&
        cents.indices.forall(i =>
          java.util.Arrays.equals(cents(i), ocents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + cents.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

object NearestCell {
  /** Column-level entry point: `nearest_cell(vec)` against a fixed
    * centroid table. */
  def nearestCell(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(v), cents))
}
