package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so generated code and interpreted eval share one body. */
object RollingHashUtil {
  val Prime: Long = 1000000007L
  val Base: Long = 31L

  /** Karp-Rabin polynomial hash over the string's code points:
    * h = fold(0, (a, c) => (a*31 + c) mod p). Equivalent to DuckDB's
    * `list_reduce(codepoints, (a,b) -> (a*31+b) % p)` because
    * 0*31 + c0 = c0 (fold-with-zero ≡ reduce-from-first here).
    */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Prime
      i += Character.charCount(cp)
    }
    h
  }
}

/** Native rolling-hash (Karp-Rabin) document fingerprint expression —
  * the rolling-hash fingerprinting primitive of the text-analysis
  * suite, as a codegen'd Catalyst expression (SURVEY §7.3 extension
  * point (b)). Null-preserving; output in [0, 1000000007).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    RollingHashUtil.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHashUtil.compute($c)")

  override protected def withNewChildInternal(c: Expression): RollingHash =
    copy(child = c)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
