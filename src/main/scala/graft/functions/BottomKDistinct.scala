package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native "k smallest DISTINCT values" aggregate — the cap-at-insert
  * form of `slice(array_sort(collect_set(x)), 1, k)`.
  *
  * Born for the item-graph family's shared per-user cap (r15): the
  * prelude's former `distinct() + row_number window` shape cost TWO
  * exchanges (one clustered on (user, item) for the distinct, one on
  * user for the window), and the obvious one-exchange rewrite via
  * `collect_set` is not 100 TB-safe — collect_set buffers EVERY
  * distinct item of a key before the slice, so one crawler user with
  * 10M items holds a 10M-entry buffer. This aggregate keeps a bounded
  * sorted set per group: an insert past `k` evicts the largest, so
  * update, merge (map-side combine!) and the shuffled partial state
  * are all O(k) — independent of how pathological the key is — and
  * the result is bit-identical to the window formulation (smallest k
  * distinct values, ascending).
  *
  * Registered in SQL as `bottomk_distinct(x, k)` via
  * [[graft.core.GraftExtensions]].
  */
case class BottomKDistinct(
    child: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with ExpectsInputTypes {

  // k must be a constant: it sizes every buffer in the aggregation
  private lazy val kVal: Int = k.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!k.foldable)
      TypeCheckFailure(
        "bottomk_distinct: k must be a constant (foldable) expression")
    else if (k.eval() == null)
      TypeCheckFailure("bottomk_distinct: k must not be null")
    else if (k.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckFailure("bottomk_distinct: k must be positive")
    else TypeCheckSuccess
  }

  override def inputTypes = Seq(LongType, IntegerType)

  override def children: Seq[Expression] = Seq(child, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def offer(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < kVal) buf += v
    else if (v < buf.last && buf.add(v)) buf -= buf.last

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf += in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(child = newChildren(0), k = newChildren(1))
}

object BottomKDistinct {
  /** DataFrame-API form: `bottomkDistinct($"item", 64)` — ascending
    * array of the k smallest distinct non-null values. */
  def bottomkDistinct(child: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKDistinct(ColumnBridge.expression(child),
        Literal(k)).toAggregateExpression())
}
