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

/** Native top-k-by-score aggregate: keeps a bounded min-heap of
  * (score, id) per group, merges heaps map-side, and emits the ids in
  * rank order (score desc, id asc tiebreak).
  *
  * This is the aggregate form of "top-K films" (`Explorativa2.ipynb`
  * cells 5-9, done there with window + filter): as a
  * TypedImperativeAggregate the partial state crossing the shuffle is
  * k pairs per (partition, group) — independent of input size — where
  * the window formulation must shuffle every row of the group. At
  * 100 TB with a handful of groups, that is the difference between a
  * k-row exchange and a full-table exchange.
  *
  * Registered in SQL as `topk_ids(score, id, k)` via
  * [[graft.core.GraftExtensions]].
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ExpectsInputTypes {

  // k must be a constant: it sizes every buffer in the aggregation
  private lazy val kVal: Int = k.eval().asInstanceOf[Number].intValue()

  // Mirror built-in aggregates (approx_percentile): a non-foldable or
  // null k fails at ANALYSIS, not as an executor NPE from kVal.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!k.foldable)
      TypeCheckFailure("topk_ids: k must be a constant (foldable) expression")
    else if (k.eval() == null)
      TypeCheckFailure("topk_ids: k must not be null")
    else if (k.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckFailure("topk_ids: k must be positive")
    else TypeCheckSuccess
  }

  // dequeue order = "worst first": lowest score, then largest id
  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  // AbstractDataType is private[sql]; the inferred Seq[DataType] conforms
  override def inputTypes = Seq(DoubleType, LongType, IntegerType)

  override def children: Seq[Expression] = Seq(score, id, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < kVal) buf.enqueue(e)
    else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(
      buf.toSeq.sortBy { case (s, i) => (-s, i) }.map(_._2).toArray)

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble(); val i = in.readLong()
      buf.enqueue((s, i))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), k = newChildren(2))
}

object TopKByScore {
  /** DataFrame-API form: `topkIds($"score", $"id", 3)`. */
  def topkIds(score: Column, id: Column, k: Int): Column =
    topkIdsExpr(score, id, ColumnBridge.column(Literal(k)))

  /** Column-k form; k must still be a non-null constant (enforced at
    * analysis by checkInputDataTypes). */
  def topkIdsExpr(score: Column, id: Column, k: Column): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score),
        ColumnBridge.expression(id),
        ColumnBridge.expression(k)).toAggregateExpression())
}
