package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) aggregate on the DataSketches
  * Misra-Gries ItemsSketch: `freq_items(col, maxMapSize)` returns
  * `array<struct<item string, est bigint>>` sorted by estimate desc,
  * item asc.
  *
  * Why a sketch: exact top-terms over 100 TB is a full groupBy — a
  * shuffle of every distinct value. The ItemsSketch carries a
  * CONSTANT-size map per partition (maxMapSize entries), merges
  * map-side, and guarantees every item with frequency > N/maxMapSize
  * survives. When the true distinct count fits inside maxMapSize the
  * estimates are EXACT — which is what makes the catalog query
  * oracle-checkable against a plain count.
  *
  * Complements Spark 4's built-in DataSketches HLL functions (used in
  * stat_hll_union); Spark has no frequencies binding.
  */
case class FreqItemsSketch(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with ExpectsInputTypes {

  // the serde is stateless but NOT Serializable — construct on demand
  // so the expression itself stays serializable for task shipping
  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow)
      : ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String])
      : ItemsSketch[String] = buf.merge(other)

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        new GenericInternalRow(
          Array[Any](UTF8String.fromString(item), est))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqItemsSketch = copy(child = c(0))
}

object FreqItemsSketch {
  /** DataFrame-API form: `freqItems($"term", 64)`. */
  def freqItems(col: Column, maxMapSize: Int): Column =
    ColumnBridge.column(
      FreqItemsSketch(ColumnBridge.expression(col), maxMapSize)
        .toAggregateExpression())
}
