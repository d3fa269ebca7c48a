package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-count aggregate + set algebra.
  *
  * Why theta over HLL (which Spark 4 already binds, see stat_hll_union):
  * HLL sketches UNION cheaply but cannot INTERSECT; theta sketches
  * support union/intersection/difference — the "audience overlap"
  * pattern: build one sketch per segment ONCE, then answer
  * |A ∩ B|-style questions at query time from the sketches alone, no
  * rescan of the fact table. Partial state per (partition, group) is
  * ≤ 2^lgK hashes regardless of input size.
  *
  * While the true distinct count stays below the nominal 2^lgK
  * entries the sketch retains every hash and estimates are EXACT —
  * the regime the oracle query checks; the spec covers the sampling
  * regime's error bound.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaSketchAgg = copy(child = c(0))
}

object ThetaSketch {
  /** Aggregate a string column into a compact theta sketch (binary). */
  def thetaSketch(col: Column, lgK: Int = 14): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(col), lgK)
        .toAggregateExpression())

  /** Scalar: estimated |A ∩ B| from two serialized sketches. */
  val thetaIntersectEst = udf((a: Array[Byte], b: Array[Byte]) => {
    val i: Intersection = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapSketch(Memory.wrap(a)))
    i.intersect(Sketches.wrapSketch(Memory.wrap(b)))
    math.round(i.getResult.getEstimate)
  })

  /** Scalar: estimated distinct count of one serialized sketch. */
  val thetaEst = udf((a: Array[Byte]) =>
    math.round(Sketches.wrapSketch(Memory.wrap(a)).getEstimate))
}
