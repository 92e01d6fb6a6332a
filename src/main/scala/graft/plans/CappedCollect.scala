package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-buffer id collector: `graft_capped_collect(idCol, capPlus1)`
  * gathers at most `capPlus1` DISTINCT-per-group long ids and then stops
  * accepting — the third TypedImperativeAggregate tier next to
  * [[SpaceSavingTopK]] and [[HllRegisters]].
  *
  * Purpose: a `collect_list` whose per-group memory is a hard constant.
  * The n-gram-Jaccard df-cap needs each shingle's posting list ONLY when
  * the shingle is rare (df <= cap); a stop-phrase with a billion postings
  * must cost O(cap), not O(df), per aggregation buffer. A full
  * `collect_list` + post-filter would buffer the billion before dropping
  * them — this operator never holds more than capPlus1 longs, and a group
  * that reaches capPlus1 is thereby marked "over cap" (callers filter
  * `size(ids) <= cap`). Partial aggregation applies: map-side buffers cap
  * themselves the same way before shuffling.
  *
  * eval sorts ascending, so the emitted array is deterministic whatever
  * the collection order (and `a < b` pair generation can slice it
  * directly). Precondition: input rows are distinct per group (a dup
  * would both double-collect and miscount toward the cap).
  */
case class CappedCollect(
    child: Expression,
    capPlus1: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]]
    with ImplicitCastInputTypes {

  require(capPlus1 > 0, "capPlus1 must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[Long], input: InternalRow): mutable.ArrayBuffer[Long] = {
    if (buf.length < capPlus1) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(
      b1: mutable.ArrayBuffer[Long],
      b2: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val room = capPlus1 - b1.length
    if (room > 0) b1 ++= b2.take(room)
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.sorted.toArray)

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[Long]
    (1 to n).foreach(_ => buf += in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollect =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_capped_collect"
}
