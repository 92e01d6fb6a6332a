package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters aggregate (Space-Saving sketch, Metwally et al. 2005) as
  * a TypedImperativeAggregate — the raw-buffer Catalyst aggregate tier
  * used for sketch state that is not expressible as pure expressions
  * (cf. the ModeAggregator, which shows the higher-level Aggregator API).
  *
  * Buffer: value -> count map capped at `capacity`; on overflow the
  * minimum-count entry is evicted and its count inherited (the standard
  * space-saving overestimate). While distinct values <= capacity the
  * counts are EXACT, which is what the SQL oracle checks on bounded-
  * cardinality columns; at 100 TB cardinalities the same operator
  * degrades gracefully to approximate heavy hitters with bounded error.
  * Partial aggregation applies: each map task ships one small map.
  *
  * eval returns array<struct<value string, cnt long>> — top k by
  * (count desc, value asc), a total order.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(SpaceSavingTopK.entryType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], v: String, n: Long): Unit = {
    buf.get(v) match {
      case Some(c) => buf.update(v, c + n)
      case None if buf.size < capacity => buf.update(v, n)
      case None =>
        // evict the minimum, inherit its count (deterministic min:
        // smallest count, then largest value so small values survive)
        val (mv, mc) = buf.minBy { case (value, c) => (c, value) }
        buf.remove(mv)
        buf.update(v, mc + n)
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.toSeq.sortBy { case (v, c) => (-c, v) }.foreach { case (v, c) => add(b1, v, c) }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
    new GenericArrayData(top.map { case (v, c) =>
      InternalRow(UTF8String.fromString(v), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) => out.writeUTF(v); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ => val v = in.readUTF(); buf.update(v, in.readLong()) }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_top_k"
}

object SpaceSavingTopK {
  val entryType: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
}
