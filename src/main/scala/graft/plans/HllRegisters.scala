package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register aggregate (Flajolet et al. 2007) as a
  * TypedImperativeAggregate — the second raw-buffer sketch next to
  * [[SpaceSavingTopK]], and the fully-verifiable twin of Spark's builtin
  * `approx_count_distinct` (B18): because the input is the portable
  * 60-bit md5 hash ([[graft.functions.GraftFunctions.hash60]]) and the
  * register math is pure integer ops, a SQL oracle can rebuild the EXACT
  * register array and estimate, not just a ballpark.
  *
  * Input: a 60-bit non-negative LONG hash. Register layout: p=6 →
  * m=64 registers; bucket = low 6 bits, rho = run-length position of the
  * highest set bit in the remaining 54 bits (rho = 55 - bitlen(rem),
  * rem=0 → 54 so the indicator exponent 54-M stays non-negative and
  * Σ 2^(54-M_j) is an exact BIGINT — no float summation to diverge
  * between engines).
  *
  * Scale: the buffer is 64 ints; partial aggregation ships one tiny
  * array per map task and merge is elementwise max — the canonical
  * mergeable-sketch shape for a 1000-executor count-distinct.
  */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with ImplicitCastInputTypes {

  private val m = 64 // registers (p = 6)

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h & (m - 1)).toInt
      val rem = h >>> 6 // 54 significant bits
      val rho =
        if (rem == 0L) 54
        else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(m * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(m)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_hll"
}
