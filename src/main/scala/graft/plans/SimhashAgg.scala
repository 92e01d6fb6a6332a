package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** SimHash fold as ONE aggregate: `graft_simhash(hvCol, bits)` keeps the
  * `bits` per-bit vote counters in a single primitive buffer and emits
  * the finished sketch long (bit b set iff the count of set bits exceeds
  * half the updates — i.e. sum over tokens of (2*bit_b(hv)-1) > 0,
  * exactly the semantics of the expression-tier
  * [[graft.operators.Dedup.simhash32]] formulation it accelerates).
  *
  * Why an imperative aggregate: the expression form is `bits` separate
  * SUM columns — 60 aggregation buffers and 60 expression trees per
  * group. Here the whole sketch is one buffer of `bits` ints updated in
  * a tight loop, one aggregate path, still partial-aggregation friendly
  * (map-side combine ships one small array per group).
  *
  * Counter width: Int — vote totals are bounded by tokens-per-document,
  * and 2^31 tokens in ONE document is beyond any real corpus row.
  */
case class SimhashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with ImplicitCastInputTypes {

  require(bits > 0 && bits <= 60, "bits must be in 1..60 (hash60 width)")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (((hv >>> b) & 1L).toInt << 1) - 1 // +1 if bit set, else -1
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var b = 0
    while (b < bits) { b1(b) += b2(b); b += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var h = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) h |= 1L << b
      b += 1
    }
    h
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 * bits)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeInt)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(bits)(in.readInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_simhash"
}
