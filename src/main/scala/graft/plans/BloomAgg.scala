package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic Bloom filter aggregate `graft_bloom(hash, bits, k)` —
  * the third raw-buffer sketch next to [[HllRegisters]] and
  * [[SpaceSavingTopK]], and the fully-verifiable twin of
  * `DataFrameStatFunctions.bloomFilter` (q16 uses that one): because the
  * input is the portable 60-bit [[graft.functions.GraftFunctions.hash60]]
  * and the probe positions are pure integer arithmetic, a SQL oracle can
  * rebuild the EXACT word array, and a probe's result (including its
  * false positives) is a deterministic function of (seed, data) — the
  * property that makes bloom-based decontamination reproducible across
  * engines and runs.
  *
  * Probe positions by double hashing (Kirsch–Mitzenmacher): with
  * `h1 = h mod bits` and `h2 = (h >>> 30) | 1` (odd, hence coprime with
  * the power-of-two `bits`, so the probe sequence cycles through all
  * positions), position i is `(h1 + i * h2) mod bits` for i < k. All
  * operands stay below 2^35, so the arithmetic replays exactly in any
  * 64-bit SQL engine.
  *
  * Scale: the buffer is `bits/64` longs (one 1 MiB filter = 2^23 bits);
  * partial aggregation ships one word array per map task and merge is
  * elementwise OR — mergeable-sketch shape. The built filter is bounded
  * driver metadata (like a PQ codebook or k-means centroids): collect it
  * once, re-broadcast as a literal, and the probe side is scan-stage
  * column arithmetic — no shuffle join against the member set at all,
  * which is the whole point at 100 TB (probing 10^9 train shingles
  * against 10^7 eval shingles costs zero shuffle).
  */
case class BloomAgg(
    child: Expression,
    bits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bits must be a power of two >= 64, got $bits")
  require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")

  private val nWords = bits / 64

  /** The documented input domain is [[graft.functions.GraftFunctions.hash60]]
    * (non-negative, < 2^60). SQL registration cannot enforce that — any
    * LongType column type-checks — so the domain is enforced by masking:
    * a no-op for in-domain hashes (oracle arithmetic replays unchanged),
    * and for arbitrary longs (e.g. xxhash64 output) it keeps `h % bits`
    * non-negative instead of producing a negative probe position. */
  private val DomainMask = (1L << 60) - 1

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & DomainMask
      val h1 = h % bits
      val h2 = (h >>> 30) | 1L
      var i = 0
      while (i < k) {
        val pos = ((h1 + i * h2) % bits).toInt
        buf(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(nWords * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nWords)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_bloom"
}

object BloomAgg {

  /** Expand a collected word array into the per-position bit vector —
    * the driver-side step between building the filter and broadcasting
    * it back as a probe literal. */
  def toBits(words: Array[Long], bits: Int): Array[Boolean] = {
    val out = new Array[Boolean](bits)
    var p = 0
    while (p < bits) {
      out(p) = ((words(p >> 6) >>> (p & 63)) & 1L) == 1L
      p += 1
    }
    out
  }
}
