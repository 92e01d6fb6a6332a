package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing
  * extremely accurate quantiles using t-digests") as a
  * TypedImperativeAggregate: `graft_tdigest(col, p1, p2, ...)` returns
  * `array<double>` of quantile estimates.
  *
  * The digest keeps weighted centroids whose capacity shrinks near the
  * tails (the k1-style bound `4·n·δ⁻¹·q(1-q) + 1`), so rank error is
  * proportional to q(1-q): tight at the extremes, ~δ⁻¹ at the median.
  * State is O(δ) per group regardless of value cardinality — the
  * buffer-bounded alternative to exact `percentile`'s grow-with-distincts
  * list, and unlike Spark's builtin GK `approx_percentile` the buffers
  * here MERGE losslessly-in-size (map-side partial digests combine into
  * one δ-bounded digest), which is what a 100 TB shuffle needs.
  *
  * Estimates are order-sensitive (centroid boundaries depend on merge
  * order), so cross-engine checks use tolerance contracts, not hashes —
  * the same q104 pattern.
  */
case class TDigestAgg(
    child: Expression,
    percentiles: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestBuffer]
    with ImplicitCastInputTypes {

  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0.0 && p <= 1.0),
    "percentiles must be in [0, 1]")
  require(compression >= 20, "compression must be >= 20")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TDigestBuffer = new TDigestBuffer(compression)

  override def update(buf: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1L)
    buf
  }

  override def merge(b1: TDigestBuffer, b2: TDigestBuffer): TDigestBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: TDigestBuffer): Any =
    new GenericArrayData(percentiles.map(buf.quantile).toArray)

  override def serialize(buf: TDigestBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    TDigestBuffer.deserialize(bytes, compression)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_tdigest"
}

/** The digest state: sorted centroids (mean, weight) plus an unmerged
  * tail that amortizes compression. */
final class TDigestBuffer(compression: Int) {

  private var centroids = mutable.ArrayBuffer.empty[(Double, Long)] // sorted by mean
  private var pending = mutable.ArrayBuffer.empty[(Double, Long)]
  private var total = 0L

  def add(x: Double, w: Long): Unit = {
    pending += ((x, w))
    total += w
    if (pending.length >= 8 * compression) compress()
  }

  def mergeIn(other: TDigestBuffer): Unit = {
    other.compress()
    other.centroids.foreach { case (m, w) => pending += ((m, w)) }
    total += other.total
    compress()
  }

  /** k1-style capacity bound for a centroid covering quantile q. */
  private def capacity(q: Double): Double =
    4.0 * total * q * (1.0 - q) / compression + 1.0

  private def compress(): Unit = {
    if (pending.isEmpty && centroids.length <= 2 * compression) return
    val all = (centroids ++ pending).sortBy(_._1)
    pending = mutable.ArrayBuffer.empty
    centroids = mutable.ArrayBuffer.empty
    var accWeight = 0L // weight fully emitted so far
    var curMean = 0.0
    var curW = 0L
    all.foreach { case (m, w) =>
      val projected = curW + w
      val qMid = (accWeight + projected / 2.0) / math.max(1L, total)
      if (curW > 0 && projected > capacity(qMid)) {
        centroids += ((curMean, curW))
        accWeight += curW
        curMean = m; curW = w
      } else {
        // running weighted mean
        curMean = if (projected == 0) 0.0 else (curMean * curW + m * w) / projected
        curW = projected
      }
    }
    if (curW > 0) centroids += ((curMean, curW))
  }

  /** Quantile estimate by linear interpolation between centroid
    * midpoints (centroid i spans cumulative weight
    * [C(i) - w_i/2, C(i) + w_i/2] at its mean). */
  def quantile(p: Double): Double = {
    compress()
    if (total == 0 || centroids.isEmpty) return Double.NaN
    val target = p * total
    var cum = 0.0
    var prevMid = 0.0
    var prevMean = centroids.head._1
    var i = 0
    while (i < centroids.length) {
      val (m, w) = centroids(i)
      val mid = cum + w / 2.0
      if (target < mid) {
        if (i == 0) return m // below the first midpoint: clamp to first mean
        val frac = (target - prevMid) / math.max(1e-12, mid - prevMid)
        return prevMean + frac * (m - prevMean)
      }
      prevMid = mid; prevMean = m
      cum += w
      i += 1
    }
    centroids.last._1
  }

  def n: Long = total

  def serialize(): Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(total)
    out.writeInt(centroids.length)
    centroids.foreach { case (m, w) => out.writeDouble(m); out.writeLong(w) }
    out.flush()
    bos.toByteArray
  }
}

object TDigestBuffer {
  def deserialize(bytes: Array[Byte], compression: Int): TDigestBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TDigestBuffer(compression)
    val total = in.readLong()
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val m = in.readDouble(); val w = in.readLong()
      buf.add(m, w)
    }
    // add() accumulated total already
    assert(buf.n == total, s"t-digest deserialize weight mismatch: ${buf.n} != $total")
    buf
  }
}
