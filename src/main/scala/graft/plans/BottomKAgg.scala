package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Exact bottom-k aggregate: `graft_bottom_k(keyCol, payloadCol, k[, desc])`
  * keeps the k smallest `(key, payload)` pairs per group — or the k
  * LARGEST keys with `desc = true` — ordered by key then payload. Key and
  * payload may be ANY orderable Catalyst type (numeric, string, date,
  * struct, array of orderables…); output is
  * `array<struct<k: keyType, v: payloadType>>` in rank order —
  * deterministic whatever the row arrival order.
  *
  * This is the one-shuffle scale path for coordinated (consistent)
  * sampling AND for grouped top-k: with `key = hash(seed, id)` the k
  * smallest hashes per group ARE a uniform random sample of the group
  * that (a) is reproducible from the seed alone, (b) needs no per-group
  * count or second pass, and (c) composes across engines and across time
  * — two tables sampled with the same seed pick the same ids, so samples
  * can be joined (Broder-style bottom-k / consistent sketch sampling).
  * With `key = <metric>, desc = true` it is grouped top-k-by-metric in a
  * single aggregate. The alternative — a row_number() window over the
  * order — must shuffle and SORT every row of every group; this aggregate
  * ships at most k pairs per group out of each map task (partial
  * aggregation applies), so the shuffle is O(groups x k) regardless of
  * table size. The driver oracles (q134, q145, q146) prove the two
  * formulations row-identical.
  *
  * Buffer is a bounded max-heap (head = worst kept pair) under the
  * (key, payload) order: insert when under k, else replace-worst when
  * smaller — O(log k) per row, O(k) memory; merge replays the smaller
  * heap into the larger. Null keys/payloads are ignored (an aggregate
  * input with no rank is not a candidate).
  */
case class BottomKAgg(
    keyExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    desc: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKAgg.Buf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", keyExpr.dataType, nullable = false),
      StructField("v", payloadExpr.dataType, nullable = false))),
    containsNull = false)

  /** Any orderable type is accepted; a non-orderable one (map, binary
    * payloads aside) fails ANALYSIS, not execution — no blind casts. */
  override def checkInputDataTypes(): TypeCheckResult = {
    val kc = TypeUtils.checkForOrderingExpr(keyExpr.dataType, prettyName)
    if (kc.isFailure) kc
    else TypeUtils.checkForOrderingExpr(payloadExpr.dataType, prettyName)
  }

  @transient private lazy val pairOrd: Ordering[(Any, Any)] =
    BottomKAgg.pairOrdering(keyExpr.dataType, payloadExpr.dataType, desc)
  @transient private lazy val pairProj: UnsafeProjection =
    UnsafeProjection.create(Array(keyExpr.dataType, payloadExpr.dataType))
  @transient private lazy val serRow: InternalRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  override def createAggregationBuffer(): BottomKAgg.Buf =
    new BottomKAgg.Buf(k, pairOrd)

  override def update(buf: BottomKAgg.Buf, input: InternalRow): BottomKAgg.Buf = {
    val kv = keyExpr.eval(input)
    if (kv != null) {
      val pv = payloadExpr.eval(input)
      // copy AFTER the cheap bound check: most rows lose to the heap's
      // worst pair and never need their values copied out of the scan row
      if (pv != null) buf.offer(kv, pv, InternalRow.copyValue)
    }
    buf
  }

  override def merge(b1: BottomKAgg.Buf, b2: BottomKAgg.Buf): BottomKAgg.Buf = {
    // replay the smaller heap into the larger: min(n1, n2) O(log k) offers
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreachPair((key, v) => big.offer(key, v, identity))
    big
  }

  override def eval(buf: BottomKAgg.Buf): Any = {
    val rows = buf.sortedPairs.map { case (key, v) => InternalRow(key, v) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: BottomKAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachPair { (key, v) =>
      serRow.update(0, key); serRow.update(1, v)
      val bytes = pairProj(serRow).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(2)
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      row.pointTo(rowBytes, len)
      // values read from an UnsafeRow alias its byte buffer; copyValue
      // detaches them (each row has its own freshly-read array, but the
      // heap outlives `row`, so detach defensively)
      buf.offer(
        InternalRow.copyValue(row.get(0, keyExpr.dataType)),
        InternalRow.copyValue(row.get(1, payloadExpr.dataType)),
        identity)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(keyExpr = newChildren.head, payloadExpr = newChildren(1))
  override def prettyName: String = "graft_bottom_k"
}

object BottomKAgg {

  /** The aggregate's rank order: key first (reversed under `desc`), the
    * payload as the always-ascending tie-break — interpreted orderings
    * over the dynamic Catalyst types. */
  def pairOrdering(
      keyType: DataType,
      payloadType: DataType,
      desc: Boolean = false): Ordering[(Any, Any)] = {
    val keyBase = TypeUtils.getInterpretedOrdering(keyType)
    val keyOrd = if (desc) keyBase.reverse else keyBase
    val payloadOrd = TypeUtils.getInterpretedOrdering(payloadType)
    new Ordering[(Any, Any)] {
      override def compare(a: (Any, Any), b: (Any, Any)): Int = {
        val c = keyOrd.compare(a._1, b._1)
        if (c != 0) c else payloadOrd.compare(a._2, b._2)
      }
    }
  }

  /** Bounded "keep the k best pairs" buffer: a max-heap under `ord` whose
    * head is the WORST kept pair, so admission is one comparison and
    * replacement is O(log k). Values are copied (via `copy`) only when a
    * pair is actually admitted. */
  final class Buf(k: Int, ord: Ordering[(Any, Any)]) {
    private val heap = mutable.PriorityQueue.empty[(Any, Any)](ord)

    def size: Int = heap.size

    def offer(key: Any, v: Any, copy: Any => Any): Unit = {
      if (heap.size < k) {
        heap.enqueue((copy(key), copy(v)))
      } else if (ord.compare((key, v), heap.head) < 0) {
        heap.dequeue()
        heap.enqueue((copy(key), copy(v)))
      }
    }

    def foreachPair(f: (Any, Any) => Unit): Unit =
      heap.foreach { case (key, v) => f(key, v) }

    /** Pairs in ascending rank order (the deterministic output). */
    def sortedPairs: Seq[(Any, Any)] = heap.toSeq.sorted(ord)
  }
}
