package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact bottom-k aggregate: `graft_bottom_k(keyCol, payloadCol, k)` keeps
  * the k smallest `(key, payload)` pairs per group, ordered
  * lexicographically. Output is `array<struct<k: long, v: long>>`, sorted
  * ascending — deterministic whatever the row arrival order.
  *
  * This is the one-shuffle scale path for coordinated (consistent)
  * sampling: with `key = hash(seed, id)` the k smallest hashes per group
  * ARE a uniform random sample of the group that (a) is reproducible from
  * the seed alone, (b) needs no per-group count or second pass, and
  * (c) composes across engines and across time — two tables sampled with
  * the same seed pick the same ids, so samples can be joined (Broder-style
  * bottom-k / consistent sketch sampling). The alternative — a
  * row_number() window over the hash order — must shuffle and SORT every
  * row of every group; this aggregate ships at most k pairs per group out
  * of each map task (partial aggregation applies), so the shuffle is
  * O(groups x k) regardless of table size. The driver oracle (q134) proves
  * the two formulations row-identical.
  *
  * Buffer is a bounded binary max-heap keyed on the lexicographic pair
  * order: insert when under k, else replace-max when smaller — O(log k)
  * per row, O(k) memory, merge = replay the smaller heap into the larger.
  */
case class BottomKAgg(
    keyExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKAgg.Heap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): BottomKAgg.Heap = new BottomKAgg.Heap(k)

  override def update(buf: BottomKAgg.Heap, input: InternalRow): BottomKAgg.Heap = {
    val kv = keyExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (kv != null && pv != null) buf.offer(kv.asInstanceOf[Long], pv.asInstanceOf[Long])
    buf
  }

  override def merge(b1: BottomKAgg.Heap, b2: BottomKAgg.Heap): BottomKAgg.Heap = {
    b2.foreachPair((key, v) => b1.offer(key, v))
    b1
  }

  override def eval(buf: BottomKAgg.Heap): Any = {
    val rows = buf.sortedPairs.map { case (key, v) =>
      InternalRow(key, v)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: BottomKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val pairs = buf.sortedPairs
    out.writeInt(pairs.length)
    pairs.foreach { case (key, v) => out.writeLong(key); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = new BottomKAgg.Heap(k)
    (1 to n).foreach(_ => heap.offer(in.readLong(), in.readLong()))
    heap
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

  /** Bounded max-heap of (key, payload) pairs under lexicographic order,
    * backed by two parallel long arrays (no boxing on the hot path). */
  final class Heap(k: Int) {
    private val keys = new Array[Long](k)
    private val vals = new Array[Long](k)
    private var n = 0

    @inline private def less(k1: Long, v1: Long, k2: Long, v2: Long): Boolean =
      k1 < k2 || (k1 == k2 && v1 < v2)

    def offer(key: Long, v: Long): Unit = {
      if (n < k) {
        keys(n) = key; vals(n) = v; n += 1
        var i = n - 1 // sift up
        while (i > 0 && less(keys((i - 1) / 2), vals((i - 1) / 2), keys(i), vals(i))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (less(key, v, keys(0), vals(0))) {
        keys(0) = key; vals(0) = v
        var i = 0 // sift down
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var big = i
          if (l < n && less(keys(big), vals(big), keys(l), vals(l))) big = l
          if (r < n && less(keys(big), vals(big), keys(r), vals(r))) big = r
          if (big == i) done = true else { swap(i, big); i = big }
        }
      }
    }

    @inline private def swap(i: Int, j: Int): Unit = {
      val tk = keys(i); keys(i) = keys(j); keys(j) = tk
      val tv = vals(i); vals(i) = vals(j); vals(j) = tv
    }

    def foreachPair(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(keys(i), vals(i)); i += 1 }
    }

    /** Pairs in ascending lexicographic order (the deterministic output). */
    def sortedPairs: Seq[(Long, Long)] =
      (0 until n).map(i => (keys(i), vals(i))).sortBy(identity)
  }
}
