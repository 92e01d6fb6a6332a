package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 batch table modeling the reference's offset-paged REST
  * scan (`fetch_data.py:64-114,132-167` — A1/A2/A12) the way it should
  * look on a cluster: the offset space [0, maxOffset) is split into
  * range `InputPartition`s so 1000 executors page concurrently instead
  * of the reference's one-request-in-flight loop, and the per-page retry
  * ladder (bounded attempts with exponential backoff, empty page on
  * exhaustion — `SHORT_RETRIES`/`SHORT_BACKOFF` at `fetch_data.py:20-24`)
  * lives inside the partition reader where task retries compose with it.
  * The scan honors column pruning and limit pushdown (see
  * [[PagedScanBuilder]]) so narrow projections and bounded previews don't
  * decode the full wire record or page through the whole offset space.
  *
  * The container has no egress, so the "HTTP fetch" is a deterministic
  * in-process page generator producing agmarknet-shaped string records
  * (same 11-column wire schema as AgriPipeline.rawSchema); the
  * `flaky_every` option makes every k-th page fail transiently on its
  * first attempt to exercise the retry path.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.PagedSource")
  *     .option("max_offset", 10000).option("page_size", 1000)
  *     .option("num_partitions", 8).load()
  * }}}
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(new CaseInsensitiveStringMap(properties))
}

object PagedSource {
  /** The agmarknet wire schema — all strings, as the API delivers. */
  val schema: StructType = StructType(Seq(
    "State", "District", "Market", "Commodity", "Variety", "Grade",
    "Arrival_Date", "Min_Price", "Max_Price", "Modal_Price", "Commodity_Code"
  ).map(StructField(_, StringType)))

  private val states = Array("Karnataka", "Odisha", "Maharashtra", "Punjab", "Tamil Nadu")
  private val commodities = Array("Apple", "Onion", "Paddy(Dhan)(Common)", "Green Chilli", "Banana - Green", "Egg")
  private val grades = Array("FAQ", "Large", "Local", "Medium", "Small")

  /** Deterministic fake of one API record at absolute offset i. */
  def record(i: Long): Array[String] = {
    val price = 500 + (i * 37) % 9000
    Array(
      states((i % states.length).toInt),
      s"District_${i % 23}",
      if (i % 11 == 0) s"Market (F&V), Zone ${i % 7}" else s"Market_${i % 41}",
      commodities((i % commodities.length).toInt),
      s"Variety_${i % 13}",
      grades((i % grades.length).toInt),
      f"${1 + i % 28}%02d/${1 + i % 12}%02d/${2015 + i % 9}",
      s"$price",
      s"${price + 200}",
      if (i % 97 == 0) "" else f"${price + 100}%d.${i % 100}%02d",
      s"${i % 316}")
  }

  /** One page of records; throws transiently when this page is flaky and
    * it is the reader's first attempt (A2's failure mode). */
  def fetchPage(offset: Long, pageSize: Int, maxOffset: Long): Seq[Array[String]] =
    (offset until math.min(offset + pageSize, maxOffset)).map(record)
}

class PagedTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_paged_source"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(caseInsensitiveStringMap: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveStringMap.asCaseSensitiveMap())
    new PagedScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** ScanBuilder with the two pushdowns an offset-paged REST API can honor:
  * column pruning (decode only requested fields from the wire record —
  * at 100 TB a count(*) or 2-column projection must not materialize all
  * 11 strings per row) and limit (each partition stops fetching once it
  * has produced `limit` rows; partial push, Spark still applies the final
  * global limit). Predicate pushdown is deliberately absent: the modeled
  * API (like most REST sources) accepts only offset/limit, so filters
  * stay in Spark where Catalyst already evaluates them post-scan.
  */
class PagedScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private val maxOffset = options.getLong("max_offset", 10000L)
  private val pageSize = options.getInt("page_size", 1000)
  private val numPartitions = options.getInt("num_partitions", 8)
  private val flakyEvery = options.getInt("flaky_every", 0)
  private val retries = options.getInt("retries", 5)

  private var required: StructType = PagedSource.schema
  private var pushedLimit: Long = Long.MaxValue

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = limit.toLong
    false // partial push: per-partition cap; Spark applies the global limit
  }

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"graft_paged_source PrunedColumns: [${required.fieldNames.mkString(", ")}] " +
      s"PushedLimit: ${if (pushedLimit == Long.MaxValue) "none" else pushedLimit.toString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // contiguous offset ranges, one per partition, aligned to page-size
    // multiples so no page straddles two partitions — the cluster-parallel
    // replacement for the reference's single sequential driver loop
    val rawPer = math.max(1L, (maxOffset + numPartitions - 1) / numPartitions)
    val per = ((rawPer + pageSize - 1) / pageSize) * pageSize
    (0L until maxOffset by per)
      .map(start => OffsetRange(start, math.min(start + per, maxOffset)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fieldIdx = required.fieldNames.map(PagedSource.schema.fieldIndex)
    new PagedReaderFactory(pageSize, maxOffset, flakyEvery, retries, fieldIdx, pushedLimit)
  }

  /** Streaming tier (A3/A12 as a native source): `readStream` over the
    * same offset space, with Spark's checkpointed offset log playing the
    * role of the reference's on-disk resume state. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val fieldIdx = required.fieldNames.map(PagedSource.schema.fieldIndex)
    // batches stay page-aligned so no generator page straddles batches
    val rawRows = options.getLong("rows_per_batch", pageSize.toLong * numPartitions)
    val rowsPerBatch = math.max(pageSize.toLong,
      ((rawRows + pageSize - 1) / pageSize) * pageSize)
    new PagedMicroBatchStream(
      pageSize, maxOffset, numPartitions, flakyEvery, retries, fieldIdx, rowsPerBatch)
  }
}

/** Streaming offset = the absolute row offset harvested so far. */
case class PagedStreamOffset(offset: Long) extends Offset {
  override def json(): String = offset.toString
}

/** The reference's resumable bounded harvest (`fetch_data.py:132-167`:
  * page until caught up, persist progress, resume on restart) as a DSv2
  * MicroBatchStream. Offsets are absolute row positions; Spark's
  * checkpoint offset log replaces the reference's hand-rolled state file,
  * and because the upstream is offset-addressable and deterministic,
  * any micro-batch is replayable — exactly-once lands at the sink
  * (file-sink commit log, foreachBatch batch-id markers).
  *
  * Admission control paces the harvest ([[ReadLimit]] rows per batch,
  * A11/A13's pacing knob); Trigger.AvailableNow drains to `max_offset`
  * and stops (A12's bounded sweep). Scale: each batch's offset span is
  * split into page-aligned ranges read by the same retry-laddered
  * partition readers as the batch scan — pacing bounds state, not
  * parallelism.
  */
class PagedMicroBatchStream(
    pageSize: Int,
    maxOffset: Long,
    numPartitions: Int,
    flakyEvery: Int,
    retries: Int,
    fieldIdx: Array[Int],
    rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  @volatile private var availableNow = false

  override def prepareForTriggerAvailableNow(): Unit = availableNow = true

  override def initialOffset(): Offset = PagedStreamOffset(0L)

  override def getDefaultReadLimit: ReadLimit = {
    val capped = math.min(rowsPerBatch, Int.MaxValue.toLong).toInt
    ReadLimit.maxRows(capped)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "paced source: Spark calls latestOffset(start, limit) via SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[PagedStreamOffset].offset
    if (availableNow) PagedStreamOffset(maxOffset)
    else PagedStreamOffset(math.min(s + rowsPerBatch, maxOffset))
  }

  override def reportLatestOffset(): Offset = PagedStreamOffset(maxOffset)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PagedStreamOffset].offset
    val e = end.asInstanceOf[PagedStreamOffset].offset
    if (e <= s) Array.empty
    else {
      val rawPer = math.max(1L, (e - s + numPartitions - 1) / numPartitions)
      val per = ((rawPer + pageSize - 1) / pageSize) * pageSize
      (s until e by per)
        .map(o => OffsetRange(o, math.min(o + per, e)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(pageSize, maxOffset, flakyEvery, retries, fieldIdx, Long.MaxValue)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint log

  override def deserializeOffset(json: String): Offset = PagedStreamOffset(json.toLong)

  override def stop(): Unit = ()
}

case class OffsetRange(start: Long, end: Long) extends InputPartition

class PagedReaderFactory(
    pageSize: Int,
    maxOffset: Long,
    flakyEvery: Int,
    retries: Int,
    fieldIdx: Array[Int],
    limit: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[OffsetRange]
    new PagedReader(range, pageSize, maxOffset, flakyEvery, retries, fieldIdx, limit)
  }
}

/** Reads one offset range page-by-page with the reference's bounded
  * retry ladder (attempt n sleeps 2^n * backoffMs; gives up after
  * `retries` attempts by skipping the page — `fetch_data.py:66-114`'s
  * "return [] and advance" semantics).
  */
class PagedReader(
    range: OffsetRange,
    pageSize: Int,
    maxOffset: Long,
    flakyEvery: Int,
    retries: Int,
    fieldIdx: Array[Int],
    limit: Long = Long.MaxValue,
    backoffMs: Long = 1L)
    extends PartitionReader[InternalRow] {

  private var offset = range.start
  private var produced = 0L
  private var page: Iterator[Array[String]] = Iterator.empty
  private var attempted = Set.empty[Long] // pages that already failed once

  private def pageIsFlaky(o: Long): Boolean =
    flakyEvery > 0 && (o / pageSize) % flakyEvery == 0

  private def fetchWithRetry(o: Long): Seq[Array[String]] = {
    var attempt = 0
    while (attempt < retries) {
      try {
        if (pageIsFlaky(o) && !attempted.contains(o)) {
          attempted += o
          throw new RuntimeException(s"transient fetch failure at offset $o")
        }
        return PagedSource.fetchPage(o, pageSize, maxOffset)
      } catch {
        case _: RuntimeException =>
          attempt += 1
          if (attempt < retries) Thread.sleep(backoffMs << attempt)
      }
    }
    Seq.empty // exhausted: skip the page, keep scanning (A2/A12)
  }

  override def next(): Boolean = {
    if (produced >= limit) return false // pushed limit: stop fetching pages
    while (!page.hasNext && offset < range.end) {
      // clamp at range.end: a page may not spill into the next partition's
      // range even if the range is not page-aligned
      val take = math.min(pageSize.toLong, range.end - offset).toInt
      page = fetchWithRetry(offset).iterator.take(take)
      offset += pageSize
    }
    page.hasNext
  }

  override def get(): InternalRow = {
    val rec = page.next()
    produced += 1
    // decode only the pruned columns (fieldIdx is identity when unpruned)
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      fieldIdx.map { i =>
        val s = rec(i)
        if (s.isEmpty) null else UTF8String.fromString(s)
      }))
  }

  override def close(): Unit = ()
}
