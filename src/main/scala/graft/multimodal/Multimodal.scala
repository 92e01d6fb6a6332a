package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md B44 / BASELINE.json:6): media
  * payloads travel as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs as a batched per-partition transform.
  *
  * The decode step is a STUB — this container ships no image/audio codecs,
  * so [[fakeDecode]] derives deterministic pseudo-features from the raw
  * bytes. Everything around it is the real Spark shape a production
  * pipeline uses: explicit schemas, `Dataset[T]` encoders, `mapPartitions`
  * with an inner batch loop (the JVM-side equivalent of a vectorized/
  * `mapInPandas` UDF: amortizes per-batch setup such as a codec context),
  * and no driver-side collection anywhere.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (the stub's deterministic fakes). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      size_bytes: Int,
      width: Int,
      height: Int,
      duration_ms: Int,
      checksum: Long)

  /** STUB codec: replace with a real decoder (JNI/javacpp codec, or a
    * vectorized Python UDF at the PySpark surface). Deterministic in the
    * payload bytes so tests and reruns agree.
    */
  def fakeDecode(m: MediaRecord): MediaFeatures = {
    val bytes = m.payload
    var h = 1125899906842597L // polynomial rolling checksum
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    MediaFeatures(
      media_id = m.media_id,
      kind = m.kind,
      size_bytes = bytes.length,
      width = 64 + (b0 % 64),
      height = 64 + (b1 % 64),
      duration_ms = if (m.kind == "audio") bytes.length * 8 else 0,
      checksum = h)
  }

  /** Batched per-partition decode: the real distribution shape. Batching
    * (here 64 rows) is where a production decoder amortizes codec-context
    * setup; the stub keeps the loop structure honest.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(64).flatMap { batch => batch.map(fakeDecode) }
    }
  }

  /** One sampled frame of a video payload. */
  case class FrameRecord(
      media_id: Long,
      frame_idx: Int,
      ts_ms: Int,
      frame_payload: Array[Byte])

  /** Frame sampling: one frame every `everyMs` of (stub) duration. The
    * frame "decode" slices deterministic byte windows out of the payload —
    * a real build swaps the slice for a codec seek+decode; the Spark
    * shape (flatMap with per-record bounded fan-out, no driver
    * involvement, output rows ~ duration/everyMs) is the production one.
    * Only `video` rows produce frames.
    */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    require(everyMs > 0, "everyMs must be positive")
    ds.flatMap { m =>
      if (m.kind != "video" || m.payload.isEmpty) Iterator.empty
      else {
        val durationMs = m.payload.length * 4 // stub: 4 ms of video per byte
        val window = math.max(1, m.payload.length / 16)
        (0 until durationMs by everyMs).iterator.zipWithIndex.map { case (ts, idx) =>
          val start = (ts.toLong * m.payload.length / durationMs).toInt
          FrameRecord(
            m.media_id, idx, ts,
            m.payload.slice(start, math.min(start + window, m.payload.length)))
        }
      }
    }
  }

  /** Resize: recompute the stub's geometry features for a target box,
    * preserving aspect ratio (fit-inside). Batched like [[decodeFeatures]]
    * — a real resampler amortizes its buffers per batch the same way.
    */
  def resizeFeatures(
      ds: Dataset[MediaFeatures],
      maxW: Int,
      maxH: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(64).flatMap(_.map { f =>
        val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
        f.copy(
          width = math.max(1, math.round(f.width * scale).toInt),
          height = math.max(1, math.round(f.height * scale).toInt))
      })
    }
  }

  /** 56-bit perceptual difference hash (dHash) over a payload column —
    * the image near-dup fingerprint of a multimodal pipeline. A real
    * build derives the 8x8 grayscale grid from decoded pixels; the stub
    * derives it from payload "bytes" (character code points, so ASCII
    * payloads replay exactly in SQL): pixel(r, c) is the code point at
    * offset (r*8 + c) mod len, and bit r*7+c is set iff pixel(r, c) >
    * pixel(r, c+1) — relative gradients, which is what makes dHash
    * robust to brightness shifts in the real-pixel version. 56 bits (8
    * rows x 7 adjacent-column comparisons) keep the hash in the positive
    * BIGINT range both engines share. Pure column arithmetic: the whole
    * hash is one codegen'd projection, no UDF.
    */
  def dhash56(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def px(p: Int) =
      ascii(substring(payload, (lit(p) % length(payload)) + 1, lit(1)))
    (0 until 8).flatMap { r =>
      (0 until 7).map { c =>
        when(px(r * 8 + c) > px(r * 8 + c + 1), lit(1L << (r * 7 + c)))
          .otherwise(lit(0L))
      }
    }.reduce(_ + _)
  }

  /** Build MediaRecords from the documents table (text bytes standing in
    * for a media payload; kind derived from the source id). */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }
}
