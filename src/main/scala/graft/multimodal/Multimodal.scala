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
