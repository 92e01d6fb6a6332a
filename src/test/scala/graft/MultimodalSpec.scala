package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}

/** Multimodal plumbing: schema shape, batched mapPartitions decode,
  * determinism of the stub codec (B44). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stub decode is deterministic and byte-derived") {
    val payload = "hello world".getBytes("UTF-8")
    val a = Multimodal.fakeDecode(MediaRecord(1L, "image", payload))
    val b = Multimodal.fakeDecode(MediaRecord(1L, "image", payload))
    assert(a === b)
    assert(a.size_bytes === 11)
    assert(a.width === 64 + ('h' % 64) && a.height === 64 + ('e' % 64))
    assert(a.duration_ms === 0)
    val audio = Multimodal.fakeDecode(MediaRecord(1L, "audio", payload))
    assert(audio.duration_ms === 88)
  }

  test("decodeFeatures runs distributed over binary columns") {
    val media = (0L until 200L).map { i =>
      MediaRecord(i, if (i % 2 == 0) "image" else "audio", s"payload-$i".getBytes("UTF-8"))
    }.toDS().repartition(4)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === 200)
    val byId = feats.map(f => f.media_id -> f).toMap
    assert(byId(3L).kind === "audio")
    assert(byId(3L).size_bytes === "payload-3".length)
    // checksums distinct for distinct payloads
    assert(feats.map(_.checksum).distinct.length === 200)
  }

  test("fromDocuments builds typed media records from the documents table") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.fromDocuments(spark, docs)
    val counts = media.groupByKey(_.kind).count().collect().toMap
    assert(counts.keySet === Set("image", "audio", "video"))
    assert(counts.values.sum === docs.count())
  }
}
