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

  test("sampleFrames: bounded fan-out, only video rows, deterministic slices") {
    val media = Seq(
      MediaRecord(1L, "video", Array.fill[Byte](256)(7)),   // 1024 ms stub duration
      MediaRecord(2L, "image", Array.fill[Byte](256)(7)),   // no frames
      MediaRecord(3L, "video", Array.emptyByteArray)        // no frames
    ).toDS().repartition(2)
    val frames = Multimodal.sampleFrames(media, everyMs = 250).collect()
    assert(frames.forall(_.media_id === 1L))
    assert(frames.length === 5) // ts 0,250,500,750,1000
    assert(frames.map(_.frame_idx).sorted.toSeq === Seq(0, 1, 2, 3, 4))
    // 256/16-byte window, possibly truncated at the payload tail
    assert(frames.forall(f => f.frame_payload.length > 0 && f.frame_payload.length <= 16))
    // deterministic: same input -> same frames
    val again = Multimodal.sampleFrames(media, everyMs = 250).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx, f.ts_ms, f.frame_payload.toSeq)).sortBy(_._2).toSeq
      === again.map(f => (f.media_id, f.frame_idx, f.ts_ms, f.frame_payload.toSeq)).sortBy(_._2).toSeq)
  }

  test("resizeFeatures fits geometry inside the target box, keeps ratio") {
    val feats = Seq(
      MediaFeatures(1L, "image", 100, 120, 60, 0, 1L),  // wide: 2:1
      MediaFeatures(2L, "image", 100, 30, 40, 0, 2L)    // already fits
    ).toDS()
    val resized = Multimodal.resizeFeatures(feats, maxW = 64, maxH = 64)
      .collect().map(f => f.media_id -> f).toMap
    assert(resized(1L).width === 64 && resized(1L).height === 32) // scaled by 64/120
    assert(resized(2L).width === 30 && resized(2L).height === 40) // untouched
  }

  test("fromDocuments builds typed media records from the documents table") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.fromDocuments(spark, docs)
    val counts = media.groupByKey(_.kind).count().collect().toMap
    assert(counts.keySet === Set("image", "audio", "video"))
    assert(counts.values.sum === docs.count())
  }
}
