package graft

import org.apache.spark.sql.functions._

/** Content-defined chunking contracts (operators/Cdc): the
  * shift-invariance that is the operator's whole reason to exist, token
  * conservation, determinism, and the ppm summary arithmetic. */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  // A long shared paragraph embedded at DIFFERENT offsets in two docs.
  // stride 4 makes cuts dense enough that the paragraph holds several
  // interior chunks (deterministic given hash60 — no flake surface).
  private val para = (1 to 40).map(i => s"p$i").mkString(" ")
  private def docs = Seq(
    (1L, s"alpha beta gamma $para"),
    // prefix lengths 3 and 6: not congruent mod 4 AND total lengths not
    // congruent mod 4 either, so fixed-size chunking aligns neither the
    // interior nor the tail remainder
    (2L, s"one two three four five six $para"),
    (3L, "completely unrelated filler text with nothing shared at all"))
    .toDF("doc_id", "text")

  private def fps(window: Int = 2, stride: Int = 4) =
    operators.Cdc.chunkFingerprints(docs, "doc_id", "text", window, stride)

  test("cdc: a paragraph shared at different offsets shares interior chunks") {
    val byDoc = fps().select(col("doc_id"), col("fp")).as[(Long, Long)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val shared = byDoc(1L) intersect byDoc(2L)
    // the differing prefixes shift every FIXED-size boundary, but the
    // content-defined cuts inside the paragraph land identically
    assert(shared.nonEmpty,
      "content-defined boundaries must align inside the shared paragraph")
    // the unrelated doc shares nothing with either
    assert((byDoc(3L) intersect (byDoc(1L) union byDoc(2L))).isEmpty)
  }

  test("cdc: fixed-size chunking would NOT align these offsets (the contrast)") {
    // same docs, chunked by position (pos div 4) instead of content:
    // prefix lengths 3 and 6 are not congruent mod 4, so no interior
    // alignment survives — documents why CDC earns its window hash
    val fixed = docs
      .select(col("doc_id"), posexplode(functions.GraftFunctions.tokens(col("text")))
        .as(Seq("pos", "tok")))
      .withColumn("chunk_no", expr("pos div 4"))
      .groupBy("doc_id", "chunk_no")
      .agg(functions.GraftFunctions.hash60(expr(
        "array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ')"))
        .as("fp"))
      .select(col("doc_id"), col("fp")).as[(Long, Long)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert((fixed(1L) intersect fixed(2L)).isEmpty,
      "misaligned prefixes must break every fixed-size boundary")
  }

  test("cdc: chunks partition the token stream exactly (conservation)") {
    val nToks = fps().groupBy("doc_id").agg(sum("n_toks").as("n"))
      .as[(Long, Long)].collect().toMap
    val expected = docs
      .select(col("doc_id"), size(functions.GraftFunctions.tokens(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(nToks == expected.map { case (k, v) => k -> v.toLong })
  }

  test("cdc: deterministic across runs; empty docs contribute no chunks") {
    val a = fps().orderBy("doc_id", "chunk_no").collect().toSeq
    val b = fps().orderBy("doc_id", "chunk_no").collect().toSeq
    assert(a == b)
    val empty = operators.Cdc.chunkFingerprints(
      Seq((9L, "   ")).toDF("doc_id", "text"), "doc_id", "text")
    assert(empty.count() == 0)
  }

  test("cdc: dedupSummary ppm arithmetic on a hand frame") {
    // 4 chunks, 3 distinct → dup_ppm = 1·10⁶ div 4 = 250000
    val chunks = Seq((1L, 0L, 100L, 5L), (1L, 1L, 200L, 5L),
      (2L, 0L, 100L, 5L), (2L, 1L, 300L, 5L))
      .toDF("doc_id", "chunk_no", "fp", "n_toks")
      .withColumn("g", lit("s"))
    val row = operators.Cdc.dedupSummary(chunks, Seq(col("g")))
      .select("total_chunks", "distinct_chunks", "dup_ppm")
      .as[(Long, Long, Long)].collect().head
    assert(row == ((4L, 3L, 250000L)))
  }

  test("cdc: degenerate window/stride refuse at the door") {
    intercept[IllegalArgumentException] {
      operators.Cdc.chunkFingerprints(docs, "doc_id", "text", window = 1)
    }
    intercept[IllegalArgumentException] {
      operators.Cdc.chunkFingerprints(docs, "doc_id", "text", stride = 1)
    }
  }
}
