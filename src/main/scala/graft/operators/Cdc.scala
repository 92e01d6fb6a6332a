package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{hash60, tokens}

/** Content-defined chunking (the FastCDC/Rabin family, e.g. Xia et al.
  * FAST'16): split each document's token stream at positions where a
  * local windowed content hash lands in a fixed residue class, then
  * fingerprint the chunks — the storage-dedup primitive that finds
  * REPEATED REGIONS across documents even when they sit at different
  * offsets. Fixed-size chunking breaks on the first insertion (every
  * later boundary shifts); content-defined boundaries move WITH the
  * content, so two documents sharing a paragraph share its chunks
  * verbatim. Complements the near-dup tiers: [[Winnowing]] samples
  * fingerprints for overlap DETECTION, this produces a complete
  * partition of the corpus whose duplicate chunks are directly
  * REMOVABLE (the dedup-storage read).
  *
  * Cut rule: position i ends a chunk iff i ≥ window−1 and
  * hash60("cdc", last `window` tokens joined) ≡ 0 (mod stride) —
  * boundary decisions depend only on a `window`-token context, so the
  * expected chunk length is `stride` tokens and identical content cuts
  * identically everywhere. Everything is per-document arithmetic: one
  * posexplode, one per-doc window (lag + running sum — partitioned by
  * doc, never a global sort), one (doc, chunk) groupBy whose per-group
  * state is a single bounded chunk. No similarity joins, no pair
  * generation; corpus-level dedup is a plain fp groupBy. All hashes
  * route through [[graft.functions.GraftFunctions.hash60]] so a SQL
  * oracle replays bit-for-bit.
  */
object Cdc {

  /** Chunk fingerprints: one row per (doc, chunk) with the chunk's
    * hash60 fingerprint and token count. `docs` needs (idCol, textCol).
    */
  def chunkFingerprints(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 4, stride: Int = 32): DataFrame = {
    require(window >= 2, "window must cover at least 2 tokens")
    require(stride >= 2, "stride < 2 cuts at every position")
    val w = Window.partitionBy(idCol).orderBy("pos")
    val ctx = concat_ws(" ",
      ((window - 1) to 1 by -1).map(k => lag(col("tok"), k).over(w)) :+ col("tok"): _*)
    val tok = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("cut",
        when(col("pos") >= window - 1 &&
          hash60("cdc", ctx) % stride === 0L, 1L).otherwise(0L))
      // a cut at pos ends the chunk AT pos: the chunk id counts the cuts
      // strictly BEFORE this row (running sum over the preceding frame)
      .withColumn("chunk_no",
        coalesce(sum(col("cut")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    tok.groupBy(col(idCol), col("chunk_no"))
      .agg(
        hash60(expr(
          "array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ')"))
          .as("fp"),
        count(lit(1)).as("n_toks"))
  }

  /** Per-group storage-dedup summary over the chunk frame: total vs
    * distinct chunk fingerprints and the removable share on the 10⁶ ppm
    * grid (integer div — the duplicate share if every repeated chunk
    * kept one copy). `groupCols` come from a prior join (e.g. source).
    */
  def dedupSummary(chunks: DataFrame, groupCols: Seq[Column]): DataFrame =
    chunks.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("total_chunks"),
        countDistinct(col("fp")).as("distinct_chunks"))
      .withColumn("dup_ppm",
        Guards(col("total_chunks") <= lit(Long.MaxValue / 1000000L),
          expr("((total_chunks - distinct_chunks) * 1000000) div total_chunks"),
          Guards.msg("cdc",
            lit("group holds "), col("total_chunks").cast("string"),
            lit(" chunks - the x10^6 ppm grid wraps past 2^63/10^6; "),
            lit("report per finer groups"))))
}
