package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline surface
  * (SURVEY.md B6/B7): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design:
  *  - exact dedup is one hash aggregate on the content fingerprint;
  *  - MinHash/LSH turns all-pairs O(n^2) into per-bucket candidate joins —
  *    the only shuffles are (doc -> shingle explode -> groupBy doc) for
  *    signatures and the band-key self-join, both key-partitioned;
  *  - SimHash reduces a document to one 32-bit integer per doc; near-dup
  *    candidates come from small hamming distance, verified pairwise;
  *  - n-gram Jaccard prunes by shared-shingle inverted index (docs with
  *    no common shingle never meet).
  *
  * All hashes route through [[graft.functions.GraftFunctions.hash60]] so
  * every stage is exactly reproducible in the DuckDB oracle.
  */
object Dedup {

  /** (doc, shingle) inverted-index rows, distinct per doc. */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), explode(TextAnalysis.wordShingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** MinHash signature: one row per doc, columns mh_0..mh_{numHashes-1}
    * = min over shingles of the seeded portable hash.
    */
  def minhashSignatures(index: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(i => min(hash60(s"mh$i", col("shingle"))).as(s"mh_$i"))
    index.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: signature -> (band, key) rows; docs sharing a key in any
    * band are near-dup candidates. bands*rows must equal numHashes.
    */
  def lshBands(sig: DataFrame, idCol: String, bands: Int, rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        concat_ws("_", (0 until rows).map(j => col(s"mh_${b * rows + j}")): _*).as("key"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate pairs (a < b) with the number of bands they collide in. */
  def lshCandidates(bandsDf: DataFrame, idCol: String): DataFrame = {
    val x = bandsDf.select(col(idCol).as("a"), col("band"), col("key"))
    val y = bandsDf.select(col(idCol).as("b"), col("band"), col("key"))
    x.join(y, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(countDistinct(col("band")).as("n_shared_bands"))
  }

  /** Exact pairwise n-gram Jaccard over the shared-shingle candidates:
    * |A ∩ B| / (|A| + |B| - |A ∩ B|).
    */
  def jaccardPairs(index: DataFrame, idCol: String): DataFrame = {
    val counts = index.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val x = index.select(col(idCol).as("a"), col("shingle"))
    val y = index.select(col(idCol).as("b"), col("shingle"))
    x.join(y, "shingle")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.select(col(idCol).as("a"), col("n_sh").as("ca")), "a")
      .join(counts.select(col(idCol).as("b"), col("n_sh").as("cb")), "b")
      .withColumn("jacc",
        col("inter").cast("double") / (col("ca") + col("cb") - col("inter")))
  }

  /** 32-bit SimHash over whitespace tokens (with multiplicity): bit b of
    * the result is set iff sum over tokens of (2*bit_b(hash)-1) > 0.
    */
  def simhash32(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .withColumn("hv", hash60("sim", col("t")))
    val bitSums = (0 until 32).map { b =>
      sum(shiftright(col("hv"), b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"s_$b")
    }
    val sums = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val hashExpr = (0 until 32)
      .map(b => when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col(idCol), hashExpr.as("simhash"))
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
