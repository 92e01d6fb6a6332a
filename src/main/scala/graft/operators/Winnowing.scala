package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS plagiarism-detector algorithm): hash every
  * word k-gram, slide a window of `w` consecutive hashes over each
  * document, and keep ONE fingerprint per window — the minimum hash,
  * ties broken to the RIGHTMOST position (the paper's robust-winnowing
  * tie rule), deduplicated across overlapping windows. The guarantee:
  * any shared substring of at least w+k−1 tokens between two documents
  * yields at least one IDENTICAL selected fingerprint in both, while
  * storage drops to ~2/(w+1) of the gram count — the sketch that makes
  * corpus-scale substring-overlap detection a bucket join instead of an
  * all-pairs scan.
  *
  * Determinism/portability: gram hashes are
  * [[graft.functions.GraftFunctions.hash60]] reduced mod 2^40, and the
  * per-window argmin-with-rightmost-tie is ONE order-embedding key
  * `key = h40·2^20 + (2^20 − pos)` — minimizing the key IS
  * (min hash, then max position), so a plain windowed MIN replays
  * bit-identically in any SQL engine; hash and position unpack from the
  * key by div/mod. Positions are bounded in-plan (< 2^20 grams per doc,
  * refuse-loudly) so the packing never collides.
  *
  * Scale shape: one posexplode scan, one GROUPED (per-document,
  * partition-parallel) sliding-window MIN over a bounded w-row frame,
  * one distinct — no self-joins, no global windows.
  *
  * Returns distinct `(id, fp_pos, fp_hash)` — fp_pos is the 1-based
  * gram position the fingerprint was selected at.
  */
object Winnowing {
  def fingerprints(docs: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame = {
    require(k >= 1 && k <= 16, s"Winnowing wants 1..16-gram shingles, got $k")
    require(w >= 2 && w <= 256, s"Winnowing wants a 2..256 window, got $w")
    val posCap = 1L << 20
    val grams = docs
      .select(col(idCol).as("id"),
        posexplode(TextAnalysis.shinglesFromTokens(
          graft.functions.GraftFunctions.tokens(col(textCol)), k)).as(Seq("p0", "gram")))
      .select(col("id"), (col("p0") + 1).cast(LongType).as("pos"),
        (graft.functions.GraftFunctions.hash60(col("gram")) % (1L << 40)).as("h40"))
    val keyed = grams.select(col("id"), col("pos"),
      graft.operators.Guards(col("pos") < posCap,
        col("h40") * posCap + (lit(posCap) - col("pos")),
              concat(
          lit("[winnowing] document "), col("id").cast("string"),
          lit(" exceeds 2^20 grams — chunk it before fingerprinting"))).as("key"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos").rowsBetween(-(w - 1), 0)
    keyed
      .withColumn("mkey", min("key").over(win))
      // only FULL windows select (positions w..m) — shorter prefixes are
      // covered by the first full window, exactly as the paper defines
      .filter(col("pos") >= w)
      .select(col("id"),
        (lit(posCap) - (col("mkey") % posCap)).as("fp_pos"),
        // integer div, NOT a double divide: mkey reaches h40·2^20 < 2^60
        // and a double only holds integers exactly to 2^53 — a selected
        // top-octave hash at gram position ≤ 64 would round across the
        // 2^20 boundary and disagree with the oracle's floor division
        expr(s"mkey div ${posCap}L").as("fp_hash"))
      .distinct()
  }

  /** Candidate near-duplicate/overlap pairs from shared fingerprints:
    * bucket-join the fingerprint frame with itself on fp_hash and count
    * shared fingerprints per (id_a < id_b) pair. `maxDocFreq` drops
    * boilerplate fingerprints shared by more than that many documents
    * BEFORE the pair expansion (the same df-cap posture as the LSH band
    * joins — a stop-phrase gram would otherwise quadratically explode
    * one bucket).
    *
    * Beyond the raw `shared_fps` count, each pair carries a LENGTH-
    * NORMALIZED containment score: `containment_ppm =
    * (10^6 · shared) div min(|FP_a|, |FP_b|)` with |FP| the document's
    * df-capped fingerprint count — raw intersection counts are not
    * comparable across document lengths (the same reason q56 emits
    * Jaccard, not |A∩B|); containment-by-the-smaller-set is the MOSS
    * convention for "is the short document inside the long one". Exact
    * integer rational (floored ppm), so any SQL engine replays it
    * bit-for-bit. Counts are taken over the SAME df-capped universe the
    * intersection is counted in, keeping the score a true ratio ≤ 10^6.
    *
    * Scale shape: the per-doc counts are one partial-agg'd shuffle over
    * the kept fingerprints, joined back onto the (already pair-bounded)
    * overlap frame on each id — no new pair expansion. */
  def overlapPairs(fps: DataFrame, maxDocFreq: Int): DataFrame = {
    val byHash = fps.select(col("id"), col("fp_hash")).distinct()
    val dfreq = byHash.groupBy("fp_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    val kept = graft.Q.persistOnce(byHash.join(dfreq, "fp_hash"))
    val perDoc = kept.groupBy("id").agg(count(lit(1)).as("n_fps"))
    val b = kept.select(col("fp_hash"), col("id").as("id_b"))
    kept.join(b, "fp_hash").filter(col("id") < col("id_b"))
      .groupBy(col("id").as("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .join(perDoc.select(col("id").as("id_a"), col("n_fps").as("na")), "id_a")
      .join(perDoc.select(col("id").as("id_b"), col("n_fps").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("shared_fps"),
        least(col("na"), col("nb")).as("min_fps"),
        expr("(1000000 * shared_fps) div least(na, nb)").as("containment_ppm"))
  }
}
