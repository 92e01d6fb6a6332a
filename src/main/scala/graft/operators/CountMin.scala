package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the fixed-memory
  * frequency summary beside the repo's other sketch tiers (HLL distinct
  * counts, KMV set algebra, AMS join sizes, Bloom membership,
  * SpaceSaving top-k): `depth` pairwise-independent hash rows × `width`
  * counters; every key increments one counter per row, a point query
  * reads the MINIMUM of its `depth` counters. Estimates NEVER
  * undercount (each counter is a sum over a superset of the key's
  * occurrences) and overshoot by more than 2N/width with probability
  * ≤ 2^−depth — the classic one-sided guarantee, pinned in the spec.
  *
  * Hashes are the engine-portable seeded [[graft.functions.GraftFunctions.hash60]]
  * family (`cm<j>` seeds), so any SQL engine with md5 replays the exact
  * sketch AND the exact estimates bit-for-bit — same portability
  * contract as the Bloom/KMV/AMS tiers.
  *
  * Scale shape: the build is one scan exploded ×depth and ONE
  * partial-agg'd shuffle to (j, bucket) — the sketch is depth·width rows
  * regardless of corpus size, mergeable across shards/streams by plain
  * summation (counters are linear). Point queries equi-join the probe
  * keys' (j, bucket) coordinates against the bounded sketch — a
  * broadcast join at any realistic depth·width.
  */
object CountMin {

  private def bucket(key: org.apache.spark.sql.Column, j: Int, width: Int) =
    graft.functions.GraftFunctions.hash60(s"cm$j", key) % width

  /** A key's `depth` (j, bucket) coordinates as an array column —
    * exposed (not just inside [[build]]) so a STREAMING job can build
    * the IDENTICAL sketch: the reducer is a plain count, associative
    * and commutative, so a Complete-mode streamed aggregate over these
    * exploded coordinates is bit-identical to the batch build whatever
    * the micro-batch boundaries (the TableDigest.rowHashes posture). */
  def coordArray(key: org.apache.spark.sql.Column, depth: Int, width: Int)
      : org.apache.spark.sql.Column = {
    require(depth >= 1 && depth <= 16, s"CountMin wants depth 1..16, got $depth")
    require(width >= 2 && width <= (1 << 20), s"CountMin wants width 2..2^20, got $width")
    array((0 until depth).map { j =>
      struct(lit(j).as("j"), bucket(key.cast("string"), j, width).as("bucket"))
    }: _*)
  }

  /** Build the sketch: `(j, bucket, c)` rows, one per NON-EMPTY counter
    * (absent coordinates are zero — [[estimate]] coalesces). */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    df.select(explode(coordArray(col(keyCol), depth, width)).as("e"))
      .groupBy(col("e.j").as("j"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point-query `probes`' `keyCol` against a [[build]] sketch (same
    * depth/width — caller-owned contract): returns `(key, est)` with
    * est = min over the depth rows, 0 for never-seen coordinates. */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val coords = probes.select(col(keyCol).cast("string").as("key")).distinct()
      .select(col("key"), explode(coordArray(col("key"), depth, width)).as("e"))
      .select(col("key"), col("e.j").as("j"), col("e.bucket").as("bucket"))
    coords.join(sketch, Seq("j", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
