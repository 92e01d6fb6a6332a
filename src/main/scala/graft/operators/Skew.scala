package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable skew-mitigation building blocks — the manual fallback tier
  * under AQE's runtime skew handling (AdaptiveSpec): AQE splits skewed
  * *partitions* after the fact; salting re-keys the shuffle itself, which
  * is the only lever when a single key is hot enough that even one
  * key-worth of rows overwhelms a task (the 100 TB "one commodity is
  * half the corpus" case — the reference corpus' own file-size skew is
  * 1 to 53,393 rows per commodity).
  *
  * All helpers are deterministic (hash-derived salt, not rand()) so
  * salted plans remain replay-stable and oracle-verifiable: salting must
  * never change results, only shuffle placement. q28/q36 exercise these
  * against plain-shape SQL oracles.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from `entropyCols`
    * (columns unrelated to the hot key — e.g. the other join keys or a
    * row id — so a hot key's rows spread uniformly). */
  def addSalt(df: DataFrame, buckets: Int, entropyCols: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(entropyCols: _*), lit(buckets)))

  /** Dimension-side replication: one copy of every row per salt value.
    * Pair with [[addSalt]] on the fact side; the join key becomes
    * (keys..., __salt) so the hot key spreads over `buckets` reducers. */
  def replicateForSalt(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))

  /** Salted inner equi-join: semantics-identical to
    * `fact.join(dim, factKeys = dimKeys)` but with the hot-key rows of
    * `fact` spread over `buckets` reducers. `dim` is replicated
    * `buckets`× — use for moderate-size dimension sides that are too big
    * to broadcast but far smaller than the fact table.
    */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKeys: Seq[String],
      dimKeys: Seq[String],
      buckets: Int,
      entropyCols: Seq[Column]): DataFrame = {
    require(factKeys.length == dimKeys.length, "key lists must align")
    val f = addSalt(fact, buckets, entropyCols)
    val d = replicateForSalt(dim, buckets)
    val cond = factKeys.zip(dimKeys)
      .map { case (fk, dk) => f(fk) === d(dk) }
      .reduce(_ && _) && f("__salt") === d("__salt")
    f.join(d, cond).drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates: phase 1
    * aggregates on (keys..., salt) — spreading a hot group over
    * `buckets` tasks — and phase 2 re-aggregates the partials on the
    * true keys. The caller supplies matching (partial, final) aggregate
    * lists over the phase-1 output names, e.g.
    * {{{
    *   Skew.twoPhaseAgg(df, Seq("k"), 16, Seq(col("id")))(
    *     Seq(count(lit(1)).as("pc"), sum(col("x")).as("px")),
    *     Seq(sum(col("pc")).as("cnt"), sum(col("px")).as("sum_x")))
    * }}}
    */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      entropyCols: Seq[Column])(
      partial: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    val phase1 = addSalt(df, buckets, entropyCols)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
