package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.hash60

/** Deterministic, coordinated sampling for corpus curation.
  *
  * Both operators derive randomness from the portable 60-bit md5 hash of a
  * seed + the row's id, never from an RNG: the sample is a pure function
  * of (seed, data), so it is reproducible across runs, engines, cluster
  * sizes and partitionings — the property that lets a 100 TB pipeline
  * re-derive exactly the same eval/holdout subset a year later, and lets
  * two independently-sampled tables be joined on their common ids
  * (bottom-k sketches compose: the k smallest hashes of A ∪ B are a
  * subset of the k smallest of A plus the k smallest of B).
  *
  * Restates the reference's implicit sampling needs (spot-check subsets of
  * the harvested corpus, `/root/reference/fetch_data.py:64-167`) as
  * explicit engine operators.
  */
object Sampling {

  /** Coordinated bottom-k sample: the k rows of each group whose
    * `hash(seed, id)` is smallest, ranked in hash order.
    *
    * Executed as ONE partial-aggregated shuffle via the native
    * `graft_bottom_k` TypedImperativeAggregate: each map task ships at
    * most k (hash, id) pairs per group, so shuffle volume is
    * O(groups x k) no matter how large the table — the row_number()
    * window formulation this replaces sorts EVERY row of every group.
    * Output: groupCols ++ (idCol, rk) with rk in 1..k by hash order.
    * Duplicate ids within a group occupy separate sample slots (same as
    * the row_number oracle); feed unique ids per group — which any real
    * id column is — for agreement with the deduping streaming twin
    * (StreamingJobs.samplerBottomK).
    */
  def bottomK(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int,
      seed: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val h = hash60(seed, col(idCol))
    val picked = df
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_bottom_k", h, col(idCol), lit(k)).as("__bk"))
    picked
      .select(groupCols.map(col) :+ posexplode(col("__bk")).as(Seq("__pos", "__kv")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__kv.v").as(idCol),
        (col("__pos") + 1).cast("int").as("rk")): _*)
  }

  /** Deterministic weighted sample by TICKET REPLICATION: global bottom-k
    * over rows replicated `weight` times (positive integer weights),
    * hashing (seed, id, replica). A row with weight w gets w lottery
    * tickets, which approximates probability-proportional-to-size — the
    * proportionality is exact only at k = 1; for k > 1 multi-ticket rows
    * are mildly over-included relative to strict PPS (a row can win with
    * any of its tickets). For exact one-ticket-per-row weighted sampling
    * with fractional weights, use [[weightedBottomK]]. Rows with
    * weight < 1 get no tickets and are excluded (a bare
    * `sequence(1, w)` would DESCEND for w < 1 and mint phantom tickets).
    * The explode is scan-stage (no shuffle); the global top-k is a
    * TakeOrdered — partial top-k per partition, k rows to the driver —
    * never a full sort. Output: (idCol, replica, h) for the k winning
    * tickets, ascending h.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      k: Int,
      seed: String): DataFrame = {
    val replicated = df
      .filter(weightCol >= 1)
      .select(col(idCol), explode(sequence(lit(1), weightCol.cast("int"))).as("replica"))
    replicated
      .withColumn("h",
        hash60(concat(lit(seed + ":"), col(idCol).cast("string"),
          lit(":"), col("replica").cast("string"))))
      .orderBy("h", idCol, "replica")
      .limit(k)
  }

  /** Exact weighted sampling with ONE ticket per row and fractional
    * weights welcome: Efraimidis–Spirakis order sampling. Each row draws
    * the uniform `u = (hash60(seed, id) + 1) / 2^60 ∈ (0, 1]` and the key
    * `-ln(u) / w` — an Exponential(rate = w) variate, so the k smallest
    * keys per group are the weighted-without-replacement sample in which
    * every successive draw selects a row with probability proportional to
    * its weight among the rows remaining (Efraimidis & Spirakis 2006,
    * in the equivalent `u^(1/w)` max-key form). At k = 1 inclusion
    * probability is exactly w / Σw; no ticket replication, so a
    * weight-1000.5 row costs the same one ticket as a weight-1 row.
    *
    * Like [[bottomK]] this rides the native `graft_bottom_k` aggregate:
    * each map task ships at most k (key, id) pairs per group, O(groups×k)
    * shuffle whatever the table size, and the sample is a pure function
    * of (seed, data) — reproducible across runs, engines and
    * partitionings. The minimum-key order (hence membership AND rank) is
    * replayable in SQL from the same hash arithmetic; ln() may wobble by
    * 1 ulp between engines, astronomically below the typical gap between
    * adjacent keys, so rank outputs compare exactly (q147's oracle).
    *
    * Rows with weight <= 0 (or null weight/id) are excluded — zero weight
    * means "never sample me", and a negative rate has no Exponential.
    * Output: groupCols ++ (idCol, rk) with rk in 1..k by key order.
    */
  /** The Efraimidis–Spirakis ticket key as a column expression —
    * `-ln((hash60(seed, id) + 1) / 2^60) / w`, an Exponential(rate = w)
    * draw that is a pure function of (seed, id, w). Shared by
    * [[weightedBottomK]] and its streaming twin
    * (StreamingJobs.samplerWeightedBottomK) so both rank identical keys.
    *
    * Cross-engine float posture (the measured counterpart of
    * Guards.lnMicronatFloor's in-plan certificate — an ordering key has
    * no single column for a boundary guard to ride, the boundary is
    * BETWEEN rows): a rank flips only if two keys sit within the ~1-ulp
    * (≈1e-16 relative) libm ln skew of each other. Measured minimum
    * relative gap between rank-ADJACENT keys (graft.tools.FloatMargin):
    * q147's global ranking 3.4e-5 at sf0.01 / 6.5e-9 at sf0.1, q151's
    * per-language rankings 6.4e-5 / 8.2e-8 — ≥ 7 orders of magnitude of
    * headroom over the wobble, over EVERY adjacent pair (the oracle
    * only compares the top-k, whose gaps are far wider than the bulk
    * minimum). Birthday arithmetic says the headroom shrinks ~linearly
    * in corpus size, still ≥ 4 orders at 10^4× the measured scale.
    * (h + 1) adds as INTEGER first, then one cast: 2^60 > 2^53, so
    * cast-then-add would round differently than add-then-cast, and the
    * oracle must replay the exact same order of operations. Dividing by
    * 2^60 is exact (power of two — exponent shift, no rounding). */
  def esKey(seed: String, idCol: Column, weightCol: Column): Column = {
    val u = (hash60(seed, idCol) + lit(1L)).cast("double") /
      lit((1L << 60).toDouble)
    -log(u) / weightCol.cast("double")
  }

  def weightedBottomK(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      weightCol: Column,
      k: Int,
      seed: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val key = esKey(seed, col(idCol), weightCol)
    val picked = df
      .filter(weightCol > 0)
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_bottom_k", key, col(idCol), lit(k)).as("__bk"))
    picked
      .select(groupCols.map(col) :+ posexplode(col("__bk")).as(Seq("__pos", "__kv")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__kv.v").as(idCol),
        (col("__pos") + 1).cast("int").as("rk")): _*)
  }
}
