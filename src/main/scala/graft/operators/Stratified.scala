package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neyman-allocated stratified sampling (Neyman 1934, the optimal
  * allocation for estimating a population mean under a fixed budget):
  * split a sample budget across strata proportionally to N_h·S_h — big
  * AND volatile strata get the draws; a huge but constant stratum needs
  * almost none. The design half of the sampling family (B50/B59 draw
  * coordinated/weighted samples; B113 expands them; this decides HOW
  * MANY to draw where), and the sample itself is materialized by
  * deterministic hash rank so the whole chain replays in any engine.
  *
  * Exact-integer determinism contract:
  *  - y must be NON-NEGATIVE (enforced in-plan per stratum: on
  *    non-negative operands every engine's integer division agrees;
  *    sign-mixed division is an engine-version hazard (an r14
  *    spot-measurement found current DuckDB's `//` truncating like
  *    Spark's `div`, but that is not a contract either side documents)
  *    and the "FLOORED stratum mean" claim below would be ambiguous —
  *    the Ablation posture);
  *  - per-stratum spread S_h = isqrt(Σ(y − μ̂)² div (n_h − 1)) with
  *    μ̂_h the FLOORED stratum mean — a two-pass integer variance (the
  *    one-pass n·Σy² − (Σy)² form overflows int64 at corpus scale; the
  *    mean-shifted sum stays ≤ n_h·range² and THAT bound is enforced
  *    in-plan: n_h ≤ ((2^63−1) div range) div range, division-only so
  *    the check itself cannot wrap — [[Guards]]) and an EXACT integer
  *    sqrt (floor(sqrt(double)) corrected ±1 by squaring — portable
  *    where a raw double sqrt can straddle a boundary);
  *  - allocation = largest-remainder apportionment of `budget` over
  *    w_h = n_h·S_h (the q166 pattern: floor quotas, extras to the
  *    largest remainders, ties to the smaller stratum), capped at n_h
  *    (no redistribution — a stratum smaller than its Neyman share
  *    simply saturates; callers with many tiny strata should raise the
  *    budget or pre-merge strata); both products n_h·S_h and
  *    budget·w_h carry division-only in-plan overflow guards, and the
  *    weight total Σw is summed in DECIMAL(38,0) with a guarded cast
  *    back to long (per-stratum w is bounded, the cross-strata sum is
  *    not — an int64 sum could wrap);
  *  - membership = the alloc_h smallest rows of each stratum under
  *    (hash60("strat:" + key), key) — same deterministic-sample posture
  *    as B57's negative sampling.
  *
  * Membership is NEVER a raw-row rank: a row_number window partitioned
  * by stratum serializes the corpus into one sort task per stratum
  * (5 strata over 100 TB = 5 single-task 20 TB sorts). Two scale paths
  * instead:
  *  - budget ≤ `bottomKCap`: the native `graft_bottom_k` aggregate
  *    (plans/BottomKAgg.scala) keyed by (hash60, key) with payload y —
  *    ONE partial-agg'd shuffle shipping at most `budget` pairs per
  *    stratum per map task, O(strata × budget) total, then the bounded
  *    per-stratum array is sliced to alloc_h rows;
  *  - budget > `bottomKCap` (heap-per-buffer would be too large): a
  *    two-pass hash-threshold filter — broadcast per-stratum thresholds
  *    t_h ≈ (2·alloc_h + 64)/n_h of the 2^60 hash space, keep only rows
  *    hashing under t_h (expected 2·alloc_h + 64 survivors per stratum,
  *    so the per-stratum rank that follows sorts O(alloc) rows, bounded
  *    by the BUDGET, not the data), and PROVE the filter kept the true
  *    sample: membership is exact iff ≥ alloc_h rows survived (every
  *    survivor hashes strictly below every dropped row), enforced
  *    in-plan with a loud refusal on the astronomically-unlucky
  *    undersample (Chernoff: mean 2·alloc + 64 vs need alloc). The
  *    survivor counts are aggregated FROM the allocation side (left
  *    join), so even a stratum with ZERO survivors — which has no row
  *    for a survivors-only groupBy to emit — hits the refusal instead
  *    of surfacing as a silent NULL sample mean.
  *
  * Scale shape: two partial-agg'd passes for the moments (the stratum
  * dictionary broadcasts back), bounded-frame apportionment windows
  * (strata counts, not rows), and one of the two budget-bounded
  * membership paths above. Guards: all-zero weights refuse loudly (no
  * variance anywhere ⇒ Neyman is undefined; use proportional q166
  * instead).
  *
  * Returns one row per stratum:
  * `(stratum, n_h, sd, alloc, full_mean, samp_mean)` — means floored to
  * y's units; samp_mean NULL for a zero-allocation stratum.
  */
object Stratified {
  private val M = Long.MaxValue

  def neymanSample(df: DataFrame, stratum: Column, y: Column, key: Column,
      budget: Int): DataFrame =
    neymanSample(df, stratum, y, key, budget, bottomKCap = 100000)

  /** `bottomKCap` picks the membership path (see object doc); exposed
    * package-private so the spec can force the hash-threshold path at
    * small budgets and pin the two paths row-identical. `overfetchSlack`
    * is the +64 constant in the hash-threshold overfetch t_h ≈
    * (2·alloc_h + slack)/n_h — spec-injectable (a negative slack forces
    * thr ≤ 0, i.e. a zero-survivor stratum) so the undersample refusal
    * is pinnable; production always uses 64. */
  private[graft] def neymanSample(df: DataFrame, stratum: Column, y: Column,
      key: Column, budget: Int, bottomKCap: Int,
      overfetchSlack: Int = 64): DataFrame = {
    require(budget >= 1 && budget <= 100000000,
      s"Stratified.neymanSample wants budget in [1, 10^8], got $budget")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val rows = graft.Q.persistOnce(
      df.select(stratum.as("st"), y.cast("long").as("y"), key.as("k")))
    // pass 1: per-stratum moments. The floored mean rides the full guard
    // set (consumed by pass 2): y >= 0, sum bound n_h·max ≤ 2^63−1, and
    // the pass-2 ssq bound n_h·range² ≤ 2^63−1 — all checks division-only
    // so the guard itself cannot wrap.
    val m = rows.groupBy("st")
      .agg(count(lit(1)).as("n_h"), sum("y").as("sy"),
        min("y").as("mn"), max("y").as("mx"))
      .withColumn("mu",
        Guards(
          col("mn") >= 0L &&
            col("n_h") <= expr(s"${M}L div greatest(mx, 1L)") &&
            col("n_h") <= expr(
              s"(${M}L div greatest(mx - mn, 1L)) div greatest(mx - mn, 1L)"),
          expr("sy div n_h"),
          Guards.msg("stratified",
            lit("stratum "), col("st").cast("string"),
            lit(" leaves the integer domain (min="), col("mn").cast("string"),
            lit(", max="), col("mx").cast("string"),
            lit(", n="), col("n_h").cast("string"),
            lit("): y must be non-negative with n_h*max and n_h*range^2 "),
            lit("below 2^63 - rescale y to a coarser grid"))))
    // pass 2: mean-shifted sum of squares (exact — μ̂ is an integer).
    // The moments re-aggregate here (same shuffle, zero extra passes) so
    // the frame ends in a DIRECT Aggregate — BoundedWindow.aggregated's
    // lineage walk does not cross joins, and the apportionment windows
    // below need the proven-bounded frame.
    val v = rows.join(m.select(col("st"), col("mu")), "st")
      .groupBy("st")
      .agg(
        count(lit(1)).as("n_h"), sum("y").as("sy"),
        sum((col("y") - col("mu")) * (col("y") - col("mu"))).as("ssq"))
      .withColumn("variance",
        when(col("n_h") > 1L, expr("ssq div (n_h - 1)")).otherwise(0L))
    // exact integer sqrt: double sqrt is within ±1 of isqrt for any
    // int64; squaring the two neighbours pins the floor exactly
    val sd = v
      .withColumn("r0", floor(sqrt(col("variance").cast("double"))).cast("long"))
      .withColumn("sd",
        when((col("r0") + 1L) * (col("r0") + 1L) <= col("variance"), col("r0") + 1L)
          .when(col("r0") * col("r0") > col("variance"), col("r0") - 1L)
          .otherwise(col("r0")))
      // Neyman weight w = n_h·sd, guarded so that both w and the
      // apportionment product budget·w stay inside int64
      .withColumn("w",
        Guards(
          col("sd") <= expr(s"${M / budget.toLong}L div greatest(n_h, 1L)"),
          col("n_h") * col("sd"),
          Guards.msg("stratified",
            lit("stratum "), col("st").cast("string"),
            lit(" Neyman weight n_h*sd = "), col("n_h").cast("string"),
            lit("*"), col("sd").cast("string"),
            lit(s" would overflow budget*w (budget=$budget) - rescale y"))))
    // largest-remainder apportionment of the budget over w_h (q166).
    // tw = Σw is summed in DECIMAL(38,0): each w is bounded at
    // (2^63−1)/budget but the SUM across strata is not — several strata
    // near the cap would wrap an int64 sum into either a spurious
    // zero-spread refusal (negative wrap) or silently wrong
    // largest-remainder quotas (positive wrap). The decimal sum is exact
    // up to 10^38 and the cast back to long is guarded.
    val agg = graft.operators.BoundedWindow.aggregated(sd, "per-stratum weights")
    val tw = agg.agg(sum(col("w").cast("decimal(38,0)")).as("twd"))
    val base = agg.crossJoin(broadcast(tw))
      .withColumn("tw",
        Guards(col("twd") <= lit(M).cast("decimal(38,0)"),
          col("twd").cast("long"),
          Guards.msg("stratified",
            lit("total Neyman weight sum(n_h*sd) = "), col("twd").cast("string"),
            lit(" overflows int64 - rescale y to a coarser grid or "),
            lit("pre-merge strata"))))
      .withColumn("base",
        Guards(col("tw") > 0L, expr(s"($budget * w) div tw"),
          lit("[stratified] every stratum has zero spread - Neyman weights are " +
            "all zero; allocate proportionally (q166 apportionment) instead")))
      .withColumn("rem", expr(s"($budget * w) % tw"))
    val used = base.agg(sum("base").as("allocated"))
    val win = graft.operators.BoundedWindow.orderBy((-col("rem")).as("neg_rem"), col("st"))
    val alloc = base.crossJoin(broadcast(used))
      .withColumn("rk", row_number().over(win))
      .withColumn("alloc",
        least(col("base") +
          when(col("rk") <= lit(budget.toLong) - col("allocated"), 1L).otherwise(0L),
          col("n_h")))
      .select(col("st"), col("n_h"), col("sd"), col("alloc"), col("sy"))
    // deterministic membership: the alloc_h smallest rows per stratum
    // under the seeded hash order — via one of the two budget-bounded
    // paths (object doc); never a raw-row rank.
    val h = graft.functions.GraftFunctions.hash60("strat", col("k"))
    val samp =
      if (budget <= bottomKCap) {
        // one partial-agg'd shuffle: ≤ budget (hash,key,y) pairs per
        // stratum leave each map task; slice the rank-ordered array to
        // alloc_h and fold the sample sum out of it
        val bk = rows.groupBy("st")
          .agg(call_function("graft_bottom_k",
            struct(h.as("h"), col("k").as("k")), col("y"), lit(budget)).as("bk"))
        bk.join(broadcast(alloc.select(col("st"), col("alloc"))), "st")
          .select(col("st"),
            aggregate(slice(col("bk"), lit(1), col("alloc").cast("int")),
              lit(0L), (acc, x) => acc + x.getField("v")).as("ssum"),
            least(col("alloc"), size(col("bk")).cast("long")).as("scnt"))
      } else {
        // two-pass hash-threshold: keep rows hashing under
        // t_h ≈ (2·alloc+slack)/n_h of the 2^60 space, rank the O(alloc)
        // survivors per stratum, and PROVE no undersample in-plan
        val full = 1L << 60
        val thr = graft.Q.persistOnce(
          alloc.select(col("st"), col("alloc"), col("n_h").as("nh"))
            .withColumn("thr",
              when(lit(2L) * col("alloc") + overfetchSlack.toLong >= col("nh"), lit(full))
                .otherwise(expr(s"${full}L div nh") *
                  greatest(lit(0L), lit(2L) * col("alloc") + lit(overfetchSlack.toLong)))))
        val hwin = Window.partitionBy("st").orderBy(col("h"), col("k"))
        val surv = rows.withColumn("h", h)
          .join(broadcast(thr), "st")
          .filter(col("h") < col("thr"))
          .withColumn("hrk", row_number().over(hwin))
          .groupBy("st")
          .agg(
            sum(when(col("hrk") <= col("alloc"), col("y")).otherwise(0L)).as("ssum0"),
            sum(when(col("hrk") <= col("alloc"), 1L).otherwise(0L)).as("scnt0"),
            count(lit(1)).as("cntf"))
        // aggregate FROM the allocation side: a stratum whose rows all
        // hash at or above t_h has no survivor row at all, so a
        // survivors-only groupBy would skip the undersample guard and the
        // final left join would emit samp_mean NULL silently. The guard
        // rides scnt, which the final projection consumes UNCONDITIONALLY
        // (inside the when-condition's coalesce), so it cannot be skipped
        // by lazy branch evaluation either.
        thr.join(surv, Seq("st"), "left")
          .select(col("st"),
            coalesce(col("ssum0"), lit(0L)).as("ssum"),
            Guards(coalesce(col("cntf"), lit(0L)) >= col("alloc"),
              coalesce(col("scnt0"), lit(0L)),
              Guards.msg("stratified",
                lit("hash-threshold undersampled stratum "), col("st").cast("string"),
                lit(": kept "), coalesce(col("cntf"), lit(0L)).cast("string"),
                lit(" rows for an allocation of "), col("alloc").cast("string"),
                lit(" - raise the overfetch slack"))).as("scnt"))
      }
    alloc.join(samp, Seq("st"), "left")
      .select(col("st").as("stratum"), col("n_h"), col("sd"), col("alloc"),
        expr("sy div n_h").as("full_mean"),
        when(coalesce(col("scnt"), lit(0L)) > 0L, expr("ssum div scnt")).as("samp_mean"))
  }
}
