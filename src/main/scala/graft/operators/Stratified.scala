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
  *  - per-stratum spread S_h = isqrt(Σ(y − μ̂_h)² div (n_h − 1)) with
  *    μ̂_h the FLOORED stratum mean — a two-pass integer variance (the
  *    one-pass n·Σy² − (Σy)² form overflows int64 at corpus scale; the
  *    mean-shifted sum stays ≤ n·range²) and an EXACT integer sqrt
  *    (floor(sqrt(double)) corrected ±1 by squaring — portable where a
  *    raw double sqrt can straddle a boundary);
  *  - allocation = largest-remainder apportionment of `budget` over
  *    w_h = n_h·S_h (the q166 pattern: floor quotas, extras to the
  *    largest remainders, ties to the smaller stratum), capped at n_h
  *    (no redistribution — a stratum smaller than its Neyman share
  *    simply saturates; callers with many tiny strata should raise the
  *    budget or pre-merge strata);
  *  - membership = the first alloc_h rows of each stratum under
  *    (hash60("strat:" + key), key) — per-stratum GROUPED rank, same
  *    deterministic-sample posture as B57's negative sampling.
  *
  * Scale shape: two partial-agg'd passes for the moments (the stratum
  * dictionary broadcasts back), bounded-frame apportionment windows
  * (strata counts, not rows), and one GROUPED rank window for
  * membership. Guards: all-zero weights refuse loudly (no variance
  * anywhere ⇒ Neyman is undefined; use proportional q166 instead).
  *
  * Returns one row per stratum:
  * `(stratum, n_h, sd, alloc, full_mean, samp_mean)` — means floored to
  * y's units; samp_mean NULL for a zero-allocation stratum.
  */
object Stratified {
  private def guard(ok: Column, pass: Column, msg: Column): Column =
    when(ok, pass).otherwise(raise_error(msg).cast("long"))

  def neymanSample(df: DataFrame, stratum: Column, y: Column, key: Column,
      budget: Int): DataFrame = {
    require(budget >= 1 && budget <= 100000000,
      s"Stratified.neymanSample wants budget in [1, 10^8], got $budget")
    val rows = graft.Q.persistOnce(
      df.select(stratum.as("st"), y.cast("long").as("y"), key.as("k")))
    val m = rows.groupBy("st").agg(count(lit(1)).as("n_h"), sum("y").as("sy"))
      .withColumn("mu", expr("sy div n_h"))
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
      .withColumn("w", col("n_h") * col("sd"))
    // largest-remainder apportionment of the budget over w_h (q166)
    val agg = graft.operators.BoundedWindow.aggregated(sd, "per-stratum weights")
    val tw = agg.agg(sum("w").as("tw"))
    val base = agg.crossJoin(broadcast(tw))
      .withColumn("base",
        guard(col("tw") > 0L, expr(s"($budget * w) div tw"),
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
    // deterministic membership: first alloc_h rows per stratum under the
    // seeded hash order (GROUPED window - partition-parallel)
    val hwin = Window.partitionBy("st")
      .orderBy(graft.functions.GraftFunctions.hash60("strat", col("k")), col("k"))
    val samp = rows
      .withColumn("hrk", row_number().over(hwin))
      .join(alloc.select(col("st"), col("alloc")), "st")
      .filter(col("hrk") <= col("alloc"))
      .groupBy("st").agg(sum("y").as("ssum"), count(lit(1)).as("scnt"))
    alloc.join(samp, Seq("st"), "left")
      .select(col("st").as("stratum"), col("n_h"), col("sd"), col("alloc"),
        expr("sy div n_h").as("full_mean"),
        when(coalesce(col("scnt"), lit(0L)) > 0L, expr("ssum div scnt")).as("samp_mean"))
  }
}
