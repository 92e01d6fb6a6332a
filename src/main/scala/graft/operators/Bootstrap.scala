package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals for grouped means — THE
  * cluster-scale bootstrap (Chamandy et al. 2012, "Estimating
  * Uncertainty for Massive Data Streams"; Kleiner et al.'s BLB is the
  * other public lineage): the classical bootstrap resamples n rows WITH
  * replacement per replicate, which is a shuffle per replicate and
  * needs n known up front; the Poisson bootstrap instead gives every
  * row an INDEPENDENT Poisson(1) multiplicity per replicate, so all R
  * replicates ride ONE corpus pass with map-side partial aggregation —
  * the shuffle carries groups×R partial sums, never rows. Multinomial →
  * Poisson is the standard limit approximation and is exact enough for
  * CI work at any n a cluster would bootstrap.
  *
  * Determinism/integer posture: the multiplicity k is drawn by inverse
  * CDF over the hash60 uniform — u ∈ [0, 2⁶⁰) compared against the nine
  * PRECOMPUTED integer thresholds T_j = floor(P(K≤j)·2⁶⁰) (exact
  * 60-digit decimal arithmetic, baked as literals into plan AND oracle
  * — the NDCG posture: nothing floats at runtime). k = #{j : u ≥ T_j}
  * ∈ [0, 9]; the tail P(K>8) ≈ 1.1·10⁻⁶ draws k = 9 IDENTICALLY on
  * both engines — of it only P(K≥10) ≈ 1.1·10⁻⁷ is mass MISASSIGNED
  * to k = 9 (true K = 9 draws are exact), a bias ~10⁻⁷ of one row's
  * weight.
  * Replicate means land on the ppm grid by integer division of
  * non-negative sums (Spark `div` and DuckDB `//` agree there — y < 0
  * refuses at intake, the Ablation posture), and the percentile bounds
  * are exact order statistics over the R replicate means via ONE
  * `graft_bottom_k` aggregate per group (R ≤ 512 — the full sorted
  * array is a bounded payload), never a window over raw rows.
  *
  * A replicate whose k's all drew 0 (probability e⁻ⁿ per group — real
  * only for near-empty groups) has no defined mean and the guard
  * refuses loudly rather than silently skewing the order statistics.
  *
  * Sum posture: the intake bound makes each k·y term int64-safe; the
  * Σ k·y replicate sums are ANSI-loud past 2⁶³ (Spark 4 default,
  * pinned in AnsiOverflowSpec) — both engines error rather than
  * silently diverging on a ≥ 10¹⁸-mass group.
  */
object Bootstrap {

  /** Poisson(1) CDF on the 2⁶⁰ grid: T(j) = floor(P(K≤j)·2⁶⁰), j = 0..8
    * (e⁻¹·Σ_{i≤j} 1/i! at 60-digit precision; tail mass past j = 8 is
    * P(K>8) ≈ 1.1e-6, of which P(K≥10) ≈ 1.1e-7 folds into the k = 9
    * draw). Shared by the plan and the oracle-SQL builders. */
  val PoissonCdf60: Seq[Long] = Seq(
    424136118829305329L, // j=0, CDF .3678794411714423
    848272237658610659L, // j=1, .7357588823428847
    1060340297073263324L, // j=2, .9196986029286058
    1131029650211480879L, // j=3, .9810118431238462
    1148701988496035267L, // j=4, .9963401531726563
    1152236456152946145L, // j=5, .9994058151824183
    1152825534095764625L, // j=6, .9999167588507120
    1152909688087595836L, // j=7, .9999897508033253
    1152920207336574738L) // j=8, .9999988747974020

  /** k = #{j : u ≥ T_j} — the inverse-CDF Poisson(1) draw from a
    * 60-bit uniform, as a codegen'd 9-compare sum. */
  def poissonDraw(u: Column): Column =
    PoissonCdf60.map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _)

  /** Per-group percentile-bootstrap CI for mean(y) on the ppm grid.
    *
    * @param df    input rows
    * @param grp   group key
    * @param id    a row identity (unique per row within the group —
    *              drives the replicate hash)
    * @param y     the non-negative integral metric
    * @param reps  replicate count R (≤ 512)
    * @param seed  hash-family seed
    * @param loPpm,hiPpm percentile bounds in ppm of R (e.g. 25000/975000
    *              for the central 95%); the order statistic picked is
    *              ceil(pct·R), clamped to ≥ 1 — both indices resolved to
    *              integer literals at build time.
    * Output: (g, n, mean_ppm, lo_ppm, hi_ppm) — full-sample mean plus
    * the replicate-mean order statistics.
    */
  def meanCi(df: DataFrame, grp: Column, id: Column, y: Column,
      reps: Int, seed: String, loPpm: Long = 25000L, hiPpm: Long = 975000L): DataFrame = {
    require(reps >= 4 && reps <= 512, s"meanCi wants reps in [4,512], got $reps")
    require(0 <= loPpm && loPpm <= hiPpm && hiPpm <= 1000000L,
      s"meanCi wants 0 <= loPpm <= hiPpm <= 10^6, got ($loPpm, $hiPpm)")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val idxLo = math.max(1L, (loPpm * reps + 999999L) / 1000000L).toInt
    val idxHi = math.max(1L, (hiPpm * reps + 999999L) / 1000000L).toInt
    val base = df.select(grp.as("g"), id.cast("string").as("rid"),
      Guards(
        y.cast("long") >= 0L && y.cast("long") <= lit(Long.MaxValue / 9000000L),
        y.cast("long"),
        Guards.msg("bootstrap",
          lit("y = "), y.cast("string"),
          lit(" outside [0, 2^63/(9*10^6)] - negative means divide "),
          lit("differently across engines (div vs floor) and the k*y*10^6 "),
          lit("grid wraps; rescale the metric"))).as("y"))
    // ONE corpus pass: R-fold lateral expansion, immediately partial-
    // aggregated to (g, r) sums — the shuffle is groups x R rows.
    val repSums = base
      .select(col("g"), col("rid"), col("y"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .select(col("g"), col("r"), col("y"),
        poissonDraw(graft.functions.GraftFunctions.hash60(seed,
          concat(col("rid"), lit(":"), col("r").cast("string")))).as("k"))
      .groupBy("g", "r")
      .agg(sum(col("k") * col("y")).as("sky"), sum(col("k")).as("sk"))
    val repMeans = repSums.select(col("g"), col("r"),
      Guards(
        col("sk") > 0L && col("sky") <= lit(Long.MaxValue / 1000000L),
        expr("(sky * 1000000) div sk"),
        Guards.msg("bootstrap",
          lit("replicate "), col("r").cast("string"), lit(" of group "),
          col("g").cast("string"), lit(" drew sk="), col("sk").cast("string"),
          lit(", sky="), col("sky").cast("string"),
          lit(" - an empty replicate (near-empty group) or a wrapped "),
          lit("x10^6 grid; raise the group floor or rescale"))).as("mu_ppm"))
    // exact order statistics: ONE bottom-k over the R replicate means
    // (key = mean, ties to the replicate index — deterministic array)
    val ci = repMeans.groupBy("g")
      .agg(call_function("graft_bottom_k",
        col("mu_ppm"), col("r"), lit(reps), lit(false)).as("ord"))
      .select(col("g"),
        element_at(col("ord"), idxLo)("k").as("lo_ppm"),
        element_at(col("ord"), idxHi)("k").as("hi_ppm"))
    val full = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"))
      .select(col("g"), col("n"),
        Guards(
          col("sy") <= lit(Long.MaxValue / 1000000L),
          expr("(sy * 1000000) div n"),
          Guards.msg("bootstrap",
            lit("group "), col("g").cast("string"), lit(" sum "),
            col("sy").cast("string"),
            lit(" wraps the x10^6 mean grid; rescale the metric"))).as("mean_ppm"))
    full.join(ci, "g")
      .select(col("g"), col("n"), col("mean_ppm"), col("lo_ppm"), col("hi_ppm"))
  }

  /** DuckDB fragment replaying [[poissonDraw]] over a 60-bit uniform
    * expression `u` — the 9 threshold compares as a CASE sum. */
  def poissonDrawSql(u: String): String =
    PoissonCdf60.map(t => s"(CASE WHEN $u >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
}
