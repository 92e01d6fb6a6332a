package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AMS (Alon–Matias–Szegedy 1996) sign sketch over per-key counts — the
  * join-size / second-frequency-moment estimator that completes the
  * sketch family (B18 HLL distinct, B19 quantiles, B40 heavy hitters,
  * B68 Bloom membership, B69 KMV Jaccard): s_j = Σ_k c(k)·sgn_j(k) with
  * sgn_j(k) = ±1 from the portable hash60("ams<j>:" + k) parity, so
  * E[s_j(A)·s_j(B)] = Σ_k c_A(k)·c_B(k) = |A ⋈ B| — the classic
  * one-pass, mergeable (sketches of unions add) cardinality-planner
  * input. Estimators combine by MEDIAN-OF-MEANS (g groups of j/g),
  * the standard variance/outlier control; the group means use an
  * explicit flooring division and the median is the (g+1)/2-th order
  * statistic, so the whole estimate is exact integer arithmetic any SQL
  * engine replays bit-identically — including the estimator's ERROR,
  * which makes the accuracy claim itself oracle-checkable.
  *
  * Scale shape: the sketch is TALL, not wide — the counts dictionary
  * explodes ×j and reduces through one partial-agg'd groupBy(j) to j
  * rows (wide codegen with j separate sums ships a megabyte task
  * binary and caps j at what the JIT tolerates; the tall shape is
  * O(j) rows of state and works unchanged at j = 1024). The estimate
  * is a j-row equi-join plus two bounded aggregates.
  */
object AmsSketch {

  /** Sign sketch of the `(keyCol, cntCol)` counts frame: j rows
    * `(j, s)` plus the total `n` (= Σ counts, carried on every row for
    * the estimate's overflow guard). */
  def sketch(counts: DataFrame, keyCol: String, cntCol: String, j: Int): DataFrame = {
    require(j >= 2 && j <= 4096, s"AmsSketch wants 2..4096 estimators, got $j")
    val tot = counts.agg(coalesce(sum(col(cntCol)), lit(0L)).as("n"))
    counts
      .select(col(keyCol).cast("string").as("k"), col(cntCol).as("c"))
      .select(explode(sequence(lit(0), lit(j - 1))).as("j"), col("k"), col("c"))
      .select(col("j"),
        (col("c") * (lit(1L) - lit(2L) *
          (graft.functions.GraftFunctions.hash60(
            concat(lit("ams"), col("j").cast("string"), lit(":"), col("k"))) % 2L)))
          .as("t"))
      .groupBy("j").agg(coalesce(sum("t"), lit(0L)).as("s"))
      .crossJoin(broadcast(tot))
  }

  /** Join-size estimate from two [[sketch]] frames (same `j`): one
    * output row `(n_a, n_b, est)` where est = median over `g` groups of
    * the FLOORED mean of j/g estimator products (explicit floorDiv —
    * group sums can be negative, and Spark's truncating `div` must match
    * the oracle's flooring `//`). Guard: every product |s_a·s_b| ≤
    * n_a·n_b and a group sums j/g of them, so n_a·n_b·(j/g) < 2^63 is
    * required in-plan (refuse-loudly; downscale counts caller-side
    * beyond it). */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame, j: Int, g: Int): DataFrame = {
    require(g >= 1 && j % g == 0, s"g must divide j, got j=$j g=$g")
    val per = (j / g).toLong
    val cap = Long.MaxValue / per
    val a = skA.select(col("j"), col("s").as("sa"), col("n").as("n_a"))
    val b = skB.select(col("j"), col("s").as("sb"), col("n").as("n_b"))
    a.join(b, "j")
      .select(expr(s"j div ${per}L").as("grp"), col("n_a"), col("n_b"),
        graft.operators.Guards(col("n_a") <= expr(s"${cap}L div greatest(n_b, 1L)"),
          col("sa") * col("sb"),
              lit(
            s"[ams] n_a*n_b*$per >= 2^63: estimator sums could overflow — " +
              "downscale the counts before sketching"))
          .as("p"))
      .groupBy("grp", "n_a", "n_b").agg(sum("p").as("gs"))
      .select(col("n_a"), col("n_b"), expr(
        s"gs div ${per}L - (CASE WHEN gs < 0 AND gs % ${per}L != 0 THEN 1L ELSE 0L END)")
        .as("mean"))
      .groupBy("n_a", "n_b")
      .agg(element_at(sort_array(collect_list(col("mean"))), (g + 1) / 2).as("est"))
  }
}
