package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact evaluation/monitoring statistics a training-data pipeline runs
  * over its own outputs: two-sample Kolmogorov–Smirnov drift detection
  * between corpus snapshots, exact ROC-AUC (Mann–Whitney with tie
  * correction) for quality-filter models, and Cohen's kappa for
  * rater/classifier agreement.
  *
  * All three are computed in pure integer arithmetic and emitted as exact
  * rationals (numerator/denominator BIGINT pairs) so a SQL oracle replays
  * them bit-identically — no float aggregation anywhere. The integer
  * products bound exactness to n1*n2 < 2^63 (samples of ~3e9 rows each);
  * beyond that, pre-bin the metric to quantiles first (B19's sketches)
  * and run the same statistic over the binned counts.
  *
  * Scale shape: both KS and AUC reduce the corpus to per-distinct-value
  * counts with one partial-aggregated shuffle, then take cumulative
  * counts through [[PrefixSum.runningSums]] (range-repartitioned, never a
  * single-partition window). Kappa is two bounded aggregations over an
  * already-tiny confusion matrix.
  */
object EvalMetrics {

  /** Two-sample KS distance between rows where `inFirst` is true (sample
    * 1) and the rest (sample 2), over `value`. Output (one row):
    * n1, n2, d_num, d_den, ks_at — where D = d_num/d_den and ks_at is the
    * smallest value attaining the sup (ties on the statistic break toward
    * the smaller value, making the row deterministic).
    */
  def ksTest(df: DataFrame, inFirst: Column, value: Column): DataFrame = {
    val perV = df
      .select(inFirst.cast("boolean").as("s1"), value.as("v"))
      .groupBy("v")
      .agg(
        sum(when(col("s1"), 1L).otherwise(0L)).as("p"),
        sum(when(col("s1"), 0L).otherwise(1L)).as("q"))
    val cum = PrefixSum.runningSums(perV, Seq(col("v")), Seq("p", "q"))
    val tot = cum.agg(sum("p").as("n1"), sum("q").as("n2"))
    // |F1(v) - F2(v)| cleared of denominators: |c1*n2 - c2*n1| over n1*n2.
    cum.crossJoin(broadcast(tot))
      .select(
        col("n1"), col("n2"), col("v"),
        abs(col("c_p") * col("n2") - col("c_q") * col("n1")).as("diff"))
      .orderBy(col("diff").desc, col("v"))
      .limit(1)
      .select(
        col("n1"), col("n2"), col("diff").as("d_num"),
        (col("n1") * col("n2")).as("d_den"), col("v").as("ks_at"))
  }

  /** Exact ROC-AUC of `score` against boolean `positive`, with the
    * standard tie treatment (ties count 1/2). Output (one row): n_pos,
    * n_neg, auc_num, auc_den with AUC = auc_num/auc_den; the numerator is
    * 2U (Mann–Whitney U doubled so half-credits stay integral):
    * 2U = Σ over distinct scores s of pos(s) * (2*negs_below(s) + neg(s)).
    */
  def rocAuc(df: DataFrame, positive: Column, score: Column): DataFrame = {
    val perS = df
      .select(positive.cast("boolean").as("y"), score.as("s"))
      .groupBy("s")
      .agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("p"),
        sum(when(col("y"), 0L).otherwise(1L)).as("q"))
    val cum = PrefixSum.runningSums(perS, Seq(col("s")), Seq("q"))
    cum
      .agg(
        sum(col("p")).as("n_pos"),
        sum(col("q")).as("n_neg"),
        sum(col("p") * (lit(2L) * (col("c_q") - col("q")) + col("q"))).as("auc_num"))
      .select(
        col("n_pos"), col("n_neg"), col("auc_num"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den"))
  }

  /** Cohen's kappa from a confusion frame (`aCol` = rater/truth label,
    * `bCol` = second rater/prediction, `cntCol` = pair count). Exact
    * rational: kappa = (N*agree - Σ_k row_k*col_k) / (N² - Σ_k row_k*col_k).
    * Output (one row): n, agree, kappa_num, kappa_den. Categories seen by
    * only one rater contribute 0 to the expected-agreement term (their
    * other marginal is 0), which the inner marginal join encodes.
    */
  def cohenKappa(confusion: DataFrame, aCol: String, bCol: String, cntCol: String): DataFrame = {
    val totals = confusion.agg(
      sum(col(cntCol)).as("n"),
      sum(when(col(aCol) === col(bCol), col(cntCol)).otherwise(0L)).as("agree"))
    val rowsM = confusion.groupBy(col(aCol).as("k")).agg(sum(col(cntCol)).as("ra"))
    val colsM = confusion.groupBy(col(bCol).as("k")).agg(sum(col(cntCol)).as("cb"))
    val pe = rowsM.join(colsM, "k")
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)).as("pe_num"))
    totals.crossJoin(broadcast(pe))
      .select(
        col("n"), col("agree"),
        (col("n") * col("agree") - col("pe_num")).as("kappa_num"),
        (col("n") * col("n") - col("pe_num")).as("kappa_den"))
  }
}
