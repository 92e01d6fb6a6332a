package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust statistics at scale: the shuffle-light tiers of the trimmed /
  * winsorized aggregates (the exact rank-trim tier lives in q141's
  * window formulation).
  */
object RobustStats {

  /** Approximate trimmed mean WITHOUT a per-group window sort — the
    * 100 TB tier of q141's exact rank trim.
    *
    * Two partial-aggregated passes, no sort anywhere: (1) per-group
    * t-digest sketches give the [trim, 1−trim] value thresholds —
    * O(δ) centroids per group however many rows, merged map-side;
    * (2) one scan keeps values inside the thresholds and averages them.
    * The thresholds table is groups × 2 doubles and broadcasts.
    *
    * Semantics note: this is a THRESHOLD trim (drop values outside the
    * estimated quantile values), the robust-statistics flavor that
    * tolerates sketch error gracefully; the exact tier's RANK trim drops
    * exactly ⌊trim·n⌋ rows per side. On tied boundary values the two
    * differ by the tie mass — q149 pins both tiers within a tolerance
    * band against each other, and TrimmedMeanSpec pins this operator
    * against the exact threshold trim on random data.
    *
    * Output: groupCols ++ (kept, trimmed_mean, lo, hi).
    */
  def trimmedMeanApprox(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      trim: Double): DataFrame = {
    require(trim > 0 && trim < 0.5, s"trim must be in (0, 0.5), got $trim")
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val v = col(valueCol).cast("double")
    val thresholds = df
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_tdigest", v, lit(trim), lit(1 - trim)).as("__t"))
      .select(groupCols.map(col) ++ Seq(
        col("__t").getItem(0).as("lo"), col("__t").getItem(1).as("hi")): _*)
    df.join(broadcast(thresholds), groupCols)
      .filter(v >= col("lo") && v <= col("hi"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("kept"), avg(v).as("trimmed_mean"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"))
  }
}
