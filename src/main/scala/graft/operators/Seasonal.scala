package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition over a monthly grid
  * (Hyndman & Athanasopoulos, *Forecasting: Principles and Practice*,
  * §3.4 "classical decomposition") — the operator form of what shipped
  * inline (and hardcoded to three crops) in q267's registration in r14:
  * any (key, month, value) monthly series decomposes into
  * trend + seasonal + residual on the exact integer grid.
  *
  * Semantics, all pure int64:
  *
  *  1. **calendar fill** (the q107 idiom): each key's observed months
  *     expand to the full min..max month sequence, gaps carrying NULL —
  *     the moving average below must see CALENDAR windows, not
  *     observation windows, or a gap silently shifts every frame after
  *     it;
  *  2. **trend** = the centered 2×12 moving average, computed as
  *     (SUM rows(−6,+5) + SUM rows(−5,+6)) tdiv 24 — the half-weight
  *     endpoints of the textbook 2×12 MA fall out of the two-frame sum
  *     identity — defined only where all 13 calendar months of the
  *     window have data;
  *  3. **detrended** d = value − trend (sign-mixed by construction);
  *  4. **seasonal index** = per (key, month-of-year) mean of d,
  *     emitted through [[tdiv]];
  *  5. **residual** = d − seasonal.
  *
  * [[tdiv]] is the PORTABLE truncating division: `x div y` on
  * sign-mixed integers is an engine-version hazard (Spark `div`
  * truncates toward zero; DuckDB documented `//` as flooring and
  * currently truncates — r14 measured `-7 // 2 = -3`, its older docs
  * say −4), so no sign-mixed numerator ever meets a bare division:
  * both branches of `CASE WHEN num >= 0 THEN num div den ELSE
  * -((-num) div den) END` divide NON-NEGATIVES, where floor ≡ truncate
  * in every engine and every version. Oracles replay the identical
  * CASE text.
  *
  * Integer domain, guarded in-plan at intake: |value| ≤ 2^40 and
  * per-key calendar span ≤ 2^20 months keep every sum in the plan
  * (24-term window sums ≤ 2^45, per-month-of-year detrended sums ≤
  * 2^61) inside int64 — outside the domain the intake refuses loudly
  * (rescale the value grid), never a silent wrap.
  *
  * Scale shape: the caller hands a MONTHLY grid (one corpus-scale
  * grouped aggregate upstream); everything here runs per key over
  * ≤ span-many rows — grouped bounded-ROWS window frames, one
  * (key, moy) aggregate, one join back. No corpus-scale window, no
  * cross-key anything. Eligibility (`eligibleMinN`) drops keys with
  * fewer than that many observations (Σ nCol) BEFORE the windows run,
  * so a 100-TB corpus's long tail of sparse keys never reaches the
  * per-key frames.
  *
  * Input: one row per OBSERVED (key, month): `keyCol`, `monthCol`
  * (DateType, already truncated to month starts), `nCol` (observation
  * count backing the month's value), `valCol` (int64 value, e.g. a
  * paise mean). Output: (`keyCol`, month, n, value, trend, seasonal,
  * residual) for exactly the months where the trend is defined.
  */
object Seasonal {

  def classicalMonthly(
      monthly: DataFrame,
      keyCol: String,
      monthCol: String,
      nCol: String,
      valCol: String,
      eligibleMinN: Long = 0L): DataFrame = {
    val g = monthly.select(
      col(keyCol).as("k"), col(monthCol).as("month"),
      col(nCol).cast("long").as("n"),
      Guards(abs(col(valCol).cast("long")) <= lit(1L << 40),
        col(valCol).cast("long"),
        Guards.msg("seasonal",
          lit("value "), col(valCol).cast("string"),
          lit(" for key "), col(keyCol).cast("string"),
          lit(" exceeds the 2^40 window-sum domain - rescale the value "),
          lit("grid"))).as("mu"))
    val elig = g.groupBy("k").agg(sum("n").as("__tot"))
      .filter(col("__tot") >= eligibleMinN).select("k")
    val ge = g.join(elig, "k")
    // calendar fill; the span guard rides the consumed d0 column
    val cal = ge.groupBy("k")
      .agg(min("month").as("d0"), max("month").as("d1"))
      .select(col("k"),
        explode(sequence(
          Guards(months_between(col("d1"), col("d0")) <= lit((1L << 20).toDouble),
            col("d0"),
            Guards.msg("seasonal",
              lit("key "), col("k").cast("string"),
              lit(" spans more than 2^20 months - not a monthly series"),
              lit(" (check the month column)")), castTo = "date"),
          col("d1"), expr("interval 1 month"))).as("month"))
    val filled = cal.join(ge, Seq("k", "month"), "left")
    val wA = Window.partitionBy("k").orderBy("month").rowsBetween(-6, 5)
    val wB = Window.partitionBy("k").orderBy("month").rowsBetween(-5, 6)
    val wC = Window.partitionBy("k").orderBy("month").rowsBetween(-6, 6)
    val tr = filled
      .withColumn("__sab", sum("mu").over(wA) + sum("mu").over(wB))
      .withColumn("__c13", count(col("mu")).over(wC))
      .withColumn("trend", when(col("__c13") === 13, tdiv(col("__sab"), 24)))
      .filter(col("trend").isNotNull)
      .select(col("k"), col("month"), col("n"), col("mu"), col("trend"),
        (col("mu") - col("trend")).as("d"), month(col("month")).as("__moy"))
    val sea = tr.groupBy("k", "__moy")
      .agg(sum("d").as("__sdet"), count(lit(1)).as("__ny"))
      .select(col("k"), col("__moy"),
        tdiv(col("__sdet"), col("__ny")).as("seasonal"))
    tr.join(sea, Seq("k", "__moy"))
      .select(col("k").as(keyCol), col("month"), col("n"), col("mu"),
        col("trend"), col("seasonal"),
        (col("d") - col("seasonal")).as("residual"))
  }

  /** Portable truncating integer division: both branches divide
    * non-negative operands, where floor and truncate agree in every
    * engine/version — never emit a sign-mixed `div` (see the object
    * doc). `call_function("div", …)` is IntegralDivide, same as
    * `expr("a div b")`, usable on anonymous expressions. The oracle
    * spelling is `CASE WHEN num >= 0 THEN num // den
    * ELSE -((-num) // den) END`, branch for branch. Package-private so
    * queries with their own column algebra reuse the exact spelling
    * their oracles replay. */
  private[graft] def tdiv(num: org.apache.spark.sql.Column, den: Any)
      : org.apache.spark.sql.Column = {
    val d = den match {
      case c: org.apache.spark.sql.Column => c
      case i: Int => lit(i.toLong)
      case l: Long => lit(l)
      case other => throw new IllegalArgumentException(s"tdiv den: $other")
    }
    when(num >= 0, call_function("div", num, d))
      .otherwise(-call_function("div", -num, d))
  }
}
