package graft

import java.sql.Date

import org.apache.spark.sql.functions._

/** operators.Seasonal.classicalMonthly — exact-recovery pins on synthetic
  * series with a KNOWN trend/seasonal split, plus the calendar-gap and
  * eligibility contracts. The q267 oracle replays the same algebra over
  * the real corpus; these pins prove the algebra itself.
  */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  /** Zero-sum 12-month seasonal pattern (sign-mixed on purpose: the
    * negative month-of-year sums exercise tdiv's negative branch). */
  private val seas =
    Array(60L, -30L, 25L, -55L, 10L, 0L, 20L, -40L, 35L, -15L, 5L, -15L)
  assert(seas.sum == 0L)

  private def monthOf(y: Int, m: Int): Date = Date.valueOf(f"$y-$m%02d-01")

  /** 48 months of value = 1000 + 7·t + seas[moy−1], t = 0..47 from
    * 2020-01. Linear trend + zero-sum seasonal means the 2×12 MA
    * recovers the linear part EXACTLY (each 12-window seasonal sum is
    * 0; the two 12-term trend sums add to 24·(1000 + 7t)). */
  private def series(key: String) = (0 until 48).map { t =>
    val y = 2020 + t / 12
    val m = t % 12 + 1
    (key, monthOf(y, m), 10L, 1000L + 7L * t + seas(m - 1))
  }

  test("exact recovery: linear trend + zero-sum seasonal decompose losslessly") {
    val df = series("s1").toDF("k", "month", "n", "mu")
    val out = operators.Seasonal
      .classicalMonthly(df, "k", "month", "n", "mu")
      .orderBy("month")
      .as[(String, Date, Long, Long, Long, Long, Long)]
      .collect()
    // trend defined exactly where the 13-month window is full: t = 6..41
    assert(out.length == 36, s"expected 36 trend-defined months, got ${out.length}")
    out.foreach { case (_, month, n, mu, trend, seasonal, residual) =>
      val t = (month.toLocalDate.getYear - 2020) * 12 + month.toLocalDate.getMonthValue - 1
      val moy = month.toLocalDate.getMonthValue
      assert(n == 10L)
      assert(mu == 1000L + 7L * t + seas(moy - 1))
      assert(trend == 1000L + 7L * t, s"trend at t=$t: got $trend")
      assert(seasonal == seas(moy - 1), s"seasonal at moy=$moy: got $seasonal")
      assert(residual == 0L, s"residual at t=$t: got $residual")
    }
    // the negative branch of the portable division actually ran
    assert(out.exists(_._6 < 0), "no negative seasonal index exercised")
  }

  test("calendar gap: a missing month voids exactly the 13-windows that cover it") {
    val gapT = 20 // drop 2021-09 (t = 20)
    val rows = series("g1").filterNot { case (_, d, _, _) =>
      d == monthOf(2021, 9)
    }
    val out = operators.Seasonal
      .classicalMonthly(rows.toDF("k", "month", "n", "mu"), "k", "month", "n", "mu")
      .select("month").as[Date].collect()
      .map(d => (d.toLocalDate.getYear - 2020) * 12 + d.toLocalDate.getMonthValue - 1)
      .toSet
    // trend-defined = t in 6..41 minus every t whose ±6 window touches 20
    val expected = (6 to 41).toSet -- (gapT - 6 to gapT + 6).toSet
    assert(out == expected, s"got $out")
  }

  test("eligibility: keys below the observation budget are dropped before the windows") {
    val big = series("big") // 48 months × n=10 = 480 observations
    val small = series("small").take(20) // 200 observations
    val df = (big ++ small).toDF("k", "month", "n", "mu")
    val keys = operators.Seasonal
      .classicalMonthly(df, "k", "month", "n", "mu", eligibleMinN = 300L)
      .select("k").distinct().as[String].collect().toSet
    assert(keys == Set("big"), s"got $keys")
  }

  test("intake refuses values outside the 2^40 window-sum domain") {
    val df = Seq(("x", monthOf(2020, 1), 1L, (1L << 41))).toDF("k", "month", "n", "mu")
    val e = intercept[Exception] {
      operators.Seasonal.classicalMonthly(df, "k", "month", "n", "mu").collect()
    }
    assert(e.getMessage.contains("[seasonal]"), e.getMessage)
  }

  test("tdiv truncates toward zero on both signs (the portable spelling)") {
    val df = Seq((7L, 2L), (-7L, 2L), (6L, 3L), (-6L, 3L)).toDF("a", "b")
    val got = df.select(operators.Seasonal.tdiv(col("a"), col("b")).as("q"))
      .as[Long].collect().toSeq
    assert(got == Seq(3L, -3L, 2L, -2L), got.toString)
  }
}
