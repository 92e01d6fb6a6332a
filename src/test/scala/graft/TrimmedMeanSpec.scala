package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.RobustStats

/** The sketch tier of the trimmed mean: accuracy against the exact
  * threshold trim, and the no-window-sort plan contract that makes it
  * the 100 TB path. */
class TrimmedMeanSpec extends SparkSpec {
  import spark.implicits._

  test("trimmedMeanApprox stays within 2% of the exact threshold trim") {
    val rnd = new Random(7)
    // lognormal-ish skew — the shape that makes plain means useless and
    // trims worth running
    val rows = (1 to 20000).map { i =>
      (s"g${i % 3}", math.exp(rnd.nextGaussian() * 1.2 + 3.0))
    }
    val df = rows.toDF("g", "v")
    val approx = RobustStats.trimmedMeanApprox(df, Seq("g"), "v", 0.05)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("trimmed_mean")).toMap
    // exact threshold trim per group, computed locally
    val exact = rows.groupBy(_._1).map { case (g, gs) =>
      val vs = gs.map(_._2).sorted
      val lo = vs((0.05 * (vs.size - 1)).toInt)
      val hi = vs((0.95 * (vs.size - 1)).ceil.toInt)
      val kept = vs.filter(v => v >= lo && v <= hi)
      g -> kept.sum / kept.size
    }
    for ((g, e) <- exact) {
      assert(math.abs(approx(g) - e) / e <= 0.02, s"group $g: ${approx(g)} vs $e")
    }
  }

  test("trimmedMeanApprox excludes far outliers that poison the plain mean") {
    val base = (1 to 5000).map(i => ("g", 100.0 + i % 10))
    val poisoned = base ++ Seq(("g", 1e9), ("g", 1e9), ("g", -1e9))
    val df = poisoned.toDF("g", "v")
    val tm = RobustStats.trimmedMeanApprox(df, Seq("g"), "v", 0.05)
      .collect().head.getAs[Double]("trimmed_mean")
    assert(tm > 99 && tm < 110, s"trimmed mean $tm should ignore the 1e9 rows")
    val plain = df.agg(avg("v")).as[Double].head()
    assert(math.abs(plain) > 10000) // the mean the trim is protecting against
  }

  test("trimmedMeanApprox plans two aggregates — no Window, no global Sort") {
    val df = (1 to 500).map(i => (s"g${i % 2}", i.toDouble)).toDF("g", "v")
    val plan = RobustStats.trimmedMeanApprox(df, Seq("g"), "v", 0.1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_tdigest"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortExec"), plan)
  }

  test("trimmedMean router: small groups take the exact rank trim and match it") {
    val rnd = new Random(13)
    val df = (1 to 6000).map(i => (s"g${i % 3}", rnd.nextDouble() * 100)).toDF("g", "v")
    val routed = RobustStats.trimmedMean(df, Seq("g"), "v", 0.05)
    assert(routed.select("tier").distinct().as[String].collect().toSeq == Seq("exact"))
    val got = routed.select("g", "kept", "trimmed_mean").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // local rank trim: drop exactly ⌊0.05·n⌋ per side of the sorted values
    val local = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .groupBy(_._1).map { case (g, gs) =>
        val vs = gs.map(_._2).sorted
        val d = (vs.size * 0.05).toInt
        val kept = vs.slice(d, vs.size - d)
        g -> ((kept.size.toLong, kept.sum / kept.size))
      }
    for ((g, (n, m)) <- local) {
      assert(got(g)._1 == n, s"group $g kept ${got(g)._1} vs $n")
      assert(math.abs(got(g)._2 - m) < 1e-9, s"group $g mean ${got(g)._2} vs $m")
    }
  }

  test("trimmedMean router: past the group budget the sketch tier fires and matches it") {
    val rnd = new Random(17)
    val df = (1 to 4000).map(i => (s"g${i % 2}", rnd.nextDouble() * 50)).toDF("g", "v")
    val routed = RobustStats.trimmedMean(df, Seq("g"), "v", 0.1, exactGroupRowLimit = 100)
    assert(routed.select("tier").distinct().as[String].collect().toSeq == Seq("approx"))
    val viaApprox = RobustStats.trimmedMeanApprox(df, Seq("g"), "v", 0.1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("trimmed_mean")).toMap
    routed.collect().foreach { r =>
      assert(r.getAs[Double]("trimmed_mean") == viaApprox(r.getString(0)))
    }
  }

  test("trimmedMean router: sizeHint skips the probe and decides the tier") {
    // 10k-row groups with a hint claiming 1 row/group: the router must
    // trust the hint (that is the probe-skipping contract) and go exact.
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val routed = RobustStats.trimmedMean(df, Seq("g"), "v", 0.05,
      exactGroupRowLimit = 10, sizeHint = Some(1L))
    assert(routed.select("tier").as[String].collect().toSeq == Seq("exact"))
  }

  test("trim fraction outside (0, 0.5) is rejected") {
    val df = Seq(("g", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      RobustStats.trimmedMeanApprox(df, Seq("g"), "v", 0.5)
    }
    intercept[IllegalArgumentException] {
      RobustStats.trimmedMeanApprox(df, Seq("g"), "v", 0.0)
    }
  }
}
