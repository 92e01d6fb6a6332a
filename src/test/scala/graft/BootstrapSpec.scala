package graft

import graft.operators.Bootstrap
import org.apache.spark.sql.functions._

/** Unit pins for the Poisson-bootstrap CI operator (SURVEY.md B145):
  * the inverse-CDF draw replayed by hand against the baked thresholds,
  * the full meanCi pipeline replayed in-memory (md5 hash60 included),
  * determinism, and the refuse-loudly edges (negative metric, empty
  * replicate).
  */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  /** JVM replay of GraftFunctions.hash60(seed, v): first 15 hex chars of
    * md5(seed + ":" + v), parsed base-16 — 60 bits. */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def drawRef(u: Long): Long =
    Bootstrap.PoissonCdf60.count(t => u >= t).toLong

  test("poissonDraw: inverse CDF boundaries land exactly on the thresholds") {
    // one u just below and one at each threshold, plus the extremes
    val us = Bootstrap.PoissonCdf60.flatMap(t => Seq(t - 1, t)) ++
      Seq(0L, (1L << 60) - 1)
    val got = us.toDF("u")
      .select(col("u"), Bootstrap.poissonDraw(col("u")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    us.foreach { u =>
      assert(got(u) == drawRef(u), s"u=$u: got ${got(u)}, want ${drawRef(u)}")
    }
    assert(got(0L) == 0L && got((1L << 60) - 1) == 9L)
  }

  test("poissonDraw over hash60 uniforms has mean ~1 and variance ~1") {
    val n = 20000
    val ks = (1 to n).map(i => drawRef(hash60(s"pmean:$i")))
    val mean = ks.sum.toDouble / n
    val varr = ks.map(k => (k - mean) * (k - mean)).sum / n
    assert(math.abs(mean - 1.0) < 0.03, s"mean $mean")
    assert(math.abs(varr - 1.0) < 0.05, s"variance $varr")
  }

  test("meanCi equals the in-memory replay (hash, draws, order statistics)") {
    val rows = (1 to 40).map(i => ("g" + (i % 2), s"id$i", (i * 7 % 23).toLong))
    val df = rows.toDF("g", "id", "y")
    val reps = 16
    val got = Bootstrap
      .meanCi(df, col("g"), col("id"), col("y"), reps, "bspec",
        loPpm = 100000L, hiPpm = 900000L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // replay: idxLo = ceil(.1*16) = 2, idxHi = ceil(.9*16) = 15
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val mus = (0 until reps).map { r =>
        val (sky, sk) = rs.foldLeft((0L, 0L)) { case ((a, b), (_, id, y)) =>
          val k = drawRef(hash60(s"bspec:$id:$r"))
          (a + k * y, b + k)
        }
        assert(sk > 0, s"replay drew an empty replicate in $g")
        (sky * 1000000L) / sk
      }.sorted
      val n = rs.size.toLong
      val mean = rs.map(_._3).sum * 1000000L / n
      (g, n, mean, mus(1), mus(14))
    }
    assert(got.toSeq == expected, s"got ${got.toSeq}\nwant $expected")
  }

  test("meanCi is deterministic and lo <= hi") {
    val df = (1 to 60).map(i => (i % 3, s"r$i", i.toLong)).toDF("g", "id", "y")
    val a = Bootstrap.meanCi(df, col("g"), col("id"), col("y"), 32, "det")
      .orderBy("g").collect().toSeq
    val b = Bootstrap.meanCi(df, col("g"), col("id"), col("y"), 32, "det")
      .orderBy("g").collect().toSeq
    assert(a == b)
    a.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4),
        s"lo > hi in ${r.getAs[Any]("g")}: $r")
    }
  }

  test("meanCi refuses a negative metric loudly") {
    val df = Seq(("g", "a", 5L), ("g", "b", -1L)).toDF("g", "id", "y")
    val e = intercept[Exception] {
      Bootstrap.meanCi(df, col("g"), col("id"), col("y"), 8, "neg").collect()
    }
    assert(e.getMessage.contains("[bootstrap]"), e.getMessage)
  }

  test("meanCi refuses an empty replicate (near-empty group) loudly") {
    // a 1-row group: P(some replicate draws k=0) = 1 - (1-1/e)^64 ~ 1;
    // the seed below is verified to hit one (drawRef replay)
    val seed = "empt"
    val hasZero = (0 until 64).exists(r => drawRef(hash60(s"$seed:solo:$r")) == 0L)
    assert(hasZero, "fixture seed no longer produces an empty replicate")
    val df = Seq(("g", "solo", 5L)).toDF("g", "id", "y")
    val e = intercept[Exception] {
      Bootstrap.meanCi(df, col("g"), col("id"), col("y"), 64, seed).collect()
    }
    assert(e.getMessage.contains("[bootstrap]") && e.getMessage.contains("sk=0"),
      e.getMessage)
  }

  test("meanCi percentile extremes clamp to the first/last order statistic") {
    val df = (1 to 30).map(i => ("g", s"x$i", (i % 11).toLong)).toDF("g", "id", "y")
    val r = Bootstrap.meanCi(df, col("g"), col("id"), col("y"), 16, "ext",
      loPpm = 0L, hiPpm = 1000000L).collect().head
    // replay: lo clamps to rank 1 (ceil(0*16)=0 -> max(1,.)), hi = rank 16
    val mus = (0 until 16).map { rep =>
      val (sky, sk) = (1 to 30).foldLeft((0L, 0L)) { case ((a, b), i) =>
        val k = drawRef(hash60(s"ext:x$i:$rep"))
        (a + k * (i % 11).toLong, b + k)
      }
      (sky * 1000000L) / sk
    }.sorted
    assert(r.getLong(3) == mus.head && r.getLong(4) == mus.last,
      s"extremes ${r.getLong(3)}/${r.getLong(4)} vs ${mus.head}/${mus.last}")
  }

  test("meanCi rejects out-of-range reps and percentile bounds") {
    val df = Seq(("g", "a", 1L)).toDF("g", "id", "y")
    intercept[IllegalArgumentException] {
      Bootstrap.meanCi(df, col("g"), col("id"), col("y"), 3, "s")
    }
    intercept[IllegalArgumentException] {
      Bootstrap.meanCi(df, col("g"), col("id"), col("y"), 8, "s",
        loPpm = 600000L, hiPpm = 400000L)
    }
  }
}
