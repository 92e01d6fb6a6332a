package graft

import graft.ingest.AgriPipeline
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property-style invariants over seeded random data (SURVEY.md §5.3):
  * dedup idempotence, union/dedup cardinality algebra, as-of join vs a
  * brute-force per-row maximum. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(1234)

  private def randomAgri(n: Int) = {
    val states = Seq("A", "B", "C")
    val commodities = Seq("x", "y", "z", null)
    (1 to n).map { _ =>
      (states(rnd.nextInt(3)), s"D${rnd.nextInt(4)}", s"M${rnd.nextInt(4)}",
        commodities(rnd.nextInt(4)), "v", "FAQ",
        java.sql.Date.valueOf(s"2020-01-${1 + rnd.nextInt(28)}"),
        if (rnd.nextInt(10) == 0) null else java.lang.Double.valueOf(rnd.nextInt(1000).toDouble),
        java.lang.Double.valueOf(rnd.nextInt(1000).toDouble))
    }.toDF("state", "district", "market", "commodity", "variety", "grade",
      "arrival_date", "modal_price", "min_price")
  }

  test("dedupNaturalKey is idempotent") {
    val df = randomAgri(2000)
    val once = AgriPipeline.dedupNaturalKey(df)
    val twice = AgriPipeline.dedupNaturalKey(once)
    assert(once.count() === twice.count())
    assert(once.exceptAll(twice).count() === 0)
  }

  test("dedup(a union a) == dedup(a)") {
    val df = randomAgri(1500)
    val d1 = AgriPipeline.dedupNaturalKey(df)
    val d2 = AgriPipeline.dedupNaturalKey(df.unionAll(df))
    assert(d1.count() === d2.count())
    assert(d1.exceptAll(d2).count() === 0)
  }

  test("dedup key count equals distinct natural-key count") {
    val df = randomAgri(3000)
    val key = Seq("state", "district", "market", "commodity", "variety", "grade", "arrival_date")
    val expected = df.select(key.map(col): _*).distinct().count()
    assert(AgriPipeline.dedupNaturalKey(df).count() === expected)
  }

  test("banded simhash pigeonhole: finds EVERY pair at Hamming dist < bands (random sketches)") {
    // random 60-bit sketches with planted near-dup clusters (flip 1-3 bits)
    val base = (0 until 200).map(_ => rnd.nextLong() & ((1L << 60) - 1))
    val planted = base.take(30).map { h =>
      (0 until (1 + rnd.nextInt(3))).foldLeft(h)((acc, _) => acc ^ (1L << rnd.nextInt(60)))
    }
    val sketches = (base ++ planted).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("id", "simhash")
    val banded = graft.operators.Dedup
      .simhashBandedTopPairs(sketches, "id", "simhash", k = 100000, bands = 4, bitsPerBand = 15)
      .as[(Long, Long, Int)].collect().toSet
    // brute-force ground truth
    val all = (base ++ planted).zipWithIndex
    for {
      (ha, ia) <- all; (hb, ib) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d < 4
    } assert(banded.contains((ia.toLong, ib.toLong, d)),
      s"banded missed pair ($ia,$ib) at dist $d")
  }

  test("asOf join equals brute-force max-of-earlier per left row") {
    val left = (1 to 500).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(10000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "t", "lid")
    val right = (1 to 800).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(10000).toLong))
      .toDF("k", "t").withColumn("rv", col("t"))
    val fast = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("rv"))
      .select("lid", "asof_rv").as[(Long, Option[Long])].collect().toMap
    // brute force: max right t <= left t within key
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left_outer")
      .groupBy(col("lid")).agg(max(col("r.rv")).as("mx"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast.size === brute.size)
    brute.foreach { case (lid, mx) =>
      assert(fast(lid) === mx, s"lid=$lid fast=${fast(lid)} brute=$mx")
    }
  }
}
