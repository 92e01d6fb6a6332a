package graft

import scala.util.Random

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: Morton arithmetic exactness + the property the layout
  * exists for — multi-dimensional file-level pruning power. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue matches a reference bit-interleave on random buckets") {
    val rnd = new Random(5)
    val rows = (0 until 500).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    def ref(vals: Seq[Long], bits: Int): Long =
      (for (i <- 0 until bits; (v, d) <- vals.zipWithIndex)
        yield ((v >> i) & 1L) << (i * vals.size + d)).sum
    val got = rows.toDF("a", "b", "c")
      .select(Layout.zvalue(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .as[Long].collect()
    rows.zip(got).foreach { case ((a, b, c), z) =>
      assert(z === ref(Seq(a, b, c), 8), s"($a,$b,$c)")
    }
  }

  test("widthBucket clamps and buckets with integer-exact arithmetic") {
    val got = Seq(-50L, 0L, 999L, 1000L, 1999L, 2000L, 5000L).toDF("v")
      .select(Layout.widthBucket(col("v"), 0L, 1999L, 1).as("b")).as[Long].collect()
    assert(got.toSeq === Seq(0L, 0L, 0L, 1L, 1L, 1L, 1L))
  }

  test("skipSummary reports exact zone/row pruning arithmetic") {
    // 4 zones of 10 rows: values 0-9, 10-19, 20-29, 30-39; predicate
    // [12, 27] must scan zones 1 and 2 (20 rows) and match 16 rows.
    val df = (0L until 40L).map(v => (v / 10, v)).toDF("zone", "v")
    val row = Layout.skipSummary(df, col("zone"), col("v"), 12L, 27L).collect().head
    assert(row.getAs[Long]("zones_total") === 4)
    assert(row.getAs[Long]("zones_scanned") === 2)
    assert(row.getAs[Long]("rows_total") === 40)
    assert(row.getAs[Long]("rows_scanned") === 20)
    assert(row.getAs[Long]("rows_matching") === 16)
  }

  test("zRanges enumerates exactly the box's z-values, merged to runs") {
    val rnd = new Random(23)
    for (trial <- 1 to 30) {
      val bits = 1 + rnd.nextInt(4)
      val dims = 1 + rnd.nextInt(3)
      val top = (1L << bits) - 1
      val boxes = Seq.fill(dims) {
        val a = rnd.nextInt(top.toInt + 1).toLong
        val b = rnd.nextInt(top.toInt + 1).toLong
        (math.min(a, b), math.max(a, b))
      }
      val ranges = Layout.zRanges(boxes, bits)
      // brute force: decode every possible z, keep those inside the box
      def coord(z: Long, d: Int): Long =
        (0 until bits).map(i => ((z >> (i * dims + d)) & 1L) << i).sum
      val want = (0L until (1L << (bits * dims))).filter { z =>
        boxes.zipWithIndex.forall { case ((lo, hi), d) =>
          val c = coord(z, d); c >= lo && c <= hi
        }
      }.toSet
      val got = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
      assert(got === want, s"trial $trial bits=$bits dims=$dims boxes=$boxes")
      // ranges are sorted, non-overlapping, non-adjacent (maximal runs)
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
        case _ => ()
      }
    }
  }

  test("zFilter over zRanges selects exactly the box rows (bucket-aligned)") {
    // x, y in 0..31 ARE the buckets (bits=5, identity frame): z-filtering
    // a box must equal filtering the original dimension predicates.
    val rows = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val df = rows.toDF("x", "y")
      .withColumn("z", Layout.zvalue(Seq(col("x"), col("y")), 5))
    val box = Seq((5L, 17L), (20L, 29L))
    val ranges = Layout.zRanges(box, 5)
    val viaZ = df.filter(Layout.zFilter(col("z"), ranges))
      .select("x", "y").collect().toSet
    val direct = df.filter(col("x").between(5, 17) && col("y").between(20, 29))
      .select("x", "y").collect().toSet
    assert(viaZ === direct)
  }

  test("zFilter ranges push into the parquet scan as min/max-skippable filters") {
    val tmp = new java.io.File(graft.Q.scratchDir("zpush"))
    try {
      val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
      rows.toDF("x", "y")
        .withColumn("z", Layout.zvalue(Seq(col("x"), col("y")), 6))
        .repartitionByRange(8, col("z")).sortWithinPartitions("z")
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val ranges = Layout.zRanges(Seq((0L, 15L), (0L, 15L)), 6)
      val q = spark.read.parquet(tmp.getAbsolutePath)
        .filter(Layout.zFilter(col("z"), ranges))
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PushedFilters") &&
        "PushedFilters: \\[[^\\]]*z[^\\]]*\\]".r.findFirstIn(plan).isDefined,
        s"z ranges not pushed to the scan:\n$plan")
      assert(q.count() === 16L * 16L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("z-ordered files prune on BOTH dimensions; single-column sort prunes on one") {
    val rnd = new Random(17)
    val n = 20000
    val data = (0 until n).map(_ => (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("x", "y")
    // enough files that z-tiles are finer than the probe slice — with
    // very few files the curve's tiles are coarser than any predicate
    // and both layouts degrade toward scan-everything
    val files = 64

    // per-"file" min/max footer stats, simulated by output partition
    def stats(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__p", spark_partition_id())
      .groupBy("__p")
      .agg(min("x").as("xmin"), max("x").as("xmax"), min("y").as("ymin"), max("y").as("ymax"))
      .collect()
    def touched(st: Array[org.apache.spark.sql.Row], xr: Option[(Long, Long)], yr: Option[(Long, Long)]) =
      st.count { r =>
        xr.forall { case (lo, hi) => r.getLong(1) <= hi && r.getLong(2) >= lo } &&
          yr.forall { case (lo, hi) => r.getLong(3) <= hi && r.getLong(4) >= lo }
      }

    val byX = stats(data.repartitionByRange(files, col("x")).sortWithinPartitions("x"))
    val byZ = stats(Layout.zorder(data, Seq(("x", 0L, 4095L), ("y", 0L, 4095L)), files, bits = 8))

    // a y-only slice: the x-sorted layout cannot prune at all
    val yOnlyLinear = touched(byX, None, Some((0L, 255L)))
    val yOnlyZ = touched(byZ, None, Some((0L, 255L)))
    assert(yOnlyLinear === files, "x-sort should be blind to y predicates")
    assert(yOnlyZ <= files / 2, s"z-order should skip most files on y, touched $yOnlyZ")

    // The honest z-order claim is worst-dimension-bounded pruning: the
    // x-sort is perfect on x slices and blind on y; z-order is decent on
    // BOTH, so its worst case beats the linear layout's worst case by a
    // wide margin (this is why Delta's OPTIMIZE ZORDER exists).
    val xOnlyLinear = touched(byX, Some((1000L, 1255L)), None)
    val xOnlyZ = touched(byZ, Some((1000L, 1255L)), None)
    assert(xOnlyLinear <= files / 8, "x-sort should prune x slices near-perfectly")
    val worstLinear = math.max(xOnlyLinear, yOnlyLinear)
    val worstZ = math.max(xOnlyZ, yOnlyZ)
    assert(worstZ * 2 <= worstLinear,
      s"z-order worst-dimension $worstZ vs linear $worstLinear — layout not clustering")
  }

  test("exactQuantileBoundaries yield near-equal-depth buckets on skewed data") {
    val rnd = new Random(9)
    // pareto-ish skew: median ~840, max tens of thousands — the corpus shape
    val vals = (1 to 20000).map(_ => math.floor(800.0 / math.pow(rnd.nextDouble(), 0.7)))
    val df = vals.toDF("v")
    val bRow = Layout.exactQuantileBoundaries(df, "v", 4)
    val withB = df.crossJoin(broadcast(bRow))
    val qb = Layout.quantileBucket(col("v"), (1 to 15).map(j => col(s"b$j")))
    val qCounts = withB.groupBy(qb.as("b")).count()
      .as[(Long, Long)].collect().toMap
    // every quantile bucket holds between 0.25x and 4x the even share
    // (value ties can shift mass, but nothing collapses)
    val even = vals.size / 16.0
    assert(qCounts.size >= 12, s"buckets: $qCounts")
    qCounts.values.foreach(c => assert(c >= even / 4 && c <= even * 4, s"$qCounts"))
    // fixed-width over the same frame collapses: one bucket hoards most rows
    val fw = Layout.widthBucket(col("v").cast("long"), 0L,
      vals.max.toLong, 4)
    val fwMax = df.groupBy(fw.as("b")).count().agg(max("count"))
      .as[Long].head()
    assert(fwMax > vals.size * 0.7, s"fixed-width max bucket $fwMax — data not skewed enough")
  }

  test("approxQuantileBoundaries track the exact boundaries") {
    val rnd = new Random(11)
    val vals = (1 to 30000).map(_ => math.floor(800.0 / math.pow(rnd.nextDouble(), 0.7)))
    val df = vals.toDF("v")
    val approx = Layout.approxQuantileBoundaries(df, "v", 4)
    val exact = Layout.exactQuantileBoundaries(df, "v", 4)
      .collect().head.toSeq.map(_.asInstanceOf[Double])
    assert(approx.size === 15)
    approx.zip(exact).zipWithIndex.foreach { case ((a, e), i) =>
      assert(math.abs(a - e) <= math.max(2.0, e * 0.05), s"b${i + 1}: approx $a vs exact $e")
    }
  }

  test("zorderQuantile range-partitions into balanced z files on skewed dims") {
    val rnd = new Random(13)
    val rows = (1 to 8000).map { _ =>
      (math.floor(800.0 / math.pow(rnd.nextDouble(), 0.7)), rnd.nextInt(2000).toDouble)
    }
    val df = rows.toDF("x", "y")
    val parts = Layout.zorderQuantile(df, Seq("x", "y"), numFiles = 8, bits = 4)
      .rdd.mapPartitions(it => Iterator(it.size)).collect().filter(_ > 0)
    assert(parts.length >= 6, s"partitions: ${parts.toSeq}")
    // no partition hoards: the range shuffle over quantile-bucketed z
    // keeps files within a small factor of even
    val even = 8000.0 / parts.length
    assert(parts.max <= even * 3, s"partitions: ${parts.toSeq}")
  }
}
