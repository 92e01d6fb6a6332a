package graft

import graft.operators.{EvalMetrics, PrefixSum, Triangles}
import org.apache.spark.sql.functions._

/** Property pins for the evaluation/monitoring wing (SURVEY.md B80-B84):
  * every statistic must agree exactly with an in-memory brute-force
  * reference across randomized inputs — the same contract the DuckDB
  * oracles enforce cross-engine at sf0.01, asserted here at the unit
  * level against from-first-principles implementations.
  */
class AnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(4242)

  test("PrefixSum.runningSums equals the single-partition reference") {
    val rows = Seq.tabulate(500)(i => (rng.nextInt(80).toLong, rng.nextInt(5).toLong, rng.nextInt(3).toLong))
    // keys may repeat across rows: make the order total by adding a unique id
    val df = rows.zipWithIndex.map { case ((k, x, y), id) => (k, id.toLong, x, y) }
      .toDF("k", "id", "x", "y")
    val got = PrefixSum.runningSums(df, Seq(col("k"), col("id")), Seq("x", "y"))
      .select("k", "id", "c_x", "c_y").as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val sorted = rows.zipWithIndex.map { case ((k, x, y), id) => (k, id.toLong, x, y) }
      .sortBy(r => (r._1, r._2))
    var (cx, cy) = (0L, 0L)
    val want = sorted.map { case (k, id, x, y) => cx += x; cy += y; (k, id, cx, cy) }
    assert(got.toSeq == want)
  }

  test("PrefixSum is invariant to input partitioning") {
    // The broadcast-offset machinery is the partition-sensitive part:
    // the same data arriving pre-partitioned any which way must produce
    // identical running sums (the range exchange renormalizes layout).
    val rows = Seq.tabulate(300)(i => (rng.nextInt(40).toLong, i.toLong, rng.nextInt(9).toLong))
    def run(parts: Int) = PrefixSum
      .runningSums(rows.toDF("k", "id", "x").repartition(parts), Seq(col("k"), col("id")), Seq("x"))
      .select("k", "id", "c_x").as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) == run(7))
    assert(run(7) == run(32))
  }

  test("PrefixSum rejects nulls in a sum column loudly") {
    val df = Seq((1L, Some(2L)), (2L, None: Option[Long]), (3L, Some(4L)))
      .toDF("id", "x")
    val e = intercept[Exception] {
      PrefixSum.runningSums(df, Seq(col("id")), Seq("x")).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(e).contains("[prefix-sum] null in sum column 'x'"))
  }

  test("PrefixSum stays correct under a dominant duplicate order key") {
    // 40% of rows share one key value: the range exchange cannot split
    // that run, but the running sums must still be exact (the skew
    // contract is a straggler warning, never a correctness caveat).
    val rows = Seq.tabulate(500) { i =>
      val k = if (i % 5 < 2) 7L else rng.nextInt(40).toLong
      (k, i.toLong, rng.nextInt(9).toLong)
    }
    val got = PrefixSum.runningSums(rows.toDF("k", "id", "x"), Seq(col("k"), col("id")), Seq("x"))
      .select("k", "id", "c_x").as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    var cx = 0L
    val want = rows.sortBy(r => (r._1, r._2)).map { case (k, id, x) => cx += x; (k, id, cx) }
    assert(got.toSeq == want)
  }

  test("skewWarning fires on a dominant partition and stays quiet otherwise") {
    // dominant: one of ten partitions holds 80% of rows (8x fair share)
    val dominant = 80L +: Seq.fill(9)(2L)
    assert(PrefixSum.skewWarning(dominant, minRows = 50L).isDefined)
    // uniform: nobody exceeds 4x fair share
    assert(PrefixSum.skewWarning(Seq.fill(10)(25L), minRows = 1L).isEmpty)
    // dominant but tiny: below minRows, finishes fast regardless
    assert(PrefixSum.skewWarning(dominant, minRows = 1000L).isEmpty)
    // degenerate inputs
    assert(PrefixSum.skewWarning(Nil, minRows = 1L).isEmpty)
    assert(PrefixSum.skewWarning(Seq(100L), minRows = 1L).isEmpty)
  }

  test("ksTest equals brute force (exact rational, smallest-arg sup)") {
    for (trial <- 1 to 5) {
      val s1 = Seq.fill(60 + trial)(rng.nextInt(25).toLong)
      val s2 = Seq.fill(80 - trial)(rng.nextInt(25).toLong + trial)
      val df = (s1.map((_, true)) ++ s2.map((_, false))).toDF("v", "s1")
      val got = EvalMetrics.ksTest(df, col("s1"), col("v"))
        .as[(Long, Long, Long, Long, Long)].collect().head
      val (n1, n2) = (s1.size.toLong, s2.size.toLong)
      val pooled = (s1 ++ s2).distinct.sorted
      val diffs = pooled.map { v =>
        val c1 = s1.count(_ <= v).toLong
        val c2 = s2.count(_ <= v).toLong
        (math.abs(c1 * n2 - c2 * n1), v)
      }
      val dMax = diffs.map(_._1).max
      val at = diffs.filter(_._1 == dMax).map(_._2).min
      assert(got == ((n1, n2, dMax, n1 * n2, at)), s"trial $trial")
    }
  }

  test("rocAuc equals quadratic pair counting (ties at half credit)") {
    for (trial <- 1 to 5) {
      val pos = Seq.fill(40)(rng.nextInt(15).toLong)
      val neg = Seq.fill(55)(rng.nextInt(15).toLong)
      val df = (pos.map((_, true)) ++ neg.map((_, false))).toDF("s", "y")
      val got = EvalMetrics.rocAuc(df, col("y"), col("s"))
        .as[(Long, Long, Long, Long)].collect().head
      val twoU = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert(got == ((pos.size.toLong, neg.size.toLong, twoU, 2L * pos.size * neg.size)), s"trial $trial")
    }
  }

  private def causeChain(t: Throwable): String =
    if (t == null) "" else t.getMessage + "|" + causeChain(t.getCause)

  test("ksTest and rocAuc fail fast on an empty sample/class") {
    val oneSided = Seq((1L, true), (2L, true), (3L, true)).toDF("v", "s1")
    val e1 = intercept[Exception] {
      EvalMetrics.ksTest(oneSided, col("s1"), col("v")).collect()
    }
    assert(causeChain(e1).contains("[eval-metrics] ksTest needs both samples non-empty"))
    val e2 = intercept[Exception] {
      EvalMetrics.rocAuc(oneSided, col("s1"), col("v")).collect()
    }
    assert(causeChain(e2).contains("[eval-metrics] rocAuc needs both classes non-empty"))
  }

  test("NULL predicate rows count toward sample 2 / the negative class") {
    val df = Seq((1L, Some(true)), (2L, None: Option[Boolean]), (3L, Some(false)), (4L, Some(true)))
      .toDF("v", "s1")
    val ks = EvalMetrics.ksTest(df, col("s1"), col("v"))
      .select("n1", "n2").as[(Long, Long)].collect().head
    assert(ks == ((2L, 2L))) // the NULL row landed in sample 2
    val auc = EvalMetrics.rocAuc(df, col("s1"), col("v"))
      .select("n_pos", "n_neg").as[(Long, Long)].collect().head
    assert(auc == ((2L, 2L)))
  }

  test("ksTestBinned: exact over bin ids, below exact D, gap within bin mass") {
    for (trial <- 1 to 3) {
      val s1 = Seq.fill(300)(rng.nextInt(1000).toLong)
      val s2 = Seq.fill(350)(rng.nextInt(1000).toLong + 60 * trial)
      val df = (s1.map((_, true)) ++ s2.map((_, false))).toDF("v", "s1")
      val bins = 16
      val (n1, n2) = (s1.size.toLong, s2.size.toLong)

      // the binned statistic must BE the exact statistic over bin ids:
      // brute-force it from the operator's own bin assignment
      val binned = EvalMetrics.quantileBin(df, col("v"), bins)
        .select(col("bin"), col("s1")).as[(Long, Boolean)].collect()
      val binIds = binned.map(_._1).distinct.sorted
      val diffs = binIds.map { b =>
        val c1 = binned.count(r => r._1 <= b && r._2).toLong
        val c2 = binned.count(r => r._1 <= b && !r._2).toLong
        (math.abs(c1 * n2 - c2 * n1), b)
      }
      val wantD = diffs.map(_._1).max
      val got = EvalMetrics.ksTestBinned(df, col("s1"), col("v"), bins)
        .select("n1", "n2", "d_num", "d_den", "bins")
        .as[(Long, Long, Long, Long, Int)].collect().head
      assert(got._1 == n1 && got._2 == n2 && got._4 == n1 * n2 && got._5 == bins, s"trial $trial")
      assert(got._3 == wantD, s"trial $trial binned != exact-over-bins")

      // vs the exact unbinned D (same denominator): below, and the gap
      // bounded by the largest per-sample single-bin mass cleared to n1*n2
      val exactD = {
        val pooled = (s1 ++ s2).distinct
        pooled.map { v =>
          val c1 = s1.count(_ <= v).toLong
          val c2 = s2.count(_ <= v).toLong
          math.abs(c1 * n2 - c2 * n1)
        }.max
      }
      assert(got._3 <= exactD, s"trial $trial binned above exact")
      val maxMass = binIds.map { b =>
        val m1 = binned.count(r => r._1 == b && r._2).toLong
        val m2 = binned.count(r => r._1 == b && !r._2).toLong
        math.max(m1 * n2, m2 * n1)
      }.max
      assert(exactD - got._3 <= maxMass, s"trial $trial gap above bin mass")
    }
  }

  test("rocAucBinned: exact over bin ids, within the tie-mass band of exact") {
    for (trial <- 1 to 3) {
      val pos = Seq.fill(250)(rng.nextInt(900).toLong + 40 * trial)
      val neg = Seq.fill(300)(rng.nextInt(900).toLong)
      val df = (pos.map((_, true)) ++ neg.map((_, false))).toDF("s", "y")
      val bins = 16
      val binned = EvalMetrics.quantileBin(df, col("s"), bins)
        .select(col("bin"), col("y")).as[(Long, Boolean)].collect()
      val bp = binned.filter(_._2).map(_._1)
      val bn = binned.filterNot(_._2).map(_._1)
      val want2U = (for (p <- bp; n <- bn)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      val got = EvalMetrics.rocAucBinned(df, col("y"), col("s"), bins)
        .select("n_pos", "n_neg", "auc_num", "auc_den", "bins")
        .as[(Long, Long, Long, Long, Int)].collect().head
      assert(got == ((pos.size.toLong, neg.size.toLong, want2U,
        2L * pos.size * neg.size, bins)), s"trial $trial")
      // |2U_exact - 2U_binned| <= sum over bins of pos_k*neg_k
      val exact2U = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      val tieMass = bp.groupBy(identity).map { case (b, g) =>
        g.size.toLong * bn.count(_ == b) }.sum
      assert(math.abs(exact2U - want2U) <= tieMass, s"trial $trial tie-mass bound")
    }
  }

  test("ksTestPerGroup equals brute force for every group (each vs rest)") {
    for (trial <- 1 to 3) {
      val rows = Seq.fill(400)((s"g${rng.nextInt(5)}", rng.nextInt(12).toLong + trial))
      val df = rows.toDF("g", "v")
      val got = EvalMetrics.ksTestPerGroup(df, col("g"), col("v"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val n = rows.size.toLong
      val vals = rows.map(_._2).distinct.sorted
      for (g <- rows.map(_._1).distinct) {
        val ing = rows.filter(_._1 == g).map(_._2)
        val out = rows.filterNot(_._1 == g).map(_._2)
        val (n1, n2) = (ing.size.toLong, out.size.toLong)
        // the sup must range over ALL distinct values, including those
        // the group never saw (F_rest keeps jumping there)
        val d = vals.map { v =>
          math.abs(ing.count(_ <= v) * n2 - out.count(_ <= v) * n1)
        }.max
        assert(got(g) == ((n1, n2, d, n1 * n2)), s"trial $trial group $g")
        assert(n1 + n2 == n)
      }
    }
  }

  test("ksTestPerGroup fails fast when one group IS the whole corpus") {
    val df = Seq(("only", 1L), ("only", 2L)).toDF("g", "v")
    val e = intercept[Exception] {
      EvalMetrics.ksTestPerGroup(df, col("g"), col("v")).collect()
    }
    assert(causeChain(e).contains("[eval-metrics] ksTestPerGroup needs every group"))
  }

  test("rocAucPerGroup equals per-group quadratic pair counting; 0/0 on single-class") {
    for (trial <- 1 to 3) {
      val rows = Seq.fill(300)(
        (s"g${rng.nextInt(4)}", rng.nextBoolean(), rng.nextInt(20).toLong)) ++
        Seq.fill(10)(("onlypos", true, rng.nextInt(20).toLong)) // single-class slice
      val df = rows.toDF("g", "y", "s")
      val got = EvalMetrics.rocAucPerGroup(df, col("g"), col("y"), col("s"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      for (g <- rows.map(_._1).distinct) {
        val pos = rows.filter(r => r._1 == g && r._2).map(_._3)
        val neg = rows.filter(r => r._1 == g && !r._2).map(_._3)
        val twoU = (for (p <- pos; n <- neg)
          yield if (p > n) 2L else if (p == n) 1L else 0L).sum
        assert(got(g) == ((pos.size.toLong, neg.size.toLong, twoU,
          2L * pos.size * neg.size)), s"trial $trial group $g")
      }
      assert(got("onlypos")._4 == 0L, "single-class slice must emit the 0/0 rational")
    }
  }

  test("cohenKappa equals the direct formula") {
    val pairs = Seq.fill(300)((rng.nextInt(4), rng.nextInt(4)))
    val confusion = pairs.groupBy(identity).map { case ((a, b), g) => (a, b, g.size.toLong) }
      .toSeq.toDF("a", "b", "cnt")
    val got = EvalMetrics.cohenKappa(confusion, "a", "b", "cnt")
      .as[(Long, Long, Long, Long)].collect().head
    val n = pairs.size.toLong
    val agree = pairs.count { case (a, b) => a == b }.toLong
    val peNum = (0 until 4).map { k =>
      pairs.count(_._1 == k).toLong * pairs.count(_._2 == k).toLong
    }.sum
    assert(got == ((n, agree, n * agree - peNum, n * n - peNum)))
  }

  test("krippendorffAlpha equals the coincidence-matrix reference (missing ratings)") {
    val maxRaters = 4
    val dLcm = 6L // lcm(1, 2, 3)
    for (trial <- 1 to 3) {
      // sparse ratings: each of 40 units rated by a random subset of 4
      // raters (possibly 0 or 1 — those units must drop out)
      val ratings = for {
        u <- 0L until 40L
        rt <- 0 until maxRaters
        if rng.nextDouble() < 0.6
      } yield (u, rt, (u % 3 + (if (rng.nextDouble() < 0.3) 1 else 0)))
      val got = EvalMetrics.krippendorffAlpha(
          ratings.toDF("u", "rt", "c"), col("u"), col("rt"), col("c"), maxRaters)
        .as[(Long, Long, Long, Long, Long)].collect().head
      val byU = ratings.groupBy(_._1).filter(_._2.size >= 2)
      val o = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
      for ((_, rs) <- byU) {
        val w = dLcm / (rs.size - 1)
        for (a <- rs; b <- rs if a._2 != b._2) o((a._3, b._3)) += w
      }
      val doNum = o.collect { case ((c, k), v) if c != k => v }.sum
      val nc = o.groupBy(_._1._1).map { case (c, g) => c -> g.values.sum }
      val nn = nc.values.sum
      val s = nn * nn - nc.values.map(v => v * v).sum
      val want = (byU.size.toLong, byU.values.map(_.size.toLong).sum,
        doNum, s - doNum * (nn - dLcm), s)
      assert(got == want, s"trial $trial")
    }
  }

  test("krippendorffAlpha: perfect agreement is 1, overflow-free guard on m > maxRaters") {
    val perfect = (for (u <- 0L until 10L; rt <- 0 until 3)
      yield (u, rt, u % 2)).toDF("u", "rt", "c")
    val got = EvalMetrics.krippendorffAlpha(perfect, col("u"), col("rt"), col("c"), 4)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got._3 == 0L && got._4 == got._5 && got._5 > 0L) // Do = 0, alpha = 1
    val over = (for (u <- 0L until 3L; rt <- 0 until 5)
      yield (u, rt, 1L)).toDF("u", "rt", "c")
    val e = intercept[Exception] {
      EvalMetrics.krippendorffAlpha(over, col("u"), col("rt"), col("c"), 4).collect()
    }
    assert(causeChain(e).contains("more than maxRaters=4"))
  }

  test("LabelProp.propagate equals a synchronous in-memory reference") {
    for (trial <- 1 to 3) {
      val nodes = (0L until 16L).toSeq
      val edges = for {
        a <- nodes; b <- nodes if a < b && rng.nextDouble() < 0.25
      } yield (a, b)
      val seeds = nodes.filter(_ % 5 == 0).map(n => (n, n % 3))
      val iters = 3
      val got = graft.operators.LabelProp.propagate(
          nodes.toDF("node"), edges.toDF("a", "b"), seeds.toDF("node", "lbl"), iters)
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      // reference: synchronous rounds, clamped seeds, min-label ties,
      // keep-previous when no labeled neighbor
      val nbrs = nodes.map(n => n ->
        edges.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }).toMap
      val seedMap = seeds.toMap
      var lab: Map[Long, Option[Long]] = nodes.map(n => n -> seedMap.get(n)).toMap
      for (_ <- 1 to iters) {
        lab = nodes.map { n =>
          val next = seedMap.get(n).orElse {
            val votes = nbrs(n).flatMap(lab(_)).groupBy(identity).map { case (l, g) => (l, g.size) }
            if (votes.isEmpty) lab(n)
            else Some(votes.toSeq.minBy { case (l, c) => (-c, l) }._1)
          }
          n -> next
        }.toMap
      }
      assert(got == lab, s"trial $trial")
    }
  }

  test("LabelProp.propagate with STRING labels matches the reference (generic tie-break)") {
    // The numeric fast path negates labels inside max(struct(c, -lbl));
    // string domain tags must take the generic two-aggregate tie-break
    // and agree with the same synchronous reference, min-label ties and
    // all — not silently null out under an implicit double cast.
    for (trial <- 1 to 3) {
      val nodes = (0L until 16L).toSeq
      val edges = for {
        a <- nodes; b <- nodes if a < b && rng.nextDouble() < 0.3
      } yield (a, b)
      val seeds = nodes.filter(_ % 4 == 0).map(n => (n, s"dom${n % 3}"))
      val iters = 3
      val got = graft.operators.LabelProp.propagate(
          nodes.toDF("node"), edges.toDF("a", "b"), seeds.toDF("node", "lbl"), iters)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1)))
        .toMap
      val nbrs = nodes.map(n => n ->
        edges.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }).toMap
      val seedMap = seeds.toMap
      var lab: Map[Long, Option[String]] = nodes.map(n => n -> seedMap.get(n)).toMap
      for (_ <- 1 to iters) {
        lab = nodes.map { n =>
          val next = seedMap.get(n).orElse {
            val votes = nbrs(n).flatMap(lab(_)).groupBy(identity).map { case (l, g) => (l, g.size) }
            if (votes.isEmpty) lab(n)
            else Some(votes.toSeq.minBy { case (l, c) => (-c, l) }._1)
          }
          n -> next
        }.toMap
      }
      assert(got == lab, s"trial $trial")
    }
  }

  test("Triangles.perNode equals brute-force enumeration") {
    for (trial <- 1 to 3) {
      val nodes = (0L until 14L).toSeq
      val edges = (for {
        a <- nodes; b <- nodes if a < b && rng.nextDouble() < 0.35
      } yield (a, b))
      val df = edges.toDF("a", "b")
      val got = Triangles.perNode(df)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val eset = edges.toSet
      def conn(x: Long, y: Long) = eset.contains((x min y, x max y))
      val triples = for {
        x <- nodes; y <- nodes if x < y; z <- nodes if y < z
        if conn(x, y) && conn(x, z) && conn(y, z)
      } yield (x, y, z)
      val present = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = present.map { v =>
        val deg = edges.count(e => e._1 == v || e._2 == v).toLong
        val tri = triples.count(t => t._1 == v || t._2 == v || t._3 == v).toLong
        v -> ((deg, tri))
      }.toMap
      assert(got == want, s"trial $trial")
      // global count invariant: sum(tri) = 3 * |triangles|
      assert(got.values.map(_._2).sum == 3L * triples.size, s"trial $trial global")
    }
  }
}
