package graft

import scala.util.Random

import graft.operators.{EditDistanceJoin, Merge}
import org.apache.spark.sql.functions._

/** Merge/CDC table maintenance + segment-filter edit-distance join. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40),
  ).toDF("k", "s", "v")

  test("mergeUpsert applies update/insert/delete in one pass") {
    val src = Seq(
      (2L, "B", 99, false), // update
      (5L, "e", 50, false), // insert
      (3L, "c", 30, true),  // delete
      (9L, "z", 0, true),   // delete of unseen key: no-op
    ).toDF("k", "s", "v", "del")
    val out = Merge.mergeUpsert(target, src, Seq("k"), Some("del"))
      .as[(Long, String, Int)].collect().toSet
    assert(out === Set((1L, "a", 10), (2L, "B", 99), (4L, "d", 40), (5L, "e", 50)))
  }

  test("mergeUpsert without delete flag is pure upsert; schema guard trips") {
    val src = Seq((1L, "A", 11), (6L, "f", 60)).toDF("k", "s", "v")
    val out = Merge.mergeUpsert(target, src, Seq("k"))
      .as[(Long, String, Int)].collect().toSet
    assert(out === Set((1L, "A", 11), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40), (6L, "f", 60)))
    intercept[IllegalArgumentException] {
      Merge.mergeUpsert(target, src.withColumn("extra", lit(1)), Seq("k"))
    }
  }

  test("diffSnapshots recovers insert/update/delete and drops equal rows (null-safe)") {
    val old = Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, None, 30), (4L, Some("d"), 40),
    ).toDF("k", "s", "v")
    val neu = Seq(
      (1L, Some("a"), 10),  // unchanged → dropped
      (2L, Some("B"), 20),  // update
      (3L, None, 30),       // unchanged with null member → dropped
      (5L, Some("e"), 50),  // insert
    ).toDF("k", "s", "v")  // 4 deleted
    val got = Merge.diffSnapshots(old, neu, Seq("k"))
      .select("op", "k").as[(String, Long)].collect().toSet
    assert(got === Set(("update", 2L), ("insert", 5L), ("delete", 4L)))
    // round-trip: applying the diff as a merge reproduces the new snapshot
    val diff = Merge.diffSnapshots(old, neu, Seq("k"))
    val asSrc = diff.select(col("k"),
      coalesce(col("new.s"), col("old.s")).as("s"),
      coalesce(col("new.v"), col("old.v")).as("v"),
      (col("op") === "delete").as("del"))
    val replayed = Merge.mergeUpsert(old, asSrc, Seq("k"), Some("del"))
      .as[(Long, Option[String], Int)].collect().toSet
    assert(replayed === neu.as[(Long, Option[String], Int)].collect().toSet)
  }

  test("incrementalRefresh ≡ full recompute on random CDC (incl. group-moving updates)") {
    val rnd = new Random(11)
    def mkRows(n: Int, keyOffset: Long): Seq[(Long, String, Long)] =
      (0 until n).map(i => (keyOffset + i, "g" + rnd.nextInt(5), rnd.nextInt(1000).toLong))
    for (trial <- 1 to 5) {
      val oldRows = mkRows(300, 0)
      // new state: drop ~20%, mutate ~30% (some changing group), add 50
      val kept = oldRows.filter(_ => rnd.nextDouble() > 0.2)
      val mutated = kept.map { case r @ (k, g, v) =>
        if (rnd.nextDouble() < 0.3) (k, "g" + rnd.nextInt(5), v + rnd.nextInt(100)) else r
      }
      val newRows = mutated ++ mkRows(50, 1000)
      val old = oldRows.toDF("k", "g", "v")
      val neu = newRows.toDF("k", "g", "v")

      def view(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val diff = Merge.diffSnapshots(old, neu, Seq("k"))
      val refreshed = Merge.incrementalRefresh(view(old), diff, Seq("g"), "n", Map("v" -> "sv"))
        .as[(String, Long, Long)].collect().toSet
      val recomputed = view(neu).as[(String, Long, Long)].collect().toSet
      assert(refreshed === recomputed, s"trial $trial")
    }
  }

  test("incrementalRefreshWithExtrema ≡ recompute when deletes hit the group max") {
    // g1's max row (v=90) is deleted, g1's min row (v=5) too — retractable
    // algebra can't recover the new extrema; the touched-group recompute
    // must. g3 is untouched and must pass through from the OLD view (we
    // poison the new base's g3 to prove no recompute happens for it).
    val old = Seq(
      (1L, "g1", 5L), (2L, "g1", 50L), (3L, "g1", 90L),
      (4L, "g2", 20L), (5L, "g2", 70L),
      (6L, "g3", 33L)).toDF("k", "g", "v")
    val neu = Seq(
      (2L, "g1", 50L),                    // g1: deletes of 1 (min) and 3 (max)
      (4L, "g2", 20L), (5L, "g2", 70L), (7L, "g2", 71L), // g2: insert new max
      (6L, "g3", 33L)).toDF("k", "g", "v")
    def view(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val diff = Merge.diffSnapshots(old, neu, Seq("k"))
    val refreshed = Merge.incrementalRefreshWithExtrema(
        view(old), neu, diff, Seq("g"), "n",
        Map("v" -> "sv"), Map("v" -> "mn"), Map("v" -> "mx"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val recomputed = view(neu).as[(String, Long, Long, Long, Long)].collect().toSet
    assert(refreshed === recomputed)
    // untouched group comes from the view, not the base: refresh again
    // with a base whose g3 row is poisoned — g3 must still read 33
    val poisoned = neu.withColumn("v",
      when(col("g") === "g3", lit(999L)).otherwise(col("v")))
    val viaView = Merge.incrementalRefreshWithExtrema(
        view(old), poisoned, diff, Seq("g"), "n",
        Map("v" -> "sv"), Map("v" -> "mn"), Map("v" -> "mx"))
      .filter(col("g") === "g3")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(viaView === Set(("g3", 1L, 33L, 33L, 33L)))
  }

  test("incrementalRefreshWithExtrema recomputes groups keyed by NULL (null-safe splice)") {
    // The NULL-g group's max row is deleted; a plain equi-join against
    // the touched keys would never match NULL = NULL, leaving the view
    // row stale AND duplicating the group via the semi-join recompute.
    val old = Seq(
      (1L, Some("g1"), 10L), (2L, Option.empty[String], 5L),
      (3L, Option.empty[String], 90L)).toDF("k", "g", "v")
    val neu = Seq(
      (1L, Some("g1"), 10L), (2L, Option.empty[String], 5L)).toDF("k", "g", "v")
    def view(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val diff = Merge.diffSnapshots(old, neu, Seq("k"))
    val refreshed = Merge.incrementalRefreshWithExtrema(
        view(old), neu, diff, Seq("g"), "n",
        Map("v" -> "sv"), Map("v" -> "mn"), Map("v" -> "mx"))
      .as[(Option[String], Long, Long, Long, Long)].collect().toSet
    val recomputed = view(neu).as[(Option[String], Long, Long, Long, Long)]
      .collect().toSet
    assert(refreshed === recomputed)
    assert(refreshed.contains((None, 1L, 5L, 5L, 5L)))
  }

  test("incrementalRefreshWithExtrema ≡ recompute on random CDC (group moves, group death)") {
    val rnd = new Random(23)
    for (trial <- 1 to 5) {
      val oldRows = (0 until 250).map(i =>
        (i.toLong, "g" + rnd.nextInt(6), rnd.nextInt(1000).toLong))
      val kept = oldRows.filter(_ => rnd.nextDouble() > 0.25)
      val mutated = kept.map { case r @ (k, _, v) =>
        if (rnd.nextDouble() < 0.3) (k, "g" + rnd.nextInt(6), v + rnd.nextInt(100)) else r
      }
      val newRows = mutated ++ (0 until 40).map(i =>
        (1000L + i, "g" + rnd.nextInt(6), rnd.nextInt(1000).toLong))
      val old = oldRows.toDF("k", "g", "v")
      val neu = newRows.toDF("k", "g", "v")
      def view(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
      val diff = Merge.diffSnapshots(old, neu, Seq("k"))
      val refreshed = Merge.incrementalRefreshWithExtrema(
          view(old), neu, diff, Seq("g"), "n",
          Map("v" -> "sv"), Map("v" -> "mn"), Map("v" -> "mx"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val recomputed = view(neu).as[(String, Long, Long, Long, Long)].collect().toSet
      assert(refreshed === recomputed, s"trial $trial")
    }
  }

  test("applyChangesBatch: streamed CDC batches materialize a mutable keyed table") {
    import graft.sinks.VersionedSink
    val dir = graft.Q.scratchDir("cdctable")
    val apply = graft.streaming.StreamingJobs.applyChangesBatch(dir, Seq("k"), Some("del")) _
    // batch 0: initial inserts
    apply(Seq((1L, "a", 10, false), (2L, "b", 20, false)).toDF("k", "s", "v", "del"), 0L)
    // batch 1: update 1, delete 2, insert 3
    apply(Seq((1L, "A", 11, false), (2L, "b", 20, true), (3L, "c", 30, false))
      .toDF("k", "s", "v", "del"), 1L)
    assert(VersionedSink.read(spark, dir).as[(Long, String, Int)].collect().toSet
      === Set((1L, "A", 11), (3L, "c", 30)))
    // replay of batch 1 is a no-op (no new version, same content)
    apply(Seq((1L, "A", 11, false), (2L, "b", 20, true), (3L, "c", 30, false))
      .toDF("k", "s", "v", "del"), 1L)
    assert(VersionedSink.versions(spark, dir) === Seq(0L, 1L))
    // crash window: force the pointer back, replay must republish
    VersionedSink.rollback(spark, dir, 0L)
    apply(Seq.empty[(Long, String, Int, Boolean)].toDF("k", "s", "v", "del"), 1L)
    assert(VersionedSink.latestVersion(spark, dir) === Some(1L))
    // every historical state remains time-travelable
    assert(VersionedSink.readAsOf(spark, dir, 0L).count() === 2)
  }

  test("editDistanceJoin equals brute-force levenshtein on random strings (d=0,1,2)") {
    val rnd = new Random(42)
    // small alphabet + short lengths → dense collisions, ties, empties
    def mkStrings(n: Int): Seq[(Long, String)] =
      (0 until n).map(i => (i.toLong, (0 until rnd.nextInt(9)).map(_ => "abc" (rnd.nextInt(3))).mkString))
    val ls = mkStrings(120)
    val rs = mkStrings(150)
    val left = ls.toDF("a_id", "a_s")
    val right = rs.toDF("b_id", "b_s")
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    for (d <- 0 to 2) {
      val got = EditDistanceJoin.editDistanceJoin(left, "a_id", "a_s", right, "b_id", "b_s", d)
        .as[(Long, Long, Int)].collect().toSet
      val exp = (for {
        (ai, as) <- ls; (bi, bs) <- rs
        dist = lev(as, bs) if dist <= d
      } yield (ai, bi, dist)).toSet
      assert(got === exp, s"d=$d: ${got.size} got vs ${exp.size} expected; " +
        s"missing=${(exp -- got).take(5)} spurious=${(got -- exp).take(5)}")
    }
  }

  test("multi-match-aware probe selection emits strictly fewer candidates than the ±d window") {
    val rnd = new Random(99)
    val strs = (0 until 200).map(i =>
      (i.toLong, (0 until (4 + rnd.nextInt(12))).map(_ => "abcd" (rnd.nextInt(4))).mkString))
    val df = strs.toDF("a_id", "a_s")
    for (d <- 1 to 2) {
      val k = d + 1
      val got = graft.operators.EditDistanceJoin
        .probeSegments(df, "a_id", "a_s", d).count()
      // the sound-but-loose window this replaced: every start within ±d
      // of the slot's home position (local replay of the old arithmetic)
      val naive = strs.map { case (_, s) =>
        val ls = s.length
        (math.max(ls - d, k) to ls + d).filter(_ >= k).map { tl =>
          (0 to d).map { i =>
            val home = i * (tl / k) + math.min(i, tl % k)
            val segLen = tl / k + (if (i < tl % k) 1 else 0)
            val lo = math.max(home - d, 0)
            val hi = math.min(home + d, ls - segLen)
            math.max(0, hi - lo + 1)
          }.sum
        }.sum
      }.sum
      assert(got < naive, s"d=$d: multi-match $got vs naive $naive")
      assert(got * 3 < naive * 2, s"d=$d: expected ≥1/3 reduction, got $got vs $naive")
    }
  }

  test("editDistanceJoin plans the candidate phase as an equi-join, not a nested loop") {
    val df = (0L until 50L).map(i => (i, s"string$i")).toDF("a_id", "a_s")
    val df2 = (0L until 50L).map(i => (i, s"string$i")).toDF("b_id", "b_s")
    val q = EditDistanceJoin.editDistanceJoin(df, "a_id", "a_s", df2, "b_id", "b_s", 1)
    val plan = q.queryExecution.executedPlan.toString
    // the long-string candidate phase must be hash/sort-merge on the
    // segment key; the only tolerated nested loop is the short-string
    // bucket (strings of length <= 2, empty here but planned)
    val segJoins = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.toString.contains("__seg")) => j
    }
    assert(segJoins.nonEmpty, s"no segment equi-join found in:\n$plan")
    assert(segJoins.forall(_.condition.get.toString.contains("=")))
  }

  test("scd2: consecutive identical values collapse; same-ts flips keep order by tie-break") {
    val hist = Seq(
      // key 1: A A B A -> 3 intervals
      (1L, 10L, 100L, "A"), (1L, 20L, 101L, "A"), (1L, 30L, 102L, "B"), (1L, 40L, 103L, "A"),
      // key 2: two flips at the SAME ts, ordered by ord -> B then C
      (2L, 10L, 200L, "A"), (2L, 20L, 201L, "B"), (2L, 20L, 202L, "C"))
      .toDF("k", "ts", "oid", "attr")
    val dim = operators.Scd.buildType2(hist, "k", "ts", "oid", "attr")
      .select("k", "version", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, Int, String, Long, Option[Long], Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(dim.toSeq == Seq(
      (1L, 1, "A", 10L, Some(30L), false),
      (1L, 2, "B", 30L, Some(40L), false),
      (1L, 3, "A", 40L, None, true),
      (2L, 1, "A", 10L, Some(20L), false),
      (2L, 2, "B", 20L, Some(20L), false),
      (2L, 3, "C", 20L, None, true)))
  }

  test("scd2: intervals tile the timeline — every valid_to equals the next valid_from") {
    val rnd = new Random(3)
    val hist = (1 to 300).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong, s"s${rnd.nextInt(3)}")
    }.toDF("k", "ts", "oid", "attr")
    val dim = operators.Scd.buildType2(hist, "k", "ts", "oid", "attr")
      .select("k", "version", "valid_from", "valid_to")
      .as[(Long, Int, Long, Option[Long])].collect()
    dim.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"gap between $a and $b")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty) // exactly one current row per key
    }
  }

  test("interval merge islands: q165 invariants — islands disjoint, orders covered") {
    val out = QueryRegistry.byName("q165_interval_merge").run(spark, "/root/testdata/sf0.001")
      .select("o_custkey", "island", "covered_from", "covered_to", "n_orders")
      .as[(Long, Int, String, String, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._3, s"islands overlap: $a then $b")
        case _ => ()
      }
    }
    val totalOrders = Tables.orders(spark, "/root/testdata/sf0.001").count()
    assert(out.map(_._5).sum == totalOrders)
  }

  test("blocking: globalRank equals the window row_number at any partition count") {
    val rnd = new Random(5)
    val data = (1 to 500).map(i => (i.toLong, s"n${rnd.nextInt(100)}")).toDF("id", "name")
    val expected = data
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("name"), col("id"))).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = operators.Blocking
        .globalRank(data.repartition(parts), Seq(col("name"), col("id")))
        .select("id", "rn").as[(Long, Long)].collect().toMap
      assert(got == expected, s"rank diverged at $parts partitions")
    }
  }

  test("blocking: sorted-neighborhood candidate volume is exactly n*w - w(w+1)/2") {
    val data = (1 to 200).map(i => (i.toLong, s"x${i % 17}")).toDF("id", "name")
    for (w <- Seq(1, 2, 4)) {
      val n = 200L
      val cand = operators.Blocking
        .sortedNeighborhood(data, Seq(col("name"), col("id")), w).count()
      assert(cand == n * w - w.toLong * (w + 1) / 2, s"window $w: got $cand")
    }
  }

  test("apportionment: allocations sum exactly to the budget and respect quota bounds") {
    val out = QueryRegistry.byName("q166_apportion_budget").run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
    val budget = 1000000L
    val tw = out.map(_._2).sum
    assert(out.map(_._3).sum == budget, "largest-remainder must allocate the budget exactly")
    out.foreach { case (src, w, alloc) =>
      val floor = budget * w / tw
      assert(alloc == floor || alloc == floor + 1, s"$src alloc $alloc outside quota [$floor, ${floor + 1}]")
    }
  }
}
