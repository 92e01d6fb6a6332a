package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.hash60
import graft.operators.Sampling
import graft.plans.BottomKAgg

/** Coordinated sampling: the bottom-k aggregate vs the window-sort
  * formulation, heap invariants, and the weighted-sample contracts. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(4321)

  private def randomDocs(n: Int, groups: Int) =
    (1 to n).map { i =>
      (i.toLong * 7 + rnd.nextInt(3), s"g${rnd.nextInt(groups)}")
    }.toDF("id", "grp").distinct().cache()

  test("bottomK matches the row_number window formulation exactly") {
    val df = randomDocs(3000, 7)
    val k = 11
    val got = Sampling.bottomK(df, Seq("grp"), "id", k, "seedX")
      .select("grp", "id", "rk")
    val h = hash60("seedX", col("id"))
    val want = df
      .withColumn("rk",
        row_number().over(Window.partitionBy("grp").orderBy(h, col("id"))))
      .filter(col("rk") <= k)
      .select("grp", "id", "rk")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("bottomK with k larger than every group returns all rows ranked") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val got = Sampling.bottomK(df, Seq("grp"), "id", 10, "s")
    assert(got.count() === 3)
    assert(got.filter(col("grp") === "a").agg(max("rk")).as[Int].head() === 2)
  }

  test("bottomK is reproducible and seed-sensitive") {
    val df = randomDocs(500, 3)
    val a = Sampling.bottomK(df, Seq("grp"), "id", 5, "s1").collect().toSet
    val b = Sampling.bottomK(df, Seq("grp"), "id", 5, "s1").collect().toSet
    val c = Sampling.bottomK(df, Seq("grp"), "id", 5, "s2").collect().toSet
    assert(a === b)
    assert(a !== c)
  }

  test("Heap keeps exactly the k lexicographically-smallest pairs") {
    for (trial <- 1 to 50) {
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(40)
      val pairs = (1 to n).map(_ => (rnd.nextInt(10).toLong, rnd.nextLong()))
      val heap = new BottomKAgg.Heap(k)
      pairs.foreach { case (a, b) => heap.offer(a, b) }
      assert(heap.sortedPairs === pairs.sorted.take(k),
        s"trial $trial: k=$k n=$n")
    }
  }

  test("Heap merge order does not change the result") {
    val pairs = (1 to 200).map(_ => (rnd.nextInt(50).toLong, rnd.nextLong()))
    val (l, r) = pairs.splitAt(77)
    val h1 = new BottomKAgg.Heap(9); l.foreach { case (a, b) => h1.offer(a, b) }
    val h2 = new BottomKAgg.Heap(9); r.foreach { case (a, b) => h2.offer(a, b) }
    h2.foreachPair((a, b) => h1.offer(a, b))
    val all = new BottomKAgg.Heap(9)
    pairs.reverse.foreach { case (a, b) => all.offer(a, b) }
    assert(h1.sortedPairs === all.sortedPairs)
  }

  test("bottomK plan aggregates — no Window sort of the full input") {
    val df = randomDocs(200, 3)
    val plan = Sampling.bottomK(df, Seq("grp"), "id", 5, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bottom_k"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("graft_bottom_k is SQL-callable and skips null keys/payloads") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    Seq((Some(5L), Some(50L)), (None, Some(60L)), (Some(3L), None),
      (Some(1L), Some(10L)), (Some(2L), Some(20L)))
      .toDF("h", "id").createOrReplaceTempView("bk_in")
    val got = spark.sql(
      "SELECT graft_bottom_k(h, id, 2) AS bk FROM bk_in")
      .selectExpr("inline(bk)").as[(Long, Long)].collect().toSeq
    // null key and null payload rows contribute nothing; 2 smallest remain
    assert(got === Seq((1L, 10L), (2L, 20L)))
  }

  test("weightedSample: k winners, ticket counts respect weights, deterministic") {
    val df = (1 to 300).map(i => (i.toLong, 1 + i % 4)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", col("w"), 25, "ws")
    val rows = got.collect()
    assert(rows.length === 25)
    // hashes ascending, replica never exceeds the row's weight
    val hs = rows.map(_.getAs[Long]("h"))
    assert(hs.sameElements(hs.sorted))
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Int]("replica") <= 1 + (id % 4).toInt)
    }
    val again = Sampling.weightedSample(df, "id", col("w"), 25, "ws").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("weightedSample plan is a TakeOrdered, not a global sort") {
    val df = (1 to 100).map(i => (i.toLong, 2)).toDF("id", "w")
    val plan = Sampling.weightedSample(df, "id", col("w"), 5, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
