package graft

import org.apache.spark.sql.functions._

/** Apriori itemset-mining contracts (operators/Apriori): brute-force
  * equality, apriori pruning, set semantics, canonical form. */
class AprioriSpec extends SparkSpec {

  import spark.implicits._

  private def mine(rows: Seq[(String, String)], pct: Int, maxLen: Int) =
    operators.Apriori.frequentItemsets(rows.toDF("bid", "item"), pct, maxLen)
      .as[(String, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  /** In-memory reference: enumerate every itemset of every basket. */
  private def brute(rows: Seq[(String, String)], pct: Int, maxLen: Int)
      : Map[String, (Int, Long)] = {
    val baskets = rows.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val minsup = (baskets.size * pct + 99) / 100
    baskets
      .flatMap(b => (1 to math.min(maxLen, b.size))
        .flatMap(k => b.toSeq.sorted.combinations(k).map(_.mkString(","))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minsup)
      .map { case (is, n) => is -> ((is.count(_ == ',') + 1, n)) }
  }

  test("apriori: equals the brute-force subset enumeration") {
    val rnd = new scala.util.Random(7)
    val items = Seq("a", "b", "c", "d", "e")
    val rows = for {
      b <- 1 to 40
      it <- rnd.shuffle(items).take(1 + rnd.nextInt(4))
    } yield (s"b$b", it)
    assert(mine(rows, 10, 4) == brute(rows, 10, 4))
    assert(mine(rows, 30, 3) == brute(rows, 30, 3))
  }

  test("apriori: an infrequent item never seeds a larger itemset (pruning)") {
    // 'z' appears once (below 50% of 4 baskets) — no itemset contains it,
    // even though {a,z} co-occurs in that basket
    val rows = Seq(
      ("b1", "a"), ("b1", "z"), ("b2", "a"), ("b3", "a"), ("b4", "a"), ("b4", "b"))
    val got = mine(rows, 50, 3)
    assert(got.contains("a"))
    assert(!got.keys.exists(_.contains("z")))
  }

  test("apriori: duplicate items in a basket collapse (set semantics)") {
    val rows = Seq(("b1", "a"), ("b1", "a"), ("b1", "b"), ("b2", "a"), ("b2", "b"))
    val got = mine(rows, 100, 2)
    assert(got == Map("a" -> ((1, 2L)), "b" -> ((1, 2L)), "a,b" -> ((2, 2L))))
  }

  test("apriori: itemsets are canonical ascending (each counted once per basket)") {
    // basket with items inserted in descending order still yields "a,b,c"
    val rows = Seq(("b1", "c"), ("b1", "b"), ("b1", "a"))
    val got = mine(rows, 100, 3)
    assert(got.keySet == Set("a", "b", "c", "a,b", "a,c", "b,c", "a,b,c"))
    assert(got.values.forall(_._2 == 1L))
  }

  test("apriori: degenerate parameters refuse at the door") {
    intercept[IllegalArgumentException] {
      operators.Apriori.frequentItemsets(Seq(("b", "a")).toDF("bid", "item"), 0, 3)
    }
    intercept[IllegalArgumentException] {
      operators.Apriori.frequentItemsets(Seq(("b", "a")).toDF("bid", "item"), 50, 7)
    }
  }
}
