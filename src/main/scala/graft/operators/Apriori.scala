package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded level-wise frequent-itemset mining (Apriori: Agrawal &
  * Srikant, VLDB 1994) — which item SETS recur across baskets,
  * order-free. The set-shaped sibling of [[PrefixSpan]]: sequential
  * patterns ask "in what order", itemsets ask "together at all" — the
  * association-rule substrate (market baskets, co-failing checks,
  * co-occurring quality flags).
  *
  * Semantics: a basket `bid` supports itemset {i1 < … < ik} iff it
  * contains every element; support = number of distinct baskets.
  * minsup = ceil(minSupportPct% of baskets), held as a ONE-ROW
  * broadcast (never a driver scalar). Itemsets are canonical
  * ascending-sorted comma strings, so each basket generates each
  * itemset exactly once by construction (extension items are strictly
  * greater than the last element — the lexicographic tree walk).
  *
  * Shape per level (fixed `maxLen` rounds — the BPE/PageRank posture):
  * occ_{k-1} (one row per (bid, frequent (k-1)-itemset) carrying its
  * LAST element) equi-joins the item-filtered basket rows on `bid`
  * with an `item > last` residual — so per-basket fanout is bounded by
  * basket size, never vocabulary — then prunes against minsup.
  * count(*) IS the basket count (occ is distinct-by-construction).
  * Every join keys on bid: one partitioning serves all levels. Apriori
  * soundness: a candidate extends only a SUPPORTED (k-1)-occurrence, so
  * every subset-infrequent branch dies before it fans out.
  *
  * Exactness: pure integer counting and string concatenation — a SQL
  * oracle unrolls the levels as CTEs verbatim (q251).
  *
  * Input `rows` needs (bid, item) with item a string; duplicates are
  * collapsed (set semantics). Returns (itemset, len, support),
  * unordered — callers apply the total order.
  */
object Apriori {

  def frequentItemsets(rows: DataFrame, minSupportPct: Int, maxLen: Int): DataFrame = {
    require(minSupportPct >= 1 && minSupportPct <= 100,
      s"Apriori wants minSupportPct in [1, 100], got $minSupportPct")
    require(maxLen >= 1 && maxLen <= 6,
      s"Apriori wants maxLen in [1, 6] (the itemset grid is O(|items|^maxLen)), got $maxLen")
    val b = graft.Q.persistOnce(
      rows.select(col("bid"), col("item").cast("string").as("item")).distinct())
    val minsup = graft.Q.persistOnce(b.agg(
      expr(s"(count(distinct bid) * $minSupportPct + 99) div 100").as("minsup")))
    val f1 = b.groupBy("item").agg(count(lit(1)).as("n1"))
      .crossJoin(broadcast(minsup)).filter(col("n1") >= col("minsup")).select("item")
    val bf = graft.Q.persistOnce(b.join(broadcast(f1), "item")
      .select(col("bid"), col("item")))
    def support(occ: DataFrame, k: Int): DataFrame =
      occ.groupBy("iset").agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(minsup)).filter(col("support") >= col("minsup"))
        .select(col("iset"), lit(k).as("len"), col("support"))
    var occ = graft.Q.persistOnce(
      bf.select(col("bid"), col("item").as("iset"), col("item").as("last")))
    var out = support(occ, 1)
    for (k <- 2 to maxLen) {
      val cand = graft.Q.persistOnce(
        occ.join(bf, Seq("bid"))
          .filter(col("item") > col("last"))
          .select(col("bid"), concat(col("iset"), lit(","), col("item")).as("iset"),
            col("item").as("last")))
      val sup = support(cand, k)
      occ = graft.Q.persistOnce(cand.join(sup.select("iset"), "iset")
        .select(col("bid"), col("iset"), col("last")))
      out = out.unionAll(sup)
    }
    out.select(col("iset").as("itemset"), col("len"), col("support"))
  }
}
