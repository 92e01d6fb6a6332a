package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.tokens

/** Distributed byte-pair-encoding vocabulary induction (Sennrich et al.
  * 2016) — the tokenizer-training step a training-data pipeline runs
  * after curation. Classic BPE is a single-machine loop over a word
  * counter; this restates each round as three bounded Spark stages so the
  * SAME loop runs over a 10^8-row distinct-word dictionary:
  *
  *   1. pair counting: one partial-agg'd aggregation over the exploded
  *      symbol sequences — shuffle volume is bounded by the number of
  *      DISTINCT adjacent pairs (≤ |alphabet + merges|^2), not corpus
  *      size, because map-side combine collapses each partition first;
  *   2. argmax: TakeOrdered(1) with the deterministic (count desc, pair
  *      asc) tie-break — one pair of driver metadata per round;
  *   3. merge application: pure window arithmetic partitioned BY WORD
  *      (partitions are word-length-sized, no skew possible), with
  *      greedy leftmost-non-overlap resolved algebraically: a merge
  *      fires at position p iff (tok, next) matches AND p's offset
  *      inside its maximal run of consecutive match-starts is even —
  *      runs longer than 1 only occur for self-pairs like (a, a), where
  *      even-offset selection IS the greedy scan's choice.
  *
  * The whole round is replayable in SQL (the q159 oracle unrolls
  * iterations as CTEs with this exact formulation), so learned merges
  * verify cross-engine, count-exact. The corpus is touched ONCE (word
  * frequency dictionary); all rounds run over the vocab table, which is
  * persisted and replaced per round.
  */
object Bpe {

  private val wp = Window.partitionBy("word").orderBy("p")

  /** Word-frequency dictionary with initial single-character symbol
    * sequences — the one corpus-wide pass. */
  def initVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("toks",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Symbol sequences exploded to (word, freq, p, tok, nxt) rows. */
  def exploded(vocab: DataFrame): DataFrame =
    vocab.select(col("word"), col("freq"), posexplode(col("toks")).as(Seq("p", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(wp))

  /** Adjacent-pair frequencies, weighted by word frequency. */
  def pairCounts(ex: DataFrame): DataFrame =
    ex.filter(col("nxt").isNotNull)
      .groupBy(col("tok").as("a"), col("nxt").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Replace every greedy-leftmost occurrence of adjacent (a, b) with the
    * merged symbol, rebuilding each word's symbol array. */
  def applyMerge(ex: DataFrame, a: String, b: String): DataFrame =
    ex
      .withColumn("isStart",
        coalesce(col("tok") === lit(a) && col("nxt") === lit(b), lit(false)))
      // last non-start position before p: merge parity is measured from
      // the start of p's run of consecutive match-starts
      .withColumn("pns", coalesce(
        max(when(!col("isStart"), col("p")))
          .over(wp.rowsBetween(Window.unboundedPreceding, -1)),
        lit(-1)))
      .withColumn("mergeAt",
        col("isStart") && (col("p") - col("pns") - 1) % 2 === 0)
      .withColumn("consumed", coalesce(lag(col("mergeAt"), 1).over(wp), lit(false)))
      .withColumn("tok2",
        when(col("mergeAt"), concat(col("tok"), col("nxt"))).otherwise(col("tok")))
      .filter(!col("consumed"))
      .groupBy("word", "freq")
      .agg(transform(array_sort(collect_list(struct(col("p"), col("tok2")))),
        x => x.getField("tok2")).as("toks"))

  /** Run `iters` merge rounds; returns the learned merge table
    * (iteration, left, right, pair count) and the final vocab. The vocab
    * is persisted across rounds and swapped each iteration; callers
    * should unpersist the returned frame when done. */
  def train(vocab0: DataFrame, iters: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = vocab0.persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var it = 1
    while (it <= iters) {
      val ex = exploded(vocab)
      val best = pairCounts(ex)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (best.nonEmpty) {
        val r = best(0)
        val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((it, a, b, cnt))
        val next = applyMerge(ex, a, b).persist()
        next.count() // materialize before dropping the previous round
        vocab.unpersist()
        vocab = next
      } else {
        it = iters // no pairs left (all words are single symbols)
      }
      it += 1
    }
    (merges.toSeq, vocab)
  }
}
