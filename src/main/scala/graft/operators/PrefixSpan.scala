package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded level-wise sequential-pattern mining (the GSP/PrefixSpan
  * family: Srikant & Agrawal 1996, Pei et al. 2001) — which event
  * ORDERINGS recur across sequences, gaps allowed. q200's trigram miner
  * documents itself as "the sequence-mining primer before a full
  * PrefixSpan"; this is that follow-up: patterns are general
  * subsequences (click … view … purchase with anything in between), not
  * contiguous windows, grown level by level under apriori support
  * pruning.
  *
  * Semantics: a sequence `sid` supports pattern e1>…>ek iff its events
  * contain the pattern as a SUBSEQUENCE (order preserved, gaps free);
  * support = number of distinct sequences (not occurrences). minsup =
  * ceil(minSupportPct% of sequences). Patterns up to `maxLen` items.
  *
  * Shape, per level (fixed `maxLen` rounds — the BPE/PageRank posture):
  *  - extend: occ_{k-1} (one row per (sid, frequent pattern): the
  *    EARLIEST position where the pattern completes — greedy matching
  *    is exact for subsequence containment, so one row per pair is
  *    enough) equi-joins the item-filtered events on `sid` with a
  *    `pos > epos` residual, then re-aggregates min(pos) per
  *    (sid, pattern+item). Every join in the loop keys on sid — one
  *    partitioning reused all the way down; the per-sid blow-up is
  *    bounded by |frequent patterns| × sequence length, and apriori
  *    pruning shrinks the pattern frontier each round;
  *  - prune: support counts per pattern (occ is distinct-by-construction
  *    so count(*) IS the sequence count), filtered against a ONE-ROW
  *    broadcast minsup (never a driver scalar);
  *  - the item dictionary f1 (≤ |event vocabulary|) broadcasts.
  *
  * Exactness: pure integer counting and string concatenation — DuckDB
  * replays the rounds as CTEs verbatim (q244).
  *
  * Input `ev` needs columns (sid, e, pos) with pos a 1-based order rank
  * within sid. Returns (pattern, len, support), unordered — callers
  * apply the total order.
  *
  * Two tiers: [[frequentPatterns]] (gaps free — one earliest-occurrence
  * row per (sid, pattern), the cheap frame) and
  * [[frequentPatternsMaxGap]] (bounded gaps — the full occurrence
  * end-position list, exact where the greedy trick provably is not).
  */
object PrefixSpan {
  private def require0(minSupportPct: Int, maxLen: Int): Unit = {
    require(minSupportPct >= 1 && minSupportPct <= 100,
      s"PrefixSpan wants minSupportPct in [1, 100], got $minSupportPct")
    require(maxLen >= 1 && maxLen <= 6,
      s"PrefixSpan wants maxLen in [1, 6] (the pattern grid is O(|items|^maxLen)), got $maxLen")
  }

  /** Shared prologue: normalized rows, the 1-row broadcast minsup, and
    * the item-filtered event frame (all persisted — each would
    * otherwise recompute per broadcast reference / per level). */
  private def prep(ev: DataFrame, minSupportPct: Int): (DataFrame, DataFrame) = {
    val rows = graft.Q.persistOnce(
      ev.select(col("sid"), col("e"), col("pos").cast("long").as("pos")))
    val ms = graft.Q.persistOnce(rows.agg(
      expr(s"(count(distinct sid) * $minSupportPct + 99) div 100").as("minsup")))
    val f1 = rows.groupBy("e").agg(countDistinct("sid").as("n1"))
      .crossJoin(broadcast(ms)).filter(col("n1") >= col("minsup")).select("e")
    val evf = graft.Q.persistOnce(rows.join(broadcast(f1), "e")
      .select(col("sid"), col("e"), col("pos")))
    (ms, evf)
  }

  def frequentPatterns(ev: DataFrame, minSupportPct: Int, maxLen: Int): DataFrame = {
    require0(minSupportPct, maxLen)
    val (ms, evf) = prep(ev, minSupportPct)
    def support(occ: DataFrame, k: Int): DataFrame =
      occ.groupBy("pat").agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(ms)).filter(col("support") >= col("minsup"))
        .select(col("pat"), lit(k).as("len"), col("support"))
    var occ = graft.Q.persistOnce(
      evf.groupBy(col("sid"), col("e").as("pat")).agg(min("pos").as("epos")))
    var out = support(occ, 1)
    for (k <- 2 to maxLen) {
      val cand = graft.Q.persistOnce(
        occ.join(evf, Seq("sid"))
          .filter(col("pos") > col("epos"))
          .groupBy(col("sid"), concat(col("pat"), lit(">"), col("e")).as("pat"))
          .agg(min("pos").as("epos")))
      val sup = support(cand, k)
      occ = graft.Q.persistOnce(cand.join(sup.select("pat"), "pat")
        .select(col("sid"), col("pat"), col("epos")))
      out = out.unionAll(sup)
    }
    out.select(col("pat").as("pattern"), col("len"), col("support"))
  }

  /** Gap-constrained tier: consecutive pattern items must sit within
    * `maxGap` positions of each other (v.pos ∈ (prev, prev + maxGap]) —
    * "funnel-like" near-contiguous paths rather than anywhere-in-the-
    * journey orderings. Earliest-occurrence greedy matching is NOT
    * exact here (a LATER occurrence of the prefix can admit an
    * extension the earliest one forbids — e.g. 'a . . . a b' under
    * maxGap 1: the first 'a' reaches nothing, the second reaches 'b'),
    * so occurrences carry their FULL distinct end-position list:
    * occ_k holds every (sid, pattern, pos) such that some gap-valid
    * occurrence ends at pos — exact by induction — and support counts
    * DISTINCT sequences. Scale: the per-level join fanout is bounded
    * by maxGap (each occurrence row meets ≤ maxGap successor events),
    * so the occurrence frame grows by at most ×maxGap per level before
    * the DISTINCT and the apriori prune pull it back; all joins still
    * key on sid. The unconstrained tier keeps the O(1)-per-(sid,
    * pattern) earliest-occurrence frame — use it when gaps are free. */
  def frequentPatternsMaxGap(ev: DataFrame, minSupportPct: Int, maxLen: Int,
      maxGap: Int): DataFrame = {
    require0(minSupportPct, maxLen)
    require(maxGap >= 1 && maxGap <= 64,
      s"PrefixSpan wants maxGap in [1, 64] (fanout is O(maxGap) per level), got $maxGap")
    val (ms, evf) = prep(ev, minSupportPct)
    def support(occ: DataFrame, k: Int): DataFrame =
      occ.groupBy("pat").agg(countDistinct("sid").as("support"))
        .crossJoin(broadcast(ms)).filter(col("support") >= col("minsup"))
        .select(col("pat"), lit(k).as("len"), col("support"))
    var occ = graft.Q.persistOnce(
      evf.select(col("sid"), col("e").as("pat"), col("pos").as("epos")).distinct())
    var out = support(occ, 1)
    for (k <- 2 to maxLen) {
      val cand = graft.Q.persistOnce(
        occ.join(evf, Seq("sid"))
          .filter(col("pos") > col("epos") && col("pos") <= col("epos") + maxGap.toLong)
          .select(col("sid"), concat(col("pat"), lit(">"), col("e")).as("pat"),
            col("pos").as("epos"))
          .distinct())
      val sup = support(cand, k)
      occ = graft.Q.persistOnce(cand.join(sup.select("pat"), "pat")
        .select(col("sid"), col("pat"), col("epos")))
      out = out.unionAll(sup)
    }
    out.select(col("pat").as("pattern"), col("len"), col("support"))
  }
}
