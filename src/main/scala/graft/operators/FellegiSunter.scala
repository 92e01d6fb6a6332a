package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969, JASA) —
  * the probabilistic tier on top of [[Blocking]]'s candidate generator:
  * each field agreement contributes evidence weight ln(m/u), each
  * disagreement ln((1−m)/(1−u)), and a pair's match score is the sum.
  * u (chance agreement between NON-matches) is estimated exactly from
  * value frequencies — u_f = Σ_v c_v(c_v−1) / (N(N−1)), the probability
  * two random records agree on field f — and m (agreement among true
  * matches) is a fixed clerical prior, the standard cold-start posture
  * (production linkers like Splink start exactly here before EM).
  *
  * Integer posture: u and the m-ratios are exact int64 rationals, and
  * each weight takes the ONE certified float step the repo allows —
  * [[Guards.lnMicronatFloor]] onto the 10⁶ micronat grid (so ln(m/u) =
  * −ln(u/m) = −ln(num/den) with num = mDen·Σc(c−1), den = mNum·N(N−1)).
  * Pair scores are then pure integer sums of per-field constants. The
  * N(N−1) and mDen·Σ products are guarded in-plan (division-only
  * checks); beyond ~6.7·10⁸ records per linkage universe the grid must
  * coarsen — refused loudly, never wrapped.
  *
  * Scale shape: field weights cost one value-count aggregate per field
  * over the record frame (each partial-agg'd, build sides one row per
  * VALUE) and reduce to a ≤|fields|-row broadcast; scoring adds zero
  * shuffles on top of the blocked pair frame — a crossJoin attach of
  * the 1-row weight vector and a codegen'd sum.
  */
object FellegiSunter {

  /** Per-field micronat weights: (field, w_agree_micro, w_disagree_micro).
    * `mNum/mDen` is the clerical m prior (default 19/20). Fields where
    * every value is unique (u = 0: agreement would be infinite evidence)
    * refuse — such a field is an identifier, not a comparison field.
    */
  def fieldWeights(records: DataFrame, fields: Seq[String],
      mNum: Long = 19L, mDen: Long = 20L): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    require(mNum > 0 && mDen > mNum, "m must sit strictly inside (0, 1)")
    val k = Long.MaxValue / mDen
    val perField = fields.map { f =>
      records.groupBy(col(f)).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1L)).as("scc"), sum(col("c")).as("n"))
        .select(lit(f).as("field"), col("scc"), col("n"))
    }.reduce(_ union _)
    perField
      .withColumn("nn",
        Guards(col("n") <= lit(3037000499L), // floor(sqrt(2^63−1))
          col("n") * (col("n") - 1L),
          Guards.msg("fs",
            lit("universe of "), col("n").cast("string"),
            lit(" records wraps N*(N-1) past 2^63; link within finer blocks"))))
      .withColumn("den",
        Guards(col("nn") <= lit(k) && col("scc") <= lit(k),
          col("nn") * lit(mNum),
          Guards.msg("fs",
            lit("m-prior scaling of field "), col("field"),
            lit(" leaves int64; coarsen the prior ratio")))) // mNum < mDen: nn*mDen is the binding bound
      .withColumn("w_agree_micro",
        Guards(col("scc") > 0L,
          Guards.lnMicronatFloor(col("scc") * lit(mDen), col("den"), "fs"),
          Guards.msg("fs",
            lit("field "), col("field"),
            lit(" never repeats a value (u = 0) - an identifier, not a "),
            lit("comparison field; drop it or bucket it"))))
      .withColumn("w_disagree_micro",
        Guards.lnMicronatFloor(
          (col("nn") - col("scc")) * lit(mDen),
          col("nn") * lit(mDen - mNum), "fs"))
      .select(col("field"), col("w_agree_micro"), col("w_disagree_micro"))
  }

  /** Score blocked candidate pairs carrying `a_<field>` / `b_<field>`
    * columns ([[Blocking.sortedNeighborhood]]'s naming): attaches
    * n_agree and the summed score_micro. `weights` is the
    * [[fieldWeights]] frame (≤|fields| rows — broadcast-attached). */
  def scorePairs(pairs: DataFrame, fields: Seq[String],
      weights: DataFrame): DataFrame = {
    val wcols = fields.flatMap(f => Seq(
      max(when(col("field") === f, col("w_agree_micro"))).as(s"__wa_$f"),
      max(when(col("field") === f, col("w_disagree_micro"))).as(s"__wd_$f")))
    val wrow = weights.groupBy().agg(wcols.head, wcols.tail: _*)
    val agree: String => Column =
      f => col(s"a_$f") <=> col(s"b_$f")
    val score = fields.map(f =>
      when(agree(f), col(s"__wa_$f")).otherwise(col(s"__wd_$f")))
      .reduce(_ + _)
    val nAgree = fields.map(f => when(agree(f), 1).otherwise(0)).reduce(_ + _)
    pairs.crossJoin(broadcast(wrow)) // 1-row attach, not a pair explosion
      .withColumn("n_agree", nAgree.cast("int"))
      .withColumn("score_micro", score)
      .drop(fields.flatMap(f => Seq(s"__wa_$f", s"__wd_$f")): _*)
  }
}
