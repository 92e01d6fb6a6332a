package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram cross-entropy scoring (Kneser & Ney,
  * ICASSP 1995; Chen & Goodman 1998's interpolated form) — the
  * word-order-aware quality gate beside q120's unigram cross-entropy:
  * a unigram LM scores "rare words", a KN bigram LM scores "rare word
  * SEQUENCES", the classic cheap fluency filter a curation pipeline
  * runs before anything neural (shuffled or boilerplate-stitched text
  * has common words in uncommon order and scores high).
  *
  * The corpus is its own model (the q120 self-scoring posture), so
  * every scored bigram has count ≥ 1 and no OOV smoothing tier is
  * needed. With absolute discount D = 3/4 (Chen & Goodman's canonical
  * 0.75 as an exact rational), the interpolated-KN probability is a
  * ratio of int64 products:
  *
  *   P(w|v) = (c(v,w) − D)/c(v) + (D·N1+(v,·)/c(v)) · N1+(·,w)/B
  *          = (B·(4·c(v,w) − 3) + 3·N1+(v,·)·N1+(·,w)) / (4·B·c(v))
  *
  * with c(v) the context count, N1+(v,·) the distinct continuations of
  * v, N1+(·,w) the distinct contexts of w (the continuation count that
  * makes KN rank "Francisco" low despite its frequency), and B the
  * total distinct bigram types. Both sides of the ratio are exact
  * integers; the ONE float step is q120's: each bigram's
  * floor(−ln(num/den)·10^6) lands on the integer micronat grid BEFORE
  * the per-doc sum, so totals are order-independent and immune to
  * float-sum wobble — and the floor itself is CERTIFIED in-plan via
  * [[Guards.lnMicronatFloor]], which refuses loudly when the scaled
  * log sits within the cross-engine ulp bound of a grid boundary (the
  * 1-ulp libm ln skew that could silently flip a floor at 10⁹+ bigram
  * types). Overflow: num ≤ 7·B·c(v) < 2·den, so the single
  * in-plan bound c(v) ≤ (2^63−1 div 8) div B covers every product
  * ([[Guards]] — refuses loudly, never wraps).
  *
  * Scale shape: the corpus-scale work is ONE (doc, v, w) partial-agg'd
  * count; every model table (bigram types, context counts,
  * continuation counts) aggregates off it, joins back BY TYPE (build
  * sides are one row per bigram/context/continuation type, so a hot
  * collocation cannot blow up a join), and B is a 1-row broadcast.
  * Bigrams are generated scan-stage with the tokens column bound ONCE
  * as a lambda variable (the array-wrap/flatten idiom — a raw Column
  * argument inlines through CollapseProject and re-tokenizes per
  * position when interpreted).
  *
  * Returns one row per document with ≥ 2 tokens:
  * `(doc_id, n_bigrams, sum_micronats, xent_micronats)` — micronats on
  * the 10^6 grid, xent floored.
  */
object KneserNey {
  /** Adjacent-pair structs from an already-projected tokens column;
    * `ts` bound once (see TextAnalysis.shinglesFromTokens).
    * Package-private: tools.FloatMargin rebuilds the model grid. */
  private[graft] def bigramsFromTokens(ts: Column): Column =
    flatten(transform(array(ts), arr =>
      when(size(arr) >= 2,
        transform(sequence(lit(1), size(arr) - 1),
          i => struct(element_at(arr, i).as("v"), element_at(arr, i + 1).as("w"))))
        .otherwise(array().cast("array<struct<v:string,w:string>>"))))

  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val big = docs.select(col(idCol).as("doc_id"),
        explode(bigramsFromTokens(
          graft.functions.GraftFunctions.tokens(lower(col(textCol))))).as("bg"))
      .select(col("doc_id"), col("bg.v").as("v"), col("bg.w").as("w"))
    // the one corpus-scale shuffle; every model table derives from it
    val tfb = graft.Q.persistOnce(
      big.groupBy("doc_id", "v", "w").agg(count(lit(1)).as("c_doc")))
    val bc = graft.Q.persistOnce(
      tfb.groupBy("v", "w").agg(sum("c_doc").as("c_vw")))
    val ctx = bc.groupBy("v").agg(sum("c_vw").as("c_v"), count(lit(1)).as("n1p_v"))
    val cont = bc.groupBy("w").agg(count(lit(1)).as("n1p_w"))
    val bt = bc.agg(count(lit(1)).as("b"))
    // num/den of the KN probability; the micronat floor is taken through
    // Guards.lnMicronatFloor, which also certifies the floor's
    // cross-engine stability in-plan (refuses on boundary-adjacent
    // values — the one residual float channel r12 left open)
    val num = col("b") * (lit(4L) * col("c_vw") - 3L) +
      lit(3L) * col("n1p_v") * col("n1p_w")
    val den = lit(4L) * col("b") * col("c_v")
    tfb
      .join(bc, Seq("v", "w"))
      .join(ctx, Seq("v"))
      .join(cont, Seq("w"))
      .crossJoin(broadcast(bt))
      .withColumn("nll_micro",
        Guards(
          col("c_v") <= expr(s"${Long.MaxValue / 8L}L div b"),
          Guards.lnMicronatFloor(num, den, "knbigram") * col("c_doc"),
          Guards.msg("knbigram",
            lit("context count c(v)="), col("c_v").cast("string"),
            lit(" with "), col("b").cast("string"),
            lit(" bigram types leaves the 8*B*c(v) <= 2^63-1 domain - "),
            lit("shard the corpus or coarsen tokenization"))))
      .groupBy("doc_id")
      .agg(sum("c_doc").as("n_bigrams"), sum("nll_micro").as("sum_micronats"))
      .withColumn("xent_micronats", expr("sum_micronats div n_bigrams"))
  }
}
