package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style hashed n-gram importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" —
  * public method): estimate how target-domain-like each document is
  * with two hashed-bigram bag-of-ngrams LMs (one over the target
  * slice, one over the raw corpus) and sample documents with
  * probability ∝ p_target(x)/p_raw(x). The design step the sampling
  * family was missing: B50/B59 draw "uniform/weighted by a given
  * column", B133 decides how MANY per stratum — this decides TOWARD
  * WHAT DISTRIBUTION, completing "curate a pretraining mix toward a
  * high-quality domain" end to end.
  *
  * Integer posture: the importance weight is carried in LOG space on
  * the micronat grid. Per hash bucket b (add-one smoothing over K
  * buckets),
  *
  *   Δ(b) = floor(−ln((c_raw(b)+1)/(N_raw+K))·10⁶)
  *        − floor(−ln((c_tgt(b)+1)/(N_tgt+K))·10⁶)  ≈ ln(p_T/p_R)·10⁶
  *
  * — each floor through [[Guards.lnMicronatFloor]] (cross-engine
  * boundary certified), and the difference-of-floors form keeps every
  * operand a bare count: no (c+1)·(N+K) cross products, so nothing to
  * overflow even at 10¹³ tokens. A document's log weight is then
  * lw = Σ_b c_doc(b)·Δ(b), exact integer micronats, with the per-term
  * product division-guarded (the sum is ANSI-loud).
  *
  * The draw reuses the B59 exponential-race order in LOG space:
  * key = ln(−ln u) − lw/10⁶ with u the hash60 uniform ranks IDENTICALLY
  * to the raw esKey with w = exp(lw/10⁶) (ln is monotone) but never
  * evaluates the exp — a +50-nat document would overflow a double
  * weight. The ORDERING surface is the QUANTIZED key (the
  * [[Sampling.esKeyMicro]] posture, adopted in r14 when FloatMargin
  * showed the raw adjacent-key gap losing ~3 orders of magnitude per
  * 10× of data — 5.2e-5 at sf0.01 → 4.0e-8 at sf0.1 → 1.8e-9 at 10× →
  * 1.1e-10 at 30× (FLOATMARGIN_r14.jsonl), a ~1/n² trend crossing
  * ln-wobble near 10⁹ docs): rank by (floor(key·10⁶), −h, doc_id),
  * so near-ties collapse into one micro-cell and break on the hash
  * deterministically on BOTH engines; the residual per-key cell-flip
  * probability ~|kq|·1e-15 is membership-relevant only at the k-th cut
  * (~1e-7 per query at k=25). tools.FloatMargin measures THIS
  * operator's channels directly — the LM grid boundary distances
  * (≥ 3.2e4× the lnMicronatFloor refusal threshold) and the race-key
  * cell-boundary distances per scale point.
  *
  * Scale shape: corpus-scale work is ONE (doc, bucket) partial-agg'd
  * count; both LMs are ≤ `buckets`-row aggregates of it joined back as
  * a BROADCAST; the draw is the native graft_bottom_k single-group
  * aggregate (≤ k pairs leave each map task). No all-pairs, no windows,
  * no driver state.
  */
object Dsir {

  /** Per-document log importance weight in integer micronats:
    * (doc_id, lw_micro), one row per document with ≥ 1 bigram.
    * `isTarget` marks the target-domain slice (evaluated per doc row). */
  def logImportanceMicronats(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int, seed: String): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"Dsir wants buckets in [2, 2^20], got $buckets")
    val toks = graft.functions.GraftFunctions.tokens(lower(col(textCol)))
    val big = docs.select(col(idCol).as("doc_id"), isTarget.as("tgt"),
        explode(KneserNey.bigramsFromTokens(toks)).as("bg"))
      .select(col("doc_id"), col("tgt"),
        (graft.functions.GraftFunctions.hash60(seed,
          concat(col("bg.v"), lit(" "), col("bg.w"))) % buckets.toLong).as("b"))
    // the one corpus-scale shuffle; both LMs aggregate off it
    val db = graft.Q.persistOnce(
      big.groupBy("doc_id", "tgt", "b").agg(count(lit(1)).as("c_doc")))
    val raw = db.groupBy("b").agg(sum("c_doc").as("c_r"))
    val tgt = db.filter(col("tgt")).groupBy("b").agg(sum("c_doc").as("c_t"))
    val nr = raw.agg(sum("c_r").as("n_r"))
    val nt = tgt.agg(coalesce(sum("c_t"), lit(0L)).as("n_t"))
    val model = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("b"),
        (Guards.lnMicronatFloor(
            col("c_r") + 1L, col("n_r") + buckets.toLong, "dsir") -
          Guards.lnMicronatFloor(
            coalesce(col("c_t"), lit(0L)) + 1L, col("n_t") + buckets.toLong, "dsir"))
          .as("dlt"))
    db.join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(sum(
        Guards(
          col("c_doc") <= expr(s"${Long.MaxValue}L div greatest(abs(dlt), 1L)"),
          col("c_doc") * col("dlt"),
          Guards.msg("dsir",
            lit("bucket term c_doc*delta = "), col("c_doc").cast("string"),
            lit("*"), col("dlt").cast("string"),
            lit(" would overflow int64 - shard the document or coarsen "),
            lit("the bucket grid")))).as("lw_micro"))
  }

  /** Importance-resampled top-k: (doc_id, lw_micro, rk), rk in 1..k by
    * the QUANTIZED exponential-race order — floor(ky·10⁶) cells with the
    * hash-desc in-cell tie-break, the [[Sampling.esKeyMicro]] posture
    * (for equal-lw cellmates h desc equals the exact raw-key order:
    * ln(−ln u) is decreasing in h for fixed lw), falling through to the
    * smaller doc_id on exact (cell, hash) ties.
    * `ngramSeed` salts the bucket hash, `drawSeed` the race uniforms. */
  def resample(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int, k: Int,
      ngramSeed: String, drawSeed: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(docs.sparkSession)
    val lw = logImportanceMicronats(docs, idCol, textCol, isTarget, buckets, ngramSeed)
    // the B59 (h+1)-then-cast uniform; /2^60 is exact (exponent shift)
    val h = graft.functions.GraftFunctions.hash60(drawSeed, col("doc_id"))
    val u = (h + lit(1L)).cast("double") / lit((1L << 60).toDouble)
    val ky = log(-log(u)) - col("lw_micro").cast("double") / lit(1e6)
    lw.agg(call_function("graft_bottom_k",
        struct(floor(ky * lit(1e6)).as("kq"), (-h).as("tb")),
        struct(col("doc_id").as("doc_id"), col("lw_micro").as("lw_micro")),
        lit(k)).as("__bk"))
      .select(posexplode(col("__bk")).as(Seq("__pos", "__kv")))
      .select(col("__kv.v.doc_id").as("doc_id"),
        col("__kv.v.lw_micro").as("lw_micro"),
        (col("__pos") + 1).cast("int").as("rk"))
  }
}
