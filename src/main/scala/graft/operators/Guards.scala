package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, concat, floor, lit, log, raise_error, rint, when}

/** The repo-wide in-plan refuse-loudly guard: `when(ok, pass)
  * .otherwise(raise_error(msg))` riding a CONSUMED output column.
  *
  * Why one helper: every integer operator in this engine carries a
  * proven 2^63 domain, and the contract is that leaving the domain is a
  * LOUD error, never a silent wrap (non-ANSI long arithmetic wraps).
  * Hand-rolling the idiom per operator let one site ship with a bound
  * that was wrong by 10^6 (HITS, round 11) — so the idiom lives here
  * and call sites only state their bound.
  *
  * Usage rules (the hard-won ones):
  *  - the guard MUST replace a column the query CONSUMES — a standalone
  *    guard column gets pruned by the optimizer and never evaluates;
  *  - `ok` must be evaluable without overflowing: guard a product by
  *    comparing one factor against `Long.MaxValue div` the other, never
  *    by computing the product first;
  *  - messages start with the bracketed operator tag and name the
  *    offending value, so a 1000-executor failure is attributable from
  *    the task error alone.
  */
object Guards {
  /** `pass` when `ok`, else raise `msg` (already-tagged Column message).
    * The raise_error branch is cast to `castTo` so both branches type. */
  def apply(ok: Column, pass: Column, msg: Column, castTo: String = "long"): Column =
    when(ok, pass).otherwise(raise_error(msg).cast(castTo))

  /** String-message variant: `Guards(ok, pass, "[op] out of domain")`. */
  def apply(ok: Column, pass: Column, msg: String): Column =
    apply(ok, pass, lit(msg))

  /** Uniform message builder: `[op] ` + parts (columns are rendered by
    * concat; interleave lits and value columns to name the offender). */
  def msg(op: String, parts: Column*): Column =
    concat((lit(s"[$op] ") +: parts): _*)

  /** `floor(−ln(num/den)·10⁶)` onto the integer micronat grid, with the
    * floor CERTIFIED cross-engine in-plan — the repo-wide idiom for the
    * one float step the cross-entropy queries take (q120/q243).
    *
    * Why a guard at all: `num` and `den` are exact int64, and every step
    * but `ln` is bit-identical across engines (int64→double casts and
    * the division are correctly rounded by IEEE-754, so both engines see
    * the same ratio; ×10⁶ and floor are again correctly rounded /
    * exact). `ln` is NOT correctly rounded: Java's `Math.log` is specced
    * to 1 ulp and DuckDB's libm log measures ≤ 1 ulp, so the two
    * engines' scaled values s = fl(−ln(r)·10⁶) can differ by up to
    * ~6 ulp(s) (2 ulp of ln(r) magnified through the exact ×10⁶ plus
    * the two multiplications' own roundings). When s sits further than
    * that from every integer, both floors land on the same grid cell
    * and the hash check is safe by construction; when s sits WITHIN the
    * bound of a boundary, the floors can silently diverge — negligible
    * odds per value, an expected event at 10⁹ distinct types. So the
    * boundary case refuses loudly instead: `|s − rint(s)| ≥
    * |s|·4e-15 + 1e-12` (≈ 3× the proven 6-ulp skew; the absolute term
    * covers s near 0 where the relative bound vanishes). `num = den` is
    * whitelisted — every IEEE libm returns ln(1) = 0 exactly, so s = 0
    * is boundary-EXACT, not boundary-adjacent.
    *
    * Measured margins on the real corpora (graft.tools.FloatMargin):
    * the minimum observed boundary distance across the q120 unigram and
    * q243 bigram grids is 4.5e-4 at sf0.01 and 8.9e-4 at sf0.1 — ≥
    * 3.1e4× the refusal threshold at the value's magnitude — so the
    * guard is pure insurance at test scale and an honest certificate at
    * corpus scale.
    *
    * The returned column is the guarded floor (LongType); like every
    * Guards use it must ride a CONSUMED output column. */
  def lnMicronatFloor(num: Column, den: Column, op: String): Column =
    lnMicronatFloor(num, den, op, relEps = 4e-15, absEps = 1e-12)

  /** Eps-injectable variant (package-private): the spec widens the
    * thresholds to force the refusal on ordinary values — constructing
    * a genuine sub-4e-15 boundary case would need a 10¹⁴-point search. */
  private[graft] def lnMicronatFloor(num: Column, den: Column, op: String,
      relEps: Double, absEps: Double): Column = {
    val sm = -log(num.cast("double") / den.cast("double")) * lit(1e6)
    apply(
      num === den || abs(sm - rint(sm)) >= abs(sm) * lit(relEps) + lit(absEps),
      floor(sm),
      msg(op,
        lit("-ln("), num.cast("string"), lit("/"), den.cast("string"),
        lit(")*10^6 = "), sm.cast("string"),
        lit(" sits within the cross-engine ulp bound of its floor "),
        lit("boundary - a 1-ulp libm ln skew could flip the floor; "),
        lit("coarsen the micronat grid or rescale")))
  }
}
