package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, lit, raise_error, when}

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
}
