package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the graft operators.
  *
  * Everything here is a composition of Catalyst built-ins (codegen-friendly,
  * no interpretation overhead in the hot path); the single UDF is a
  * deliberately-provided twin of [[safeName]] to cover the UDF surface
  * (SURVEY.md B39) and is not used by any query.
  */
object GraftFunctions {

  /** Key normalization from the reference ingester (`fetch_data.py:36-40`):
    * lowercase, trim, drop chars outside `[\w\s-]`, collapse whitespace runs
    * to `_`. Used there to derive per-commodity partition file names; here a
    * pure-column expression so it stays inside whole-stage codegen.
    * Whitespace stripping is regex-based (`^\s+|\s+$`) — Python's strip()
    * removes tabs/newlines too, which Spark's space-only trim() would miss.
    * The `(?U)` flag makes Java's `\w`/`\s` Unicode-aware to match Python's
    * re semantics: a non-ASCII word character (e.g. an accented commodity
    * name) is KEPT by the reference's safe_name, so it must be kept here
    * too or partition keys diverge.
    */
  def safeName(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(lower(c), "(?U)^\\s+|\\s+$", ""),
        "(?U)[^\\w\\s-]", ""),
      "(?U)\\s+", "_")

  /** UDF twin of [[safeName]] (B39). Prefer the column version in real
    * plans — a Scala UDF is an opaque black box to Catalyst.
    */
  val safeNameUdf: UserDefinedFunction = udf { (s: String) =>
    if (s == null) null
    else s.toLowerCase
      .replaceAll("(?U)^\\s+|\\s+$", "")
      .replaceAll("(?U)[^\\w\\s-]", "")
      .replaceAll("(?U)\\s+", "_")
  }

  /** Portable 60-bit hash: `conv(substr(md5(x),1,15),16,10)` — bit-identical
    * to DuckDB's `('0x' || substr(md5(x),1,15))::BIGINT`, which lets
    * hash-based operators (minhash, simhash, LSH) be verified exactly
    * against a SQL oracle. 15 hex chars = 60 bits, always fits a signed
    * 64-bit long. md5 is uniformly mixing; speed is not the concern at
    * verification scale, and the operators are parameterized on the hash
    * column so a cheaper `xxhash64` can be swapped in for production runs.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: distinct hash families per seed string. */
  def hash60(seed: String, c: Column): Column =
    hash60(concat(lit(seed + ":"), c.cast("string")))

  /** JVM-side twin of [[hash60]] for the driver-local operator tiers:
    * the first 60 bits of md5(utf8(s)) as a non-negative long —
    * bit-identical to `conv(substring(md5(s),1,15),16,10)` (the first 15
    * hex chars are bytes 0..6 plus the high nibble of byte 7), pinned
    * against the Column form in LocalTierSpec. Allocation-free past the
    * digest itself, so a driver tier can evaluate millions per second. */
  def hash60Local(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Whitespace tokenizer matching `\s+` split with empty tokens dropped —
    * the shared definition used by every text operator and its oracle
    * (`list_filter(string_split_regex(trim(x),'\s+'), t -> t <> '')`).
    */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > lit(0))

  /** Widen a float array to double (float→double is exact, so results stay
    * comparable across engines). */
  def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential-fold dot product over two double arrays via higher-order
    * functions — stays in codegen, no UDF. Deterministic order (left fold),
    * so results are reproducible run-to-run.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Compiled dot product — the hot-path twin of [[dot]]. The higher-order
    * expression allocates an intermediate array per invocation, which
    * dominates all-pairs workloads (measured 14s -> ~1s on 2M pairs); this
    * while-loop UDF does the identical left-to-right fold, so results are
    * bit-equal to [[dot]] and to the oracle's sequential sum.
    */
  val dotUdf: UserDefinedFunction = udf { (a: Array[Double], b: Array[Double]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine given precomputed norms (the scalable form: norms are computed
    * once per vector and reused across all pair comparisons). */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
