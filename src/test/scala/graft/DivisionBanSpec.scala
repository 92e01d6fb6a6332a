package graft

import org.scalatest.funsuite.AnyFunSuite

/** The permanent gate for the round-12 lesson: Spark's `Column./` on two
  * integral operands is DOUBLE division (Catalyst's Divide casts both
  * sides to double), exact only below 2^53 — `(mkey / 2^20).cast(long)`
  * in Winnowing silently diverged from the oracle's floor division for
  * top-octave hashes, and two fresh guard bounds shipped with the same
  * hole before a hand grep caught the class. Integer semantics must use
  * `expr("a div b")` (IntegralDivide).
  *
  * This spec greps `src/main` for the division patterns that caught all
  * three r12 instances and fails — with the Winnowing story — on any
  * match that neither states float intent on the line (a double cast, a
  * float literal, scientific/float-suffix notation, or an explicit
  * `// float-ok` tag with its proof) nor sits on the committed
  * allowlist of audited sites (plain Scala integer arithmetic on driver
  * longs, intended-double statistics). New float-intent sites must be
  * marked or allowlisted HERE, consciously.
  */
class DivisionBanSpec extends AnyFunSuite {

  /** Candidate patterns (the r12 grep) — a `/` applied to a column-ish
    * operand. `) // (` in DuckDB oracle strings does not match: the
    * char after the slash is another slash, not a space. */
  private val candidate =
    java.util.regex.Pattern.compile("""\) / |/ col\(|/ greatest|/ lit\(""")

  /** Float-intent markers: any of these on the line means double
    * division is what the author meant. */
  private val floatIntent = Seq(
    java.util.regex.Pattern.compile("(?i)double"),
    java.util.regex.Pattern.compile("""[0-9]\.[0-9]"""), // 2.0, 0.75
    java.util.regex.Pattern.compile("""[0-9][eE][0-9-]"""), // 1e9, 1e-12
    java.util.regex.Pattern.compile("""[0-9][fF]\b"""), // 500f
    java.util.regex.Pattern.compile("""// float-ok"""))

  /** Audited sites with no float marker on the line: file basename ->
    * substrings proven either plain Scala integer arithmetic (driver
    * longs — Scala `/` on Long IS integer division, the ban is about
    * Column./) or intended-double statistics. */
  private val allowlist: Map[String, Seq[String]] = Map(
    "Compact.scala" -> Seq(
      "(totalBytes + targetFileBytes - 1) / targetFileBytes"), // Scala Long ceil-div
    "PageRank.scala" -> Seq(
      "dampDen) / n", "dampDen) / outdeg(s)",
      "dampDen) / k"), // Scala Long driver loop (incl. the seeded base)
    "AmsSketch.scala" -> Seq("(g + 1) / 2"), // Scala Int median index
    "PagedSource.scala" -> Seq(
      "- 1) / numPartitions", "- 1) / pageSize"), // Scala Long ceil-div
    "Bootstrap.scala" -> Seq(
      "+ 999999L) / 1000000L"), // Scala Long ceil-div (percentile index)
    "PrefixSpan.scala" -> Seq(
      "+ 99L) / 100L"), // Scala Long ceil-div (driver-tier minsup)
    "Apriori.scala" -> Seq(
      "+ 99L) / 100L"), // Scala Long ceil-div (driver-tier minsup)
    "GraftFunctions.scala" -> Seq(
      "dot(a, b) / (l2norm(a) * l2norm(b))"), // cosine: double by meaning
    "EvalMetrics.scala" -> Seq(
      "ceil((logSum - 60) /"), // logSum is a log2 double column
    "TDigest.scala" -> Seq(
      "(curMean * curW + m * w) / projected"), // Scala Double centroid merge
    "CoreQueries.scala" -> Seq(
      "dsum(col(\"l_quantity\")) / count(lit(1))", // decimal-sum mean, double by design
      "/ (sqrt("), // corr denominator, double by design (Spark + oracle twin)
    "VectorQueries.scala" -> Seq(
      "SUM(v) / COUNT(*)")) // oracle SQL mean over a DOUBLE column

  /** True when the line needs a fix / marker / allowlist entry. */
  private[graft] def violates(fileName: String, line: String): Boolean = {
    val t = line.trim
    if (t.startsWith("//") || t.startsWith("*")) return false
    if (!candidate.matcher(line).find()) return false
    if (floatIntent.exists(_.matcher(line).find())) return false
    !allowlist.getOrElse(fileName, Nil).exists(line.contains)
  }

  test("src/main has no integral Column./ outside the audited float allowlist") {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val bad = for {
      f <- walk(new java.io.File("src/main/scala"))
      (line, i) <- scala.io.Source.fromFile(f, "UTF-8").getLines().zipWithIndex.toSeq
      if violates(f.getName, line)
    } yield s"${f.getPath}:${i + 1}: $line"
    assert(bad.isEmpty,
      "Column./ on integral operands is DOUBLE division (exact only " +
        "below 2^53 — it silently diverged from the oracle's floor " +
        "division in r12's Winnowing fp_hash). Use expr(\"a div b\"), " +
        "or mark genuine float intent with `// float-ok: <proof>` / " +
        "add an audited allowlist entry in DivisionBanSpec:\n" +
        bad.mkString("\n"))
  }

  test("the classifier flags an injected violation (the gate is live, not vacuous)") {
    assert(violates("Fake.scala", """    val h = (mkey / lit(1L << 20)).cast("long")"""))
    assert(violates("Fake.scala", """    col("n_h") <= lit(Long.MaxValue) / col("mx")"""))
    // markers and comments pass
    assert(!violates("Fake.scala", """    val r = a.cast("double") / lit(3)"""))
    assert(!violates("Fake.scala", """    // (mkey / lit(1L << 20)) in a comment"""))
    assert(!violates("Fake.scala", """    val x = (c - posMod) / w // float-ok: exact multiple"""))
  }
}
