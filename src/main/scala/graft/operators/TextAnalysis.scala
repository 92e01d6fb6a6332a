package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface
  * (SURVEY.md B42): tokenization stats, n-gram shingling, marker-based
  * language ID, quality scoring, fingerprinting.
  *
  * Everything is pure column expressions (higher-order array functions) so
  * the operators run inside whole-stage codegen with no UDF/serialization
  * cost — at 100 TB these run in the scan stage, embarrassingly parallel,
  * with no shuffle until the (small) aggregate on top.
  */
object TextAnalysis {

  /** Word n-gram shingles: positions i = 1 .. size-n+1 joined with a
    * single space. Empty array when the document has fewer than n tokens.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Shingles from an ALREADY-PROJECTED tokens column — prefer this from
    * operators (see the evaluation-order note on [[charGramHashes]]:
    * inlining tokens(text) here re-tokenizes per shingle position when the
    * expression runs interpreted). */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    // element_at chain instead of slice(): no per-position sub-array
    // allocation, and the guard keeps sequence() from going negative.
    // `ts` is bound ONCE as a lambda variable (the array-wrap/flatten
    // idiom): a raw Column argument would inline into size() and every
    // element_at, and for the common shinglesFromTokens(tokens(text), n)
    // call shape that re-evaluates the regex split O(n·|tokens|) times
    // per row — measured 10 s for a 260k-shingle corpus where the bound
    // form takes well under 1 s. Same values, same null/short-doc
    // semantics (null ts still lands in the otherwise branch).
    flatten(transform(array(ts), arr =>
      when(size(arr) >= n,
        transform(
          sequence(lit(1), size(arr) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(arr, i + lit(o))): _*)))
        .otherwise(array().cast("array<string>"))))

  /** Language marker lexicons (tiny stopword lists). Order of `langs` is
    * the deterministic argmax tie-break (first wins).
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "de", "y", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Count of tokens contained in `words` (with multiplicity). */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Marker-argmax language prediction with first-wins tie-break in
    * [[markers]] order. */
  def predictLang(scores: Map[String, Column]): Column = {
    val langs = markers.map(_._1)
    // fold from the end: the last language is the fallback, each earlier
    // language wins when its score is >= all later ones (first-wins ties)
    langs.init.reverse.foldLeft(lit(langs.last)) { (els, l) =>
      val laterLangs = langs.drop(langs.indexOf(l) + 1)
      when(laterLangs.map(o => scores(l) >= scores(o)).reduce(_ && _), lit(l)).otherwise(els)
    }
  }

  /** Punctuation character count (portable class, same regex both engines). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Rolling-hash winnowing fingerprints (Schleimer et al., SIGMOD'03):
    * hash every k-char gram, take the min of each sliding window of w
    * hashes, distinct the mins. Returns the fingerprint array (exact
    * integers — portable via [[hash60]]).
    *
    * IMPORTANT evaluation-order note: interpreted expression trees have no
    * common-subexpression elimination, so referencing a derived array
    * column inside a per-element lambda re-computes the whole subtree per
    * element (measured O(grams^2) md5 calls when the hash array was
    * inlined). Hence the two-step API: project [[charGramHashes]] into a
    * real column first, then apply [[winnowMins]] to that bound column.
    */
  def charGramHashes(textCol: String, k: Int): Column =
    expr(
      s"transform(sequence(1, greatest(char_length($textCol) - ${k - 1}, 1)), " +
        s"i -> cast(conv(substr(md5(substr($textCol, i, $k)), 1, 15), 16, 10) AS BIGINT))")

  /** Distinct window-mins over an already-projected hash-array column. */
  def winnowMins(hashes: Column, w: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
        j => array_min(slice(hashes, j, lit(w)))))

  /** PII scrub patterns — deliberately ASCII/RE2-safe subsets (no
    * lookarounds, no \\b) so Java (Spark) and RE2 (DuckDB) agree
    * byte-for-byte, which is what lets the redacted text itself be
    * hash-verified cross-engine. Production would extend the pattern set;
    * the operator shape (pure codegen-resident regexp_replace chain in
    * the scan stage, no shuffle) is the part that matters at 100 TB.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"
  val Ipv4Pattern = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  /** Count of PII matches in a text column (emails + phones + IPv4). */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)) +
      regexp_count(text, lit(PhonePattern)) +
      regexp_count(text, lit(Ipv4Pattern))

  /** Redact PII in place: emails -> [EMAIL], phones -> [PHONE],
    * IPv4 -> [IP]. Order matters (emails first: a phone-like digit run
    * inside an email local part must not be half-redacted). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      Ipv4Pattern, "[IP]")
}
