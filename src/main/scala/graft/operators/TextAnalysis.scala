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
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    // element_at chain instead of slice(): no per-position sub-array
    // allocation, and the guard keeps sequence() from going negative
    when(size(ts) >= n,
      transform(
        sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(ts, i + lit(o))): _*)))
      .otherwise(array().cast("array<string>"))
  }

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
    */
  def winnowFingerprints(textCol: String, k: Int, w: Int): Column = {
    val grams = expr(
      s"transform(sequence(1, greatest(char_length($textCol) - ${k - 1}, 1)), " +
        s"i -> conv(substr(md5(substr($textCol, i, $k)), 1, 15), 16, 10))")
    val hashes = transform(grams, g => g.cast("long"))
    val mins = transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      j => array_min(slice(hashes, j, lit(w))))
    array_distinct(mins)
  }
}
