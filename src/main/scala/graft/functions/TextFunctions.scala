package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  * All are pure `org.apache.spark.sql.functions` compositions — fully
  * codegen'd, no UDFs, so they stay inside WholeStageCodegen on a 100 TB scan.
  */
object TextFunctions {

  /** Whitespace token count without materializing the token array. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish token estimate: count of word pieces + digits + punctuation
    * runs, the pre-tokenization regex family used by GPT-2-style BPE. */
  def bpeTokenCount(text: Column): Column =
    when(length(text) === 0, 0L)
      .otherwise(size(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])")).cast("long"))

  /** Character-level stats bundle used by quality scoring. */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(length(text) === 0, 0.0).otherwise(punct.cast("double") / length(text))
  }

  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise((length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") / length(text))

  /** Fraction of tokens that are in `stopwords` (lower-cased exact match). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(array_intersect_count(toks, stops)).cast("double") / size(toks))
  }

  // array filter keeping duplicates (array_intersect dedups — ratio needs counts)
  private def array_intersect_count(toks: Column, stops: Column): Column =
    filter(toks, t => array_contains(stops, t))

  /** Heuristic quality score in [0,1]: rewards mid-length documents, plain
    * words; penalizes punctuation soup and screaming. Deterministic; the
    * formula is also expressible in ANSI SQL for the oracle. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val sw = stopwordRatio(text, stopwords)
    val punct = punctRatio(text)
    val upper = upperRatio(text)
    greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.4 + sw * 0.3 + (lit(1.0) - punct) * 0.2 + (lit(1.0) - upper) * 0.1))
  }

  /** Canonical document fingerprint: sha256 of case/whitespace-normalized
    * text — the exact-dedup key that survives trivial reformatting. */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** Language marker words per language for the n-gram/stopword langid
    * heuristic (tiny, deterministic; real pipelines plug fasttext here). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Marker-word hit count for one language over whitespace tokens. */
  def langHits(text: Column, markers: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    size(filter(toks, t => t.isin(markers: _*)))
  }

  /** Predicted language = argmax of marker hits, 'und' when all zero.
    * Deterministic tie-break by language code order. */
  def langId(text: Column): Column = {
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (code, ms) =>
      struct(langHits(text, ms).as("hits"), lit(code).as("code"))
    }
    val best = greatest(scored: _*) // struct compare: hits first, then code
    when(best.getField("hits") === 0, "und").otherwise(best.getField("code"))
  }
}
