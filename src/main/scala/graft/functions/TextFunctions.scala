package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  * All are pure `org.apache.spark.sql.functions` compositions — fully
  * codegen'd, no UDFs, so they stay inside WholeStageCodegen on a 100 TB scan.
  */
object TextFunctions {

  /** Evaluate `v` ONCE and bind it as a lambda variable for `body`.
    *
    * Column expressions are trees: a Scala `val` referenced N times inlines
    * the whole subtree N times, and interpreted higher-order-function
    * evaluation performs no common-subexpression elimination — in
    * particular NOT inside lambda bodies, where each element's evaluation
    * re-computes every captured subtree. A token array referenced per gram
    * inside a `transform` lambda therefore re-ran the full `split` of the
    * document PER GRAM ELEMENT — quadratic in document length (measured:
    * 4× tokens → 14.8× wall on the shingle explode). Wrapping the value in
    * a one-element array and applying the body via `transform` turns every
    * reference into a bound-variable read; `element_at(..., 1)` unwraps.
    * Null propagates identically (the body sees the null value, exactly as
    * it would have evaluated the null subtree). */
  private[graft] def bindOnce(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Whitespace token count without materializing the token array. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish token estimate: count of letter runs + digit runs + punctuation
    * RUNS — the GPT-2 pre-tokenization classes. Counts matches directly
    * (regexp_count) instead of splitting at every non-alphanumeric boundary:
    * the split form counted each whitespace character and each character of
    * a punctuation run as its own token ("hello world" = 3, "wow!!!" = 4),
    * roughly doubling estimates on prose — real BPE binds whitespace to the
    * following word and merges punctuation runs, so length cutoffs
    * calibrated in true BPE tokens filtered the wrong documents.
    * NULL text stays NULL (regexp_count propagates it), matching
    * [[tokenCount]] — a filter must not count a missing document as length
    * 0; empty text counts 0 matches. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+")).cast("long")

  /** Character-level stats bundle used by quality scoring. */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(length(text) === 0, 0.0).otherwise(punct.cast("double") / length(text))
  }

  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise((length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") / length(text))

  /** Fraction of tokens that are in `stopwords` (lower-cased exact match). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    // token array bound once (the ratio references it twice)
    bindOnce(split(lower(trim(text)), "\\s+")) { toks =>
      // empty text guard on the TEXT, not size(toks) === 0 (dead: split of an
      // empty string yields [""], size 1 — same guard shape as tokenCount)
      when(length(trim(text)) === 0, 0.0)
        .otherwise(size(array_intersect_count(toks, stopwords)).cast("double") / size(toks))
    }

  // array filter keeping duplicates (array_intersect dedups — ratio needs
  // counts). `isin`, not array_contains over a literal array: OptimizeIn
  // turns the >10-literal IN into an O(1) InSet hash probe per token where
  // array_contains scans the 30 literals linearly (langHits uses the same
  // form); a non-matching/null token filters out identically either way.
  private def array_intersect_count(toks: Column, stops: Seq[String]): Column =
    filter(toks, t => t.isin(stops: _*))

  /** Heuristic quality score in [0,1]: rewards mid-length documents, plain
    * words; penalizes punctuation soup and screaming. Deterministic; the
    * formula is also expressible in ANSI SQL for the oracle. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val sw = stopwordRatio(text, stopwords)
    val punct = punctRatio(text)
    val upper = upperRatio(text)
    // NULL text stays NULL (the file's convention — tokenCount/langId do the
    // same): least/greatest SKIP nulls, so without the guard the null terms
    // drop out and every missing document would score a perfect 1.0,
    // sailing through any quality-threshold filter
    when(text.isNull, lit(null).cast("double"))
      .otherwise(greatest(lit(0.0), least(lit(1.0),
        lenScore * 0.4 + sw * 0.3 + (lit(1.0) - punct) * 0.2 + (lit(1.0) - upper) * 0.1)))
  }

  /** Gopher-style repetition signal: the fraction of word n-grams that are
    * repeats (`1 - distinct/total`), the published duplicate-n-gram filter
    * for boilerplate/SEO-spam pages. 0 = no repetition; short texts (fewer
    * than n tokens) count as one gram → 0. Pure Column expression —
    * codegen'd, no UDF — and replayable in ANSI SQL for the oracle. */
  def repetitionRatio(text: Column, n: Int): Column =
    // token array AND gram array each bound once ([[bindOnce]]): the naive
    // tree re-split the document per gram (references inside the transform
    // lambda — quadratic in doc length) and re-built the gram stream twice
    // (distinct numerator + denominator)
    bindOnce(split(trim(text), "\\s+")) { toks =>
      val k = size(toks) - (n - 1)
      // raw (NOT distinct) gram stream — the ratio needs repeat counts
      bindOnce(when(k <= 0, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), k - 1),
          i => concat_ws(" ", (0 until n).map(j => toks.getItem(i + j)): _*)))) { grams =>
        lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams)
      }
    }

  /** Canonical document fingerprint: sha256 of case/whitespace-normalized
    * text — the exact-dedup key that survives trivial reformatting. */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** PII redaction for training corpora: emails → `<EMAIL>`, dotted-quad
    * IPs → `<IP>`, phone-like tokens → `<PHONE>`. A pure `regexp_replace`
    * chain — codegen'd, no UDF — using only regex syntax whose semantics are
    * identical in Java regex and RE2, so a standard-SQL oracle replays it
    * byte-for-byte. Order matters: emails first (may contain digits and
    * dots), then IPs (a dotted quad would otherwise half-match the phone
    * shape), then phones. */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    // longest alternatives FIRST: Java regex alternation is leftmost-first,
    // RE2 (the oracle engine) leftmost-longest — ordering by length makes
    // both pick the same match. Covers +intl, (555) 123-4567, 555-123-4567,
    // bare 10-digit, and the short 555-0123 exchange form.
    val phone = "\\+\\d{9,15}" +
      "|\\(\\d{3}\\)[-.\\s]?\\d{3}[-.\\s]?\\d{4}" +
      "|\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" +
      "|\\b\\d{10}\\b" +
      "|\\b\\d{3}[-.]\\d{4}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ip, "<IP>"),
      phone, "<PHONE>")
  }

  /** Within-document line dedup (C4-style preprocessing: boilerplate lines —
    * license headers, nav menus — repeat inside a page): keep each line's
    * FIRST occurrence, preserve order. `array_distinct` is documented to
    * keep first-occurrence order in Spark. */
  def dedupLines(text: Column): Column =
    // the line array is bound once ([[bindOnce]]): the naive tree
    // re-evaluated the full split PER LINE via the array_position reference
    // inside the filter lambda (quadratic string work on top of
    // array_position's inherent scan)
    bindOnce(split(text, "\n")) { lines =>
      // BLANK lines pass through (they are paragraph structure, not
      // boilerplate — array_distinct alone would delete every paragraph break
      // after the first); non-blank lines keep their first occurrence
      // (array_position = 1-based first index)
      array_join(filter(lines, (x, i) =>
        trim(x) === "" || array_position(lines, x) === (i + 1).cast("long")), "\n")
    }

  /** Function-word markers per language for the stopword-profile langid
    * heuristic — the default scorer a real pipeline would swap for a
    * fasttext-style model column. ~28 of each language's most frequent
    * function words (all unaccented, so `lower()` behaves identically in
    * every engine the oracle may run in). Cross-language collisions ("de" in
    * es/pt/nl, "la" in es/fr/it) are expected: the argmax over the full
    * profile resolves them, which is exactly how stopword-profile language
    * identification works. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "on", "are", "with", "as", "at", "by", "this", "have", "from",
      "or", "not", "but", "what", "all", "were", "when", "there", "can",
      "which", "you"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "se", "no",
      "por", "con", "su", "para", "como", "le", "lo", "todo", "pero", "este",
      "los", "las", "del", "al", "sin", "sobre", "entre", "muy"),
    "fr" -> Seq("le", "la", "et", "les", "des", "en", "un", "une", "du",
      "que", "est", "pour", "qui", "dans", "ce", "il", "au", "pas", "sur",
      "ne", "se", "par", "plus", "avec", "son", "mais", "nous", "vous"),
    "de" -> Seq("der", "die", "und", "das", "ist", "in", "den", "von", "zu",
      "mit", "sich", "des", "auf", "dem", "nicht", "ein", "eine", "als",
      "auch", "es", "an", "werden", "aus", "er", "hat", "dass", "sie",
      "nach"),
    "it" -> Seq("il", "la", "di", "che", "e", "in", "un", "una", "per",
      "con", "non", "sono", "del", "le", "si", "da", "come", "lo", "al",
      "dei", "nel", "questo", "ma", "se", "ha", "gli", "anche", "della"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "uma",
      "para", "com", "por", "os", "as", "dos", "se", "na", "no", "mais",
      "como", "mas", "foi", "ele", "das", "tem", "seu", "sua"),
    "nl" -> Seq("de", "het", "een", "en", "van", "in", "is", "dat", "op",
      "te", "zijn", "met", "voor", "niet", "aan", "er", "om", "maar", "dan",
      "ook", "als", "bij", "uit", "nog", "door", "naar", "wordt", "heeft"))

  /** Marker-word hit count for one language over whitespace tokens. */
  def langHits(text: Column, markers: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    size(filter(toks, t => t.isin(markers: _*)))
  }

  /** Predicted language = argmax of marker hits over `markers` (pluggable —
    * pass a custom profile map to widen/replace languages), 'und' when all
    * zero. Deterministic tie-break by language code order.
    *
    * Round 6: all per-language hit counts come from ONE `aggregate` fold
    * over ONE tokenization. The per-language [[langHits]] form re-evaluated
    * `split(lower(trim(text)))` once per language per row — higher-order
    * array functions are CodegenFallback, so no subexpression elimination
    * merges the seven identical tokenizations — and walked the token array
    * seven times. The fold tokenizes once and probes each token against
    * every profile's InSet in a single pass; hit counts (and therefore the
    * argmax and tie-break) are integer-identical to the per-language form,
    * so the oracle gate is unchanged. */
  def langId(text: Column,
      markers: Map[String, Seq[String]] = langMarkers): Column = {
    val profiles = markers.toSeq.sortBy(_._1)
    val toks = split(lower(trim(text)), "\\s+")
    val zero = array(profiles.map(_ => lit(0)): _*)
    // the argmax lives in the fold's FINISH lambda, where the final count
    // array is a bound lambda VARIABLE — referencing it once per language is
    // a read. (A named `counts` Column referenced per language would inline
    // the whole fold expression tree once per language — the same
    // recompute-by-duplication this rewrite removes.)
    val result = aggregate(toks, zero,
      (acc, t) => zip_with(acc, array(profiles.map { case (_, ms) =>
        when(t.isin(ms: _*), 1).otherwise(0)
      }: _*), (a, b) => a + b),
      acc => {
        val scored = profiles.zipWithIndex.map { case ((code, _), i) =>
          struct(element_at(acc, i + 1).as("hits"), lit(code).as("code"))
        }
        // struct compare: hits first, then code. greatest() needs >= 2 args
        // — a single-language profile map (a monolingual filter) is valid
        val best = if (scored.sizeIs == 1) scored.head else greatest(scored: _*)
        when(best.getField("hits") === 0, "und").otherwise(best.getField("code"))
      })
    // NULL text stays NULL (a missing document has no language — the same
    // convention as bpeTokenCount): without the guard every language's hits
    // field is NULL, the struct compare degenerates to the code tie-break,
    // and every null-text row would be labeled with the LAST language code
    when(text.isNull, lit(null).cast("string")).otherwise(result)
  }
}
