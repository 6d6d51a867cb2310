package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting. All pure
  * Column expressions (codegen'd, no UDFs) so they run inside
  * whole-stage codegen over 100 TB without serialization walls.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count, excluding empty tokens. A bare size()
    * over [[tokens]] miscounts two ways: split('', '\s+') yields ['']
    * (an empty doc scores one token, so an empty-doc filter never
    * fires), and because `trim` strips only SPACES, text led/trailed
    * by tabs or newlines splits with an empty first/last element.
    * Since '\s+' collapses runs, empties can ONLY appear at the two
    * ends — so the exclusion is two codegen'd end checks rather than a
    * per-row interpreted array filter (ArrayFilter is CodegenFallback;
    * measured 3× on the packing query). Null text stays null. The
    * DuckDB mirror `len(list_filter(toks, x -> x <> ''))` is
    * value-identical because interior empties cannot exist. (The raw
    * [[tokens]] array keeps the engine-shared convention — the
    * shingle/dedup stack and its oracles mirror it consistently; only
    * the COUNT surfaces as a statistic.) */
  def tokenCount(text: Column): Column = {
    val t = tokens(text)
    (size(t)
      - when(element_at(t, 1) === "", 1).otherwise(0)
      - when(size(t) > 1 && element_at(t, size(t)) === "", 1).otherwise(0))
  }

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric marks — a cheap proxy for subword token pressure. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeishPattern))

  /** Stopword sets for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny: the operator's shape (per-language token-hit
    * scoring + deterministic argmax) is the point. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un", "en"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "que"))

  /** Hits of one language's stopword set in the token stream
    * (occurrence count, not distinct). Native codegen'd membership
    * counter — the `size(filter(...))` tree it replaces is
    * CodegenFallback, and langId evaluates one per language per row
    * (parity pinned in TextAnalysisSpec). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    TokenSet.tokenSetHits(tokens(text), words)

  /** The expression-tree formulation of [[stopwordHits]] — parity
    * reference. */
  def stopwordHitsFold(text: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t)))
  }

  /** Language ID: argmax of stopword hits with a fixed preference order
    * on ties (en > es > de > fr), 'und' (undetermined) when no hits. */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(best > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: length saturation, alphabetic density, and
    * stopword (English) density — the classic cheap pre-filters.
    * Quantized to 4 decimals with floor(x·10⁴+0.5)/10⁴ rather than
    * round(): decimal rounding of a double at an exact .xxxx5 boundary
    * is engine-dependent (observed Spark 0.4237 vs DuckDB 0.4238 on the
    * same bit-identical double), while floor on the same double is not. */
  def qualityScore(text: Column): Column = {
    val nToks = tokenCount(text).cast("double")
    val nAlpha = regexp_count(text, lit("[A-Za-z]")).cast("double")
    val nChars = length(text).cast("double")
    val lengthSat = least(lit(1.0), nToks / 100.0)
    val alphaRatio = when(nChars > 0, nAlpha / nChars).otherwise(0.0)
    val stopRatio = when(nToks > 0,
      stopwordHits(text, stopwords.head._2).cast("double") / nToks).otherwise(0.0)
    val raw = lengthSat * 0.5 + alphaRatio * 0.3 +
      least(lit(1.0), stopRatio * 4.0) * 0.2
    floor(raw * 10000.0 + 0.5) / 10000.0
  }

  /** Canonical document fingerprint: md5 of the whitespace-collapsed,
    * lowercased text — exact-dedup key that survives trivial
    * reformatting. */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Within-document repetition: fraction of n-gram occurrences that are
    * duplicates of an earlier occurrence — the boilerplate/looped-text
    * signal of quality-filter stacks. 0 for docs shorter than one
    * shingle window (nothing can repeat). Quantized like qualityScore. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = graft.operators.Dedup.wordShingles(text, n)
    val total = size(sh).cast("double")
    val distinctN = size(array_distinct(sh)).cast("double")
    floor(when(total > 1.0, (total - distinctN) / total).otherwise(0.0)
      * 10000.0 + 0.5) / 10000.0
  }

  /** Flesch-style reading-ease score (Flesch 1948, public domain
    * formula): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words), with vowel RUNS as the engine-portable syllable proxy
    * (true syllabification needs a dictionary; vowel-group counting is
    * the standard cheap stand-in and is pure regex in both engines).
    * Sentences floor at 1 so punctuation-free text scores rather than
    * divides by zero. Quantized 1e-4 per the determinism doctrine. */
  def fleschScore(text: Column): Column = {
    val nW = tokenCount(text).cast("double")
    val nS = greatest(lit(1.0), regexp_count(text, lit("[.!?]")).cast("double"))
    val nV = regexp_count(lower(text), lit("[aeiouy]+")).cast("double")
    floor(when(nW > 0,
      lit(206.835) - lit(1.015) * (nW / nS) - lit(84.6) * (nV / nW))
      .otherwise(0.0) * 10000.0 + 0.5) / 10000.0
  }

  /** Cheap PII surface counts (emails, long digit runs) — the flags a
    * curation pipeline uses to route documents to redaction. Counting,
    * not extraction: the values never leave the row. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longDigitPattern = "[0-9]{7,}"
  def piiEmailCount(text: Column): Column =
    regexp_count(text, lit(emailPattern))
  def piiLongDigitCount(text: Column): Column =
    regexp_count(text, lit(longDigitPattern))

  // ---- charset quarantine (encoding-damage triage) --------------------
  // Mojibake and binary spill show up as three integer surface signals:
  // raw control bytes (anything below 0x20 except tab/newline/CR —
  // plain text never contains them), U+FFFD replacement characters (a
  // decoder already gave up), and the non-ASCII-printable mass (high
  // ratios flag binary spill or wrong-charset decodes; legitimate
  // non-Latin text trips this one ONLY, which is why the gate keeps the
  // signals separate instead of folding them into one score). All three
  // are pure regexp counts — codegen'd, engine-portable, no UDF.

  /** Control characters other than tab/newline/CR. */
  def ctrlCharCount(text: Column): Column =
    regexp_count(text, lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))

  /** U+FFFD replacement characters (upstream decode failures). */
  def replacementCharCount(text: Column): Column =
    regexp_count(text, lit("�"))

  /** Characters outside tab/newline/CR/printable-ASCII. */
  def nonAsciiCount(text: Column): Column =
    regexp_count(text, lit("[^\\x09\\x0A\\x0D\\x20-\\x7E]"))

  /** The quarantine verdict (1 = route to the damage queue): any raw
    * control byte, any replacement char, or non-ASCII mass above 1/5
    * of the text — the ratio tested by integer cross-multiplication so
    * the verdict is exact and engine-portable. */
  def charsetQuarantine(text: Column): Column =
    (ctrlCharCount(text) > 0 || replacementCharCount(text) > 0 ||
      nonAsciiCount(text) * lit(5) > length(text)).cast("int")
}
