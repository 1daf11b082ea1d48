package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * `Column` expressions (whole-stage codegen, no UDFs), so they run inside
  * the parquet scan's projection at 100 TB without a shuffle.
  */
object TextOps {

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: alpha runs count ~1 token per 4 chars
    * (ceil), digits and punctuation one each — a cheap, deterministic
    * proxy for byte-pair-encoded token counts.
    */
  def bpeishTokenCount(text: Column): Column = {
    val alpha = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))
    val alphaToks = aggregate(alpha, lit(0L), (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))
    val digits = length(regexp_replace(text, "[^0-9]", ""))
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    (alphaToks + digits + punct).cast("long")
  }

  /** Share of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n > 0,
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") / n)
      .otherwise(lit(0.0))
  }

  /** Share of tokens that are stopwords (from `stops`). */
  def stopwordRatio(text: Column, stops: Seq[String]): Column = {
    val toks = tokens(text)
    val stopArr = array(stops.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Heuristic quality score in [0,1]: rewards mid-length documents and
    * stopword presence, penalizes punctuation soup. Deterministic
    * arithmetic over the ratios above (reference-style quality filters for
    * LLM corpus curation). Returned unrounded: every step is an exact IEEE
    * op on identical inputs, so the raw double is bit-stable across
    * engines, whereas double `round` algorithms differ between engines.
    */
  def qualityScore(text: Column, stops: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text, stops) * lit(5.0), lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * lit(4.0))
    lenScore * lit(0.4) + stopScore * lit(0.3) + punctPenalty * lit(0.3)
  }

  /** Marker stopwords per language for the n-gram/marker language-ID
    * heuristic. Public wordlist-style markers only.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "de", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"))

  /** Predicted language: argmax of marker-token counts, ties broken by
    * marker-list order, "und" (undetermined) when no marker matches.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(m, t)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Canonical-form document fingerprint: md5 of the lowercased,
    * whitespace-collapsed text. Stable across engines (md5 is md5), used
    * for exact dedup at any scale (hash-groupBy, no text shuffle).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** 64-bit rolling fingerprint (rotate-xor chain) over the canonical
    * form — cheaper than md5 in tight loops, engine-internal (not
    * cross-engine stable; see [[fingerprint]] for the oracle-stable
    * variant). Bitwise ops only: a Horner `acc*31+c` would trip ANSI
    * overflow checks on any text longer than ~13 chars.
    */
  def rollingFingerprint(text: Column): Column = {
    val canon = regexp_replace(trim(lower(text)), "\\s+", " ")
    val chars = split(canon, "")
    aggregate(chars, lit(5381L), (acc, ch) =>
      shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59))
        .bitwiseXOR(coalesce(ascii(ch).cast("long"), lit(0L))))
  }
}
