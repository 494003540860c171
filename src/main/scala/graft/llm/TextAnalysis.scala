package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. Everything
  * is per-row scalar/array expressions — codegen'd, shuffle-free,
  * embarrassingly parallel at any corpus size.
  */
object TextAnalysis {

  /** function-word marker lists (public-knowledge stopword heads) */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"))

  private def markerArray(lang: String): String =
    markers(lang).map(w => s"'$w'").mkString("array(", ", ", ")")

  def toks: Column = split(col("text"), " ")

  def nTokens: Column = size(toks).cast(LongType)

  /** fraction of tokens that are language-marker function words */
  def stopwordRatio(lang: String = "en"): Column =
    expr(s"size(filter(split(text, ' '), t -> array_contains(${markerArray(lang)}, t)))")
      .cast(DoubleType) / nTokens

  /** n-gram-heuristic language ID: marker-word density thresholded.
    * (On natural text this is the classic stopword profile method;
    * thresholds tuned for the synthetic corpus.)
    */
  def langId(threshold: Double = 0.05): Column =
    when(stopwordRatio("en") >= threshold, lit("en")).otherwise(lit("other"))

  /** punctuation density over characters */
  def punctRatio: Column =
    expr("size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0))").cast(DoubleType) /
      length(col("text"))

  /** type-token ratio (lexical diversity) */
  def typeTokenRatio: Column =
    size(array_distinct(toks)).cast(DoubleType) / nTokens

  def meanWordLen: Column =
    length(regexp_replace(col("text"), " ", "")).cast(DoubleType) / nTokens

  /** composite quality score in [0, ~1]: diversity + marker density +
    * length saturation - punctuation noise (fixed public formula; every
    * term is a deterministic per-row double)
    */
  def qualityScore: Column =
    round(
      typeTokenRatio * lit(0.4) +
        stopwordRatio("en") * lit(0.3) +
        least(nTokens.cast(DoubleType) / lit(100.0), lit(1.0)) * lit(0.3) -
        punctRatio * lit(0.2),
      6)

  /** number of DISTINCT marker words present — the Gopher-style
    * "must contain at least 2 stop words" signal (a cheap gibberish
    * detector: real prose almost surely hits 2+ of the top-10 function
    * words, keyboard mash almost surely hits 0)
    */
  def stopwordHits(lang: String = "en"): Column =
    expr(s"size(array_intersect(array_distinct(split(text, ' ')), ${markerArray(lang)}))")
      .cast(LongType)

  /** Gopher-style symbol-to-word ratio: '#' and '…'-as-'...'
    * occurrences per whitespace word. Counted by replace-and-diff (not
    * regex) so the count is the same non-overlapping left-to-right
    * scan in any engine.
    */
  def symbolRatio: Column = {
    val nHash = length(col("text")) - length(expr("replace(text, '#', '')"))
    val nEll = (length(col("text")) - length(expr("replace(text, '...', '')"))) / lit(3.0)
    (nHash + nEll).cast(DoubleType) / nTokens
  }

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric symbols
    */
  def bpeTokenCount: Column =
    expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))").cast(LongType)

  /** rolling polynomial fingerprint over tokens, mod 1e9+7 (order
    * sensitive — permuted docs get different prints, unlike a bag hash)
    */
  def rollingFingerprint: Column =
    expr("""
      aggregate(
        transform(split(text, ' '), w -> cast(ascii(w) * 31 + length(w) as bigint)),
        0L,
        (acc, x) -> (acc * 131 + x) % 1000000007)
    """)

  /** whole-document content fingerprint: md5 of case/whitespace
    * normalized text
    */
  def contentFingerprint: Column =
    md5(lower(regexp_replace(col("text"), "\\s+", " ")))

  /** PII patterns, written in the common subset of Java regex and RE2
    * (no lookaround, no backrefs) so the same pattern runs codegen'd in
    * Spark and verbatim in the DuckDB oracle. Public-knowledge shapes:
    * the usual email/IPv4/NANP-phone recipes every curation pipeline
    * carries (e.g. the C4/RefinedWeb-style scrub step).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** redact emails, then IPv4s, then phones (order matters: the email
    * rule consumes dotted digit runs inside addresses before the IP
    * rule can see them). Pure `regexp_replace` chain — codegen'd,
    * shuffle-free, embarrassingly parallel.
    */
  def piiRedact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
