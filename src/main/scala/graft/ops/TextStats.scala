package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for training-data pipelines — all pure
 * `org.apache.spark.sql.functions` compositions (whole-stage codegen,
 * no UDFs).
 */
object TextStats {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: whitespace tokens plus an extra unit
    * per 4 chars of long tokens (the common len/4 heuristic). */
  def subwordCountEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / 4.0).cast("long")))

  /** GPT-2-style pre-tokenizer pattern (Radford et al. 2019):
    * contractions, letter runs, digit runs, punctuation runs, each run
    * absorbing one optional leading space. Deliberately LOOKAHEAD-FREE
    * (the original's `\s+(?!\S)` tail is dropped, pure-whitespace runs
    * are simply not tokens) so the same string runs identically on
    * java.util.regex (Spark codegen) and RE2 (the DuckDB oracle). */
  val BpeishPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** Pre-tokenizer token count over [[BpeishPattern]] — the "how many
    * BPE merge inputs" estimate a mixed-script corpus report wants
    * (CJK text counts letter runs, not characters), without training or
    * applying an actual merge table (that is [[Bpe]]). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Stopword hit ratio against a given lexicon. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val set = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t))).cast("double") /
      greatest(size(tokens(text)).cast("double"), lit(1.0))
  }

  /** Distinct-token ratio (repetition detector). */
  def uniqueTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") /
      greatest(size(tokens(text)).cast("double"), lit(1.0))

  /** Punctuation density per character. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:、。！？]", ""))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(tokens(text)).cast("double"), lit(1.0))

  /** Composite quality score in [0,1]: favors mid-length tokens, lexical
    * diversity, and moderate punctuation (C4/Gopher-style heuristics,
    * deterministic and unit-tested rather than model-based). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = when(tokenCount(text).between(10, 100000), 1.0).otherwise(0.3)
    val divScore = least(uniqueTokenRatio(text) * 2.0, lit(1.0))
    val punct = punctRatio(text)
    val punctScore = when(punct <= 0.2, 1.0).otherwise(0.5)
    val stopScore = when(stopwordRatio(text, stopwords) >= 0.05, 1.0).otherwise(0.6)
    round((lenScore * 0.25 + divScore * 0.25 + punctScore * 0.25 + stopScore * 0.25), 4)
  }

  /** Language-ID by stopword voting over per-language lexicons; returns
    * the best language or `und` when nothing hits. */
  def langId(text: Column, lexicons: Seq[(String, Seq[String])]): Column = {
    val hits = lexicons.map { case (lang, words) =>
      val set = array(words.map(lit): _*)
      struct(size(filter(tokens(text), t => array_contains(set, t))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(hits: _*)) // max by (hits, lang)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Rolling polynomial fingerprint (content-defined, order-sensitive) —
    * native codegen'd loop (graft.functions.PolyHash), same math as the
    * round-1 per-character HOF fold. */
  def fingerprint(text: Column): Column =
    graft.functions.HashFns.polyHash(trim(text))
}
