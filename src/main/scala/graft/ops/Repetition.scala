package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gopher-style repetition metrics for training-data quality filtering
 * (Rae et al. 2021 §A1.1 "repetition filters", public): documents whose
 * content is dominated by repeated lines or n-grams are boilerplate /
 * spam and get dropped before training. Four deterministic metrics:
 *
 *  - duplicate-line fraction        1 − distinct(lines)/lines
 *  - duplicate-line CHAR fraction   chars in lines occurring >1× / all line chars
 *  - top-bigram token fraction      2·freq(most common token bigram)/tokens
 *  - duplicate-trigram position fraction
 *                                   positions whose trigram occurs >1× / positions
 *
 * Two planes, same numbers (pinned against each other and the DuckDB
 * oracle, q49/q50):
 *
 *  - Column functions ([[duplicateLineFraction]] …): field projections of
 *    ONE native expression (graft.functions.RepetitionStatsExpr) that
 *    computes all four fractions in a single linear pass per row — no
 *    shuffle, no UDF, inside whole-stage codegen; selecting several
 *    fractions in one projection shares the pass via Spark's
 *    common-subexpression elimination. (The round-4 first cut composed
 *    interpreted HOFs whose within-row counts were O(lines²)/O(grams²)
 *    per document — sub-second on fixtures, >1000 s on sf0.1 documents;
 *    the HOF forms survive only as the independent recomputation
 *    RepetitionSpec pins the native expression against.)
 *  - [[statsDF]]: the DF-plane twin — explode → count → re-aggregate,
 *    linear in corpus size with map-side partial aggregation, the shape
 *    that also bounds adversarially long documents (a 10⁶-line doc is
 *    just 10⁶ grouped rows spread across the cluster).
 *
 * All fractions are rounded to 4 places so the two engines (and planes)
 * compare bit-equal.
 */
object Repetition {

  private def r4(c: Column): Column = round(c, 4)

  def lines(text: Column): Column = split(text, "\n")

  private def toks(text: Column): Column = split(trim(text), "\\s+")

  private def stats(text: Column): Column =
    graft.functions.TextStatFns.repetitionStats(text)

  /** 1 − distinct/total over newline-split lines. */
  def duplicateLineFraction(text: Column): Column =
    stats(text).getField("dup_line_frac")

  /** Fraction of line characters living in lines that occur more than
    * once (every occurrence counts, the Gopher definition). */
  def duplicateLineCharFraction(text: Column): Column =
    stats(text).getField("dup_line_char_frac")

  /** Token share of the single most frequent bigram: min(1, 2·maxfreq/
    * tokens) — the token-denominator form of Gopher's top-n-gram rule
    * (exact and engine-portable, unlike overlapping char coverage; capped
    * because overlapping occurrences can push the raw ratio past 1). */
  def topBigramFraction(text: Column): Column =
    stats(text).getField("top_bigram_frac")

  /** Fraction of trigram positions whose trigram occurs more than once. */
  def dupTrigramFraction(text: Column): Column =
    stats(text).getField("dup_trigram_frac")

  /** DF-plane twin: (idCol, dup_line_frac, dup_line_char_frac,
    * top_bigram_frac, dup_trigram_frac) for every input row — identical
    * values to the column functions, computed linearly: each plane is one
    * explode → groupBy(id, unit) count → groupBy(id) re-aggregate, all
    * map-side-combinable; docs a plane has no units for (no trigrams in a
    * 2-token doc) re-enter via left join with fraction 0.
    *
    * The grouped unit is xxhash64(line) / the native n-gram window hash,
    * not the string itself: the shuffle carries (id, 8-byte hash) rows and
    * the n-gram plane never materializes a gram string at all
    * (XxWindowHashes is one native loop per doc). Counts differ from the
    * string-keyed form only under a 64-bit collision inside one document —
    * the same documented trade as the MinHash shingle pipeline; the
    * q49/q50 shared oracle (which recomputes from strings) would surface
    * one. Cut q50 from 11.2 s to ~3 s at sf0.1. */
  def statsDF(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val base = df.select(id, col(textCol).as("__t"))

    val linePlane = base.select(id, explode(lines(col("__t"))).as("__l"))
      .select(id, xxhash64(col("__l")).as("__h"), length(col("__l")).cast("long").as("__len"))
      .groupBy(id, col("__h")).agg(count(lit(1)).as("c"), first(col("__len")).as("len"))
      .groupBy(id).agg(
        r4(lit(1.0) - count(lit(1)).cast("double") /
          greatest(sum("c").cast("double"), lit(1.0))).as("dup_line_frac"),
        r4(coalesce(
          sum(when(col("c") > 1, col("c") * col("len"))).cast("double") /
            when(sum(col("c") * col("len")) > 0,
              sum(col("c") * col("len")).cast("double")),
          lit(0.0))).as("dup_line_char_frac"))

    def gramPlane(n: Int, out: Column => Column, name: String): DataFrame =
      base.select(id, explode(
          graft.functions.HashFns.xxWindowHashes(toks(col("__t")), n)).as("__g"))
        .groupBy(id, col("__g")).agg(count(lit(1)).as("c"))
        .groupBy(id).agg(out(col("c")).as(name))

    val bigram = gramPlane(2,
      c => r4(least(max(c).cast("double") * 2.0 / (sum(c) + 1).cast("double"), lit(1.0))),
      "top_bigram_frac")
    val trigram = gramPlane(3,
      c => r4(coalesce(sum(when(c > 1, c)).cast("double"), lit(0.0)) /
        sum(c).cast("double")),
      "dup_trigram_frac")

    df.select(id)
      .join(linePlane, Seq(idCol), "left")
      .join(bigram, Seq(idCol), "left")
      .join(trigram, Seq(idCol), "left")
      .select(id,
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
        coalesce(col("dup_line_char_frac"), lit(0.0)).as("dup_line_char_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("dup_trigram_frac"), lit(0.0)).as("dup_trigram_frac"))
  }
}
