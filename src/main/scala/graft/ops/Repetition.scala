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
 *  - Column functions ([[duplicateLineFraction]] …): pure HOF
 *    compositions inside whole-stage codegen — no shuffle, no UDF. The
 *    within-row frequency counts are O(L²)/O(G²) per DOCUMENT (lines²,
 *    ngram positions²), which is the right trade for normal web docs
 *    (hundreds of lines/tokens) scanned at 100 TB: zero exchange.
 *  - [[statsDF]]: the DF-plane twin — explode → count → re-aggregate,
 *    linear in corpus size with map-side partial aggregation. The scale
 *    path for adversarially long documents (a 10⁶-line doc makes the
 *    per-row plane quadratic; here it is just 10⁶ grouped rows).
 *
 * All fractions are rounded to 4 places so the two engines (and planes)
 * compare bit-equal.
 */
object Repetition {

  private def r4(c: Column): Column = round(c, 4)

  def lines(text: Column): Column = split(text, "\n")

  private def toks(text: Column): Column = split(trim(text), "\\s+")

  /** 1 − distinct/total over newline-split lines. */
  def duplicateLineFraction(text: Column): Column = {
    val ls = lines(text)
    r4(lit(1.0) - size(array_distinct(ls)).cast("double") /
      greatest(size(ls).cast("double"), lit(1.0)))
  }

  /** Fraction of line characters living in lines that occur more than
    * once (every occurrence counts, the Gopher definition). */
  def duplicateLineCharFraction(text: Column): Column = {
    val ls = lines(text)
    val dupChars = aggregate(ls, lit(0L), (acc, l) =>
      acc + when(size(filter(ls, x => x === l)) > 1, length(l).cast("long")).otherwise(0L))
    val allChars = aggregate(ls, lit(0L), (acc, l) => acc + length(l).cast("long"))
    r4(when(allChars > 0, dupChars.cast("double") / allChars.cast("double"))
      .otherwise(0.0))
  }

  /** Word n-grams as strings, one per position (space-joined) — empty
    * array when the document has fewer than n tokens. */
  private def grams(text: Column, n: Int): Column = {
    val ts = toks(text)
    val g = size(ts) - (n - 1)
    when(g <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), greatest(g, lit(1))),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
  }

  /** Token share of the single most frequent bigram: min(1, 2·maxfreq/
    * tokens) — the token-denominator form of Gopher's top-n-gram rule
    * (exact and engine-portable, unlike overlapping char coverage; capped
    * because overlapping occurrences can push the raw ratio past 1). */
  def topBigramFraction(text: Column): Column = {
    val gs = grams(text, 2)
    val maxFreq = array_max(transform(gs, g => size(filter(gs, x => x === g))))
    r4(when(size(gs) > 0,
        least(maxFreq.cast("double") * 2.0 / (size(gs) + 1).cast("double"), lit(1.0)))
      .otherwise(0.0))
  }

  /** Fraction of trigram positions whose trigram occurs more than once. */
  def dupTrigramFraction(text: Column): Column = {
    val gs = grams(text, 3)
    val dupPos = size(filter(gs, g => size(filter(gs, x => x === g)) > 1))
    r4(when(size(gs) > 0, dupPos.cast("double") / size(gs).cast("double"))
      .otherwise(0.0))
  }

  /** DF-plane twin: (idCol, dup_line_frac, dup_line_char_frac,
    * top_bigram_frac, dup_trigram_frac) for every input row — identical
    * values to the column functions, computed linearly: each plane is one
    * explode → groupBy(id, unit) count → groupBy(id) re-aggregate, all
    * map-side-combinable; docs a plane has no units for (no trigrams in a
    * 2-token doc) re-enter via left join with fraction 0. */
  def statsDF(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val base = df.select(id, col(textCol).as("__t"))

    val linePlane = base.select(id, explode(lines(col("__t"))).as("__l"))
      .groupBy(id, col("__l")).agg(count(lit(1)).as("c"))
      .groupBy(id).agg(
        r4(lit(1.0) - count(lit(1)).cast("double") /
          greatest(sum("c").cast("double"), lit(1.0))).as("dup_line_frac"),
        r4(coalesce(
          sum(when(col("c") > 1, col("c") * length(col("__l")))).cast("double") /
            when(sum(col("c") * length(col("__l"))) > 0,
              sum(col("c") * length(col("__l"))).cast("double")),
          lit(0.0))).as("dup_line_char_frac"))

    def gramPlane(n: Int, out: Column => Column, name: String): DataFrame =
      base.select(id, explode(grams(col("__t"), n)).as("__g"))
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
