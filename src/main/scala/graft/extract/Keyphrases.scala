package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * R26 — keyphrase extraction for Activities
 * (`/root/reference/crawler/spiders/minutes_spider.py:29-33,159-160`:
 * `KeyPhraseExtractor.extract(speech, 3)` when `-a keyphrase=true`).
 *
 * The reference delegates to an external NLP model
 * (`politylink.nlp.keyphrase`) that lives OUTSIDE the crawler repo and has
 * no published output contract, so this is an original deterministic
 * substitute with the same API shape (text → top-k phrase list), built on
 * the published RAKE method (Rose et al. 2010, "Automatic keyword
 * extraction from individual documents"): candidate phrases are maximal
 * content-token runs between delimiter tokens, scored by
 * frequency × phrase length, ranked with a deterministic tiebreak
 * (score desc, first occurrence asc, phrase asc).
 *
 * Two tokenizations, one per script family:
 *  - [[extract]] — Japanese (the kokkai speeches the reference feeds the
 *    extractor): content tokens are kanji/katakana runs of length ≥ 2;
 *    hiragana (mostly particles and inflection), ASCII, and punctuation
 *    delimit. Used by the typed Activities pipeline.
 *  - [[phraseTopK]] — whitespace text: stopword-delimited token runs over a
 *    DataFrame column, pure built-in functions (codegen'd, no UDF). This is
 *    the q41 oracle-checked form.
 */
object Keyphrases {

  /** Kanji (CJK unified) or katakana (ァ..ヺ plus the prolonged-sound mark
    * ー, excluding the ・ separator) runs of length ≥ 2. */
  private val JpToken = "[\\u4E00-\\u9FFF\\u30A1-\\u30FA\\u30FC]{2,}".r

  /** Top-`k` keyphrases of a Japanese text (reference API shape:
    * `KeyPhraseExtractor.extract(speech, 3)`). Deterministic. */
  def extract(text: String, k: Int): Seq[String] = {
    if (text == null || k <= 0) return Nil
    val runs = JpToken.findAllIn(text).toVector
    if (runs.isEmpty) return Nil
    val stats = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Int)]
    runs.zipWithIndex.foreach { case (p, i) =>
      val (f, fp) = stats.getOrElse(p, (0L, i))
      stats(p) = (f + 1, fp)
    }
    stats.toSeq
      .map { case (p, (f, fp)) => (p, f * p.length, fp) }
      .sortBy { case (p, score, fp) => (-score, fp, p) }
      .take(k)
      .map(_._1)
  }

  /** DataFrame-plane RAKE-lite over whitespace text: candidate phrases are
    * maximal token runs between stopword occurrences; score =
    * freq × token-count. Emits (idCol, rank, keyphrase, score), rank ≤ `k`.
    *
    * Scale shape: one `split` + `posexplode` per row, then a partial-agg
    * groupBy on (id, phrase) and a per-id window top-k — no UDF, no
    * collect, shuffle keys are (id, phrase) then id. */
  def phraseTopK(df: DataFrame, idCol: String, textCol: String, k: Int,
      stopwords: Seq[String]): DataFrame = {
    require(stopwords.nonEmpty, "phraseTopK needs at least one stopword delimiter")
    // word-character stopwords only: the \b delimiters below require a
    // word-char edge, so a stopword like "c++" or "a.b" would silently
    // never match. Lookaround would fix that but is not RE2-expressible
    // (the DuckDB oracle mirrors this exact pattern), so reject instead.
    val bad = stopwords.filterNot(_.matches("\\w+"))
    require(bad.isEmpty,
      s"phraseTopK stopwords must be word characters only (got: ${bad.mkString(", ")})")
    val stopRe = "\\s*\\b(?:" +
      stopwords.map(java.util.regex.Pattern.quote).mkString("|") + ")\\b\\s*"
    val runs = split(concat(lit(" "), col(textCol), lit(" ")), stopRe)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("first_pos"), col("keyphrase"))
    df.select(col(idCol), posexplode(runs).as(Seq("pos", "raw")))
      .select(col(idCol), col("pos"),
        trim(regexp_replace(col("raw"), "\\s+", " ")).as("keyphrase"))
      .filter(col("keyphrase") =!= "")
      .groupBy(col(idCol), col("keyphrase"))
      .agg(count(lit(1)).as("freq"), min(col("pos")).as("first_pos"))
      .withColumn("score",
        (col("freq") * size(split(col("keyphrase"), " "))).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("keyphrase"), col("score"))
  }

  /** Column form of [[extract]] for typed pipelines that stay in the DF
    * plane: returns array<string> of the top-k Japanese keyphrases. */
  def extractCol(text: Column, k: Int): Column = {
    val fn = udf((s: String) => extract(s, k))
    fn(text)
  }
}
