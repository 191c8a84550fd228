package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus search ops: a distributed inverted index (term → document
 * postings with term frequencies) and BM25 ranking of a fixed query
 * against it. A training-data pipeline uses these for corpus QA ("which
 * documents mention X", contamination spot-checks, topical audits) —
 * the scale shape is the interesting part:
 *
 *  - the corpus-sized explode is filtered AT THE SCAN when a query is
 *    known: `array_contains` against a literal term set runs inside
 *    whole-stage codegen before anything shuffles, so scoring a query
 *    moves O(matching (doc, term) rows), never the corpus;
 *  - the df (document-frequency) plane aggregates (term, doc) pairs with
 *    map-side combine; for the query path it is O(|query terms|) rows
 *    and broadcast into the score join;
 *  - document length and the corpus-wide avgdl are one separate scalar
 *    aggregate — BM25's only global — computed without carrying text.
 *
 * Tokenization here is the engine-wide whitespace split (TextStats); the
 * weighting is textbook BM25 (Robertson/Spärck Jones), Lucene's
 * +1-inside-the-log idf variant so weights stay positive.
 */
object Search {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** (term, doc_id, tf) postings for every token of `textCol` — the full
    * inverted index. `minTf` prunes singleton noise if asked. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      minTf: Int = 1): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minTf)

  /** BM25 scores of `queryTerms` against the corpus: one row per document
    * containing at least one query term — (doc_id, score). k1/b are the
    * standard defaults. Duplicate query terms count once (bag-of-words
    * query with binary term multiplicity, the common engine choice). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val q = queryTerms.distinct
    val n = docs.count()
    val avgdl = docs.select(avg(size(toks(col(textCol))))).head.getDouble(0)
    // per-doc (term, tf, dl) for query terms only: the filter runs in the
    // scan's codegen stage, pre-shuffle
    val qlit = array(q.map(lit): _*)
    val hits = docs.select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).as("dl"),
        explode(toks(col(textCol))).as("term"))
      .filter(array_contains(qlit, col("term")))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // df plane: O(|q|) rows; broadcast into the score join
    val dfPlane = hits.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("idf", log(lit(1.0) +
        (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    hits.join(broadcast(dfPlane), "term")
      .withColumn("w", col("idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("doc_id").agg(sum("w").as("score"))
  }

  /** Per-document topic signature: the top `k` terms by tf·idf
    * (idf = ln(N/df), score rounded to 6 dp BEFORE ranking so ties break
    * deterministically on the term — float ordering never decides alone).
    * Returns (doc_id, top_terms, top_score). The df plane is vocab-sized
    * — a term-keyed equi-join, NOT a broadcast (web vocab doesn't fit an
    * executor); the ranking window partitions by doc_id over each doc's
    * own distinct terms, never globally. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count()
    val post = postings(docs, idCol, textCol)
    val dfp = post.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = post.join(dfp, "term")
      .withColumn("score",
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("rk") <= k)
      .groupBy("doc_id")
      .agg(
        concat_ws(",", transform(
          sort_array(collect_list(struct(col("rk"), col("term")))),
          x => x.getField("term"))).as("top_terms"),
        max(when(col("rk") === 1, col("score"))).as("top_score"))
  }
}
