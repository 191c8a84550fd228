package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Queries.Q

/**
 * Query batch F: round-4 closing ops. Inputs are synthesized
 * deterministically from `documents` with arithmetic both engines
 * express identically (BASELINE.json: no external data).
 */
object QueriesF {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // q83: main-content extraction (MainContent.extract; Boilerpipe
    // Kohlschütter et al. WSDM 2010 / jusText Pomikálek 2011) — both
    // engines synthesize the same span table from `documents` (token =
    // span, kind = link iff (offset+doc_id)%7 < 2, block = offset/8),
    // classify each block from link-char density / length / stopword
    // density, run the one-hop neighbor-promotion window, and rebuild
    // per-document content from the good+promoted blocks' TEXT spans.
    // At sf0.01 all four verdict branches fire (804 bad / 926 good /
    // 797 promoted / 1082 short-demoted blocks).
    // ------------------------------------------------------------------
    "q83_main_content" -> Q(
      (s, d) => {
        val spans = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("offset", "tok")))
          .select(col("doc_id"), col("offset").cast("long").as("offset"),
            when((col("offset") + col("doc_id")) % 7 < 2, lit("link"))
              .otherwise(lit("text")).as("kind"),
            col("tok").as("text"))
        graft.ops.MainContent.extract(spans, "doc_id",
          blockSize = 8, maxLinkPct = 35, minGoodChars = 30, minStopPct = 8,
          stopwords = Seq("a", "the"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, (pos - 1) AS o, tok,
             |    CASE WHEN ((pos - 1) + doc_id) % 7 < 2 THEN 'link' ELSE 'text' END AS kind
             |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
             |               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
             |        FROM documents)),
             |b AS (
             |  SELECT doc_id, o // 8 AS blk,
             |    sum(len(tok)) AS n_chars,
             |    sum(CASE WHEN kind = 'link' THEN len(tok) ELSE 0 END) AS link_chars,
             |    count(*) AS n_words,
             |    sum(CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END) AS stop_words,
             |    string_agg(CASE WHEN kind = 'text' THEN tok END, ' ' ORDER BY o) AS block_text
             |  FROM sp GROUP BY 1, 2),
             |v AS (
             |  SELECT doc_id, blk, block_text,
             |    CASE WHEN 100 * link_chars > 35 * n_chars THEN 'bad'
             |         WHEN n_chars >= 30 AND 100 * stop_words >= 8 * n_words THEN 'good'
             |         ELSE 'short' END AS v0
             |  FROM b),
             |j AS (
             |  SELECT doc_id, blk, block_text,
             |    CASE WHEN v0 <> 'short' THEN v0
             |         WHEN lag(v0) OVER w = 'good' OR lead(v0) OVER w = 'good'
             |           THEN 'promoted'
             |         ELSE 'bad' END AS v
             |  FROM v WINDOW w AS (PARTITION BY doc_id ORDER BY blk))
             |SELECT doc_id,
             |  coalesce(string_agg(CASE WHEN v IN ('good', 'promoted')
             |    THEN coalesce(block_text, '') END, ' ' ORDER BY blk), '') AS content_text,
             |  CAST(count(*) AS BIGINT) AS n_blocks,
             |  CAST(sum(CASE WHEN v = 'good' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             |  CAST(sum(CASE WHEN v = 'promoted' THEN 1 ELSE 0 END) AS BIGINT) AS n_promoted,
             |  CAST(sum(CASE WHEN v = 'bad' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "jusText/Boilerpipe block-classifier main-content extraction (MainContent.extract)"))
}
