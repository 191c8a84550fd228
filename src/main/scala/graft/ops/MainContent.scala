package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Main-content extraction over the interleaved span table — the
 * block-classifier family of boilerplate removers (Boilerpipe,
 * Kohlschütter et al. WSDM 2010 "Boilerplate Detection using Shallow
 * Text Features"; jusText, Pomikálek 2011): a page is segmented into
 * blocks, each block is classified from three shallow features — link
 * density, block length, stopword density — and short undecided blocks
 * inherit their neighbors' verdict, because nav menus / footers are
 * link-dense and stopword-poor while article prose is the opposite.
 * This complements [[Boilerplate.stripFrequentLines]]: the C4 rule
 * needs corpus-wide line frequency (a shuffle over the whole crawl);
 * this one is per-document and catches chrome the very first time a
 * template is seen.
 *
 * Input is the engine's span shape (`graft.model.SpanKind`): one row
 * per span with (doc id, offset, kind, text). Block = `offset /
 * blockSize` — a fixed segmentation standing in for DOM-block
 * boundaries, which the span contract does not carry.
 *
 * Classification (all-integer comparisons, so the arithmetic is
 * bit-identical in any engine):
 *   - bad   if 100·link_chars > maxLinkPct·n_chars
 *   - good  if n_chars ≥ minGoodChars and 100·stop_words ≥ minStopPct·n_words
 *   - short otherwise; a short block is promoted to good iff an
 *     ADJACENT block's pre-context verdict is good (the bounded one-hop
 *     form of jusText's flood rule — one lag/lead pass, no iteration).
 *
 * Scale shape: one (doc, block) groupBy is the body-carrying exchange;
 * the verdict window runs over BLOCK rows (corpus/blockSize, each a few
 * hundred bytes) partitioned by doc; the final rebuild groups blocks by
 * doc. No joins, no corpus-wide state — a pure per-document map at the
 * 100 TB tier, embarrassingly partition-parallel.
 */
object MainContent {

  /** Extract per-document main content from a span table.
    *
    * @param spans   (idCol, offset:long, kind:string, text:string) rows
    * @param stopwords closed stopword list; density is counted over
    *                whitespace tokens of each span's text
    * @return one row per input document: (idCol, content_text, n_blocks,
    *         n_good, n_promoted, n_bad) — content_text concatenates the
    *         text-kind spans of good/promoted blocks in offset order
    *         (link anchor text is chrome and never content); a document
    *         with no content blocks comes back with content_text = ''.
    */
  def extract(spans: DataFrame, idCol: String = "doc_id",
      blockSize: Int = 8, maxLinkPct: Int = 35, minGoodChars: Int = 30,
      minStopPct: Int = 8,
      stopwords: Seq[String] = Seq("a", "the")): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    val id = col(idCol)
    val toks = split(trim(col("text")), "\\s+")
    val blocks = spans
      .select(id, (col("offset").cast("long") / blockSize).cast("long").as("blk"),
        col("offset").cast("long").as("offset"), col("kind"), col("text"),
        length(col("text")).cast("long").as("len"),
        size(toks).cast("long").as("nw"),
        size(filter(toks, t => t.isInCollection(stopwords))).cast("long").as("sw"))
      .groupBy(id, col("blk"))
      .agg(
        sum(col("len")).as("n_chars"),
        sum(when(col("kind") === graft.model.SpanKind.Link, col("len"))
          .otherwise(lit(0L))).as("link_chars"),
        sum(col("nw")).as("n_words"),
        sum(col("sw")).as("stop_words"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kind") === graft.model.SpanKind.Text,
                struct(col("offset"), col("text"))))),
            x => x.getField("text")),
          " ").as("block_text"))
    val verdict = when(lit(100L) * col("link_chars") > lit(maxLinkPct.toLong) * col("n_chars"), lit("bad"))
      .when(col("n_chars") >= minGoodChars &&
        lit(100L) * col("stop_words") >= lit(minStopPct.toLong) * col("n_words"), lit("good"))
      .otherwise(lit("short"))
    val w = Window.partitionBy(id).orderBy(col("blk"))
    val judged = blocks
      .withColumn("v0", verdict)
      .withColumn("v",
        when(col("v0") =!= "short", col("v0"))
          .when(lag(col("v0"), 1).over(w) === "good" ||
                lead(col("v0"), 1).over(w) === "good", lit("promoted"))
          .otherwise(lit("bad")))
    val rebuilt = judged
      .groupBy(id)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("v") === "good" || col("v") === "promoted",
                struct(col("blk"), col("block_text"))))),
            x => x.getField("block_text")),
          " ").as("content_text"),
        count(lit(1)).as("n_blocks"),
        sum(when(col("v") === "good", 1L).otherwise(0L)).as("n_good"),
        sum(when(col("v") === "promoted", 1L).otherwise(0L)).as("n_promoted"),
        sum(when(col("v") === "bad", 1L).otherwise(0L)).as("n_bad"))
    spans.select(id).distinct()
      .join(rebuilt, Seq(idCol), "left")
      .select(id,
        coalesce(col("content_text"), lit("")).as("content_text"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_good"), lit(0L)).as("n_good"),
        coalesce(col("n_promoted"), lit(0L)).as("n_promoted"),
        coalesce(col("n_bad"), lit(0L)).as("n_bad"))
  }
}
