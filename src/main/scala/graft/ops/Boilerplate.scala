package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-frequency boilerplate removal (the C4 "three-sentence span /
 * repeated line" rule, Raffel et al. 2020 §2.2, applied at line
 * granularity): a line that appears verbatim in many DISTINCT documents
 * is site chrome — nav menus, cookie banners, copyright footers — not
 * content, and page-level dedup can never remove it because the pages
 * hosting it are otherwise distinct. Training corpora drop such lines
 * before tokenization.
 *
 * Scale shape: the document frequency plane is keyed by
 * `xxhash64(line)` — 8-byte keys, the line text never enters the df
 * aggregation's shuffle (same 2^-64 collision stance as the exact-dedup
 * index; a collision over-drops one innocent line). The removal join is
 * a LEFT ANTI against the ≥`minDocs` plane — that plane is tiny (only
 * boilerplate survives the filter) so AQE broadcasts it and document
 * lines are never shuffled; the ordered rebuild groups by doc id,
 * the one body-carrying exchange.
 */
object Boilerplate {

  /** Remove lines occurring in ≥ `minDocs` distinct documents; rebuild
    * each document's remaining lines in original order. Returns
    * (idCol, clean_text, n_kept) for EVERY input document — a document
    * made entirely of boilerplate comes back with clean_text = '' and
    * n_kept = 0. */
  def stripFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 10): DataFrame = {
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "line")))
      .withColumn("lh", xxhash64(col("line")))
    val frequent = lines
      .groupBy(col("lh"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("lh"))
    val kept = lines.join(frequent, Seq("lh"), "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
