package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-mix report (training-data op): per-stratum document and token
 * shares — the summary a training run reads before deciding per-stratum
 * quotas ([[Sampling.quotaPerStratum]]) or up/down-weighting. Strata are
 * any row-local key: language, host, source tier.
 *
 * Scale shape: ONE map-side-combinable groupBy over (stratum, n_tokens)
 * rows — text dies at the scan projection, the shuffle carries one row
 * per (partition, stratum). The share denominators are computed with an
 * unpartitioned window, which is safe HERE because it runs over the
 * AGGREGATED frame (one row per stratum — thousands, not the corpus);
 * the corpus itself never sees a global window.
 */
object Mix {

  /** (stratum, n_docs, n_tokens, doc_share, token_share), shares rounded
    * to 6 places for engine-portable comparison. */
  def report(docs: DataFrame, strataCol: String, textCol: String,
      tokenCount: Column => Column = TextStats.tokenCount): DataFrame = {
    val agg = docs
      .select(col(strataCol), tokenCount(col(textCol)).as("__nt"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
    val all = Window.partitionBy() // post-aggregation frame: O(strata) rows
    agg.select(
      col(strataCol),
      col("n_docs"),
      col("n_tokens"),
      round(col("n_docs").cast("double") / sum(col("n_docs")).over(all), 6)
        .as("doc_share"),
      round(col("n_tokens").cast("double") / sum(col("n_tokens")).over(all), 6)
        .as("token_share"))
  }
}
