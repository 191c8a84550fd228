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

  /** Corpus drift between two snapshots (crawl N vs N+1, pre- vs
    * post-curation): per-stratum counts and shares on both sides, the
    * token-share delta, and each stratum's contribution to the
    * total-variation distance (`tv_contrib = |Δtoken_share| / 2`;
    * `sum(tv_contrib)` over the result IS the TV distance between the
    * two token mixes — the number a drift monitor alarms on). A stratum
    * absent from one side reports 0 counts / 0.0 shares there, so
    * appearing and vanishing sources are first-class drift.
    *
    * Deltas are computed from the ROUNDED shares (and re-rounded):
    * deterministic and engine-portable, matching [[report]]'s contract.
    * Scale shape: two [[report]] aggregates (each one combinable
    * exchange of O(strata) rows) and an O(strata)⋈O(strata) full-outer
    * join — corpus text never moves. */
  def drift(prev: DataFrame, curr: DataFrame, strataCol: String,
      textCol: String,
      tokenCount: Column => Column = TextStats.tokenCount): DataFrame = {
    val p = report(prev, strataCol, textCol, tokenCount).select(
      col(strataCol).as("__sp"), col("n_docs").as("n_docs_prev"),
      col("n_tokens").as("n_tokens_prev"),
      col("token_share").as("token_share_prev"))
    val c = report(curr, strataCol, textCol, tokenCount).select(
      col(strataCol).as("__sc"), col("n_docs").as("n_docs_curr"),
      col("n_tokens").as("n_tokens_curr"),
      col("token_share").as("token_share_curr"))
    val delta = round(coalesce(col("token_share_curr"), lit(0.0)) -
      coalesce(col("token_share_prev"), lit(0.0)), 6)
    // null-safe join key: a NULL stratum (unidentified language, missing
    // source) is one real stratum on each side — a plain equi-join would
    // split it into two half-rows and inflate the TV distance (same trap
    // Sampling.quotaPerStratum documents)
    p.join(c, col("__sp") <=> col("__sc"), "full_outer")
      .select(
        coalesce(col("__sp"), col("__sc")).as(strataCol),
        coalesce(col("n_docs_prev"), lit(0L)).as("n_docs_prev"),
        coalesce(col("n_docs_curr"), lit(0L)).as("n_docs_curr"),
        coalesce(col("n_tokens_prev"), lit(0L)).as("n_tokens_prev"),
        coalesce(col("n_tokens_curr"), lit(0L)).as("n_tokens_curr"),
        coalesce(col("token_share_prev"), lit(0.0)).as("token_share_prev"),
        coalesce(col("token_share_curr"), lit(0.0)).as("token_share_curr"),
        delta.as("token_share_delta"),
        round(abs(delta) / 2.0, 6).as("tv_contrib"))
  }
}
