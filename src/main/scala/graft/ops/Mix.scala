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

  /** UniMax mixture allocation (Chung et al. 2023, arXiv:2304.09151):
    * distribute a token budget across strata as uniformly as possible,
    * capping each stratum at `maxEpochs` passes over its data — the
    * budget-driven alternative to [[Temperature]]'s α-flattening (which
    * can silently demand 100 epochs of a tiny language; UniMax never
    * exceeds the repetition cap).
    *
    * Computed in CLOSED FORM instead of the paper's sequential loop: the
    * allocation is a waterline τ with Σ min(cap_i, τ) = B. Rank strata
    * by cap ascending; τ_r = (B − Σ_{caps below r}) / (strata from r on)
    * is each rank's candidate waterline, the first rank whose cap
    * reaches its candidate fixes τ, and alloc = min(cap, τ) — if every
    * cap is below its candidate (B ≥ Σ cap), every stratum just gets its
    * cap. Equivalent to the loop, and one O(strata) windowed projection
    * instead of a driver iteration — all windows run on the AGGREGATED
    * frame (one row per stratum), never the corpus.
    *
    * Output: (stratum, n_tokens, cap, alloc, epochs), alloc/epochs
    * rounded to 6 for engine-portable comparison. */
  def unimaxQuotas(docs: DataFrame, strataCol: String, textCol: String,
      budgetTokens: Long, maxEpochs: Double,
      tokenCount: Column => Column = TextStats.tokenCount): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens=$budgetTokens")
    require(maxEpochs > 0, s"maxEpochs=$maxEpochs")
    val caps = docs
      .select(col(strataCol), tokenCount(col(textCol)).as("__nt"))
      .groupBy(col(strataCol))
      .agg(sum(col("__nt")).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
    val byCap = Window.orderBy(col("cap"), col(strataCol))
    val all = Window.partitionBy() // O(strata) frame
    val ranked = caps
      .withColumn("__rk", row_number().over(byCap))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__below", coalesce(
        sum(col("cap")).over(byCap.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .withColumn("__tau",
        (lit(budgetTokens.toDouble) - col("__below")) /
          (col("__n") - col("__rk") + 1))
    // the first rank whose cap reaches its candidate fixes τ; candidates
    // strictly decrease past that rank and every later rank qualifies
    // (caps ascend, candidates descend), so τ* = MAX over qualifiers
    val tauStar = max(when(col("cap") >= col("__tau"), col("__tau"))).over(all)
    ranked
      .withColumn("alloc", round(
        when(tauStar.isNull, col("cap")).otherwise(least(col("cap"), tauStar)), 6))
      .withColumn("epochs", round(col("alloc") /
        greatest(col("n_tokens").cast("double"), lit(1e-9)), 6))
      .select(col(strataCol), col("n_tokens"), round(col("cap"), 6).as("cap"),
        col("alloc"), col("epochs"))
  }
}
