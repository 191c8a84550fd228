package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Temperature-flattened mixture resampling — the "mixture weights" step
 * between corpus curation and training (GPT-3, Brown et al. 2020 §2.2's
 * up/down-weighted datasets; the multilingual α-sampling of XLM-R,
 * Conneau et al. 2020 §3.1: sample stratum s with probability
 * p_s^α / Σ_t p_t^α, α < 1 flattening the head so low-resource strata
 * are not drowned). This engine's form is deterministic and
 * without-replacement: per-stratum quotas from the flattened shares,
 * filled by [[Sampling.quotaPerStratum]]'s hash-ranked prefiltered plan.
 *
 * Scale shape:
 *  - [[quotas]]: ONE map-side-combinable count over the corpus; all the
 *    α-math runs on the O(strata) plane. The share denominator is an
 *    ORDERED fold over the sorted stratum list (collect_list →
 *    array_sort → aggregate) so the double is partition-count-invariant
 *    and engine-portable — same posture as [[Dsir.importanceWeights]].
 *  - [[resample]]: one [[Sampling.quotaPerStratum]] pass at k = the
 *    LARGEST quota (driver scalar from the O(strata) plane), then a
 *    broadcast join applies each stratum's own cutoff — the corpus
 *    never sees a global window, and the prefilter keeps the per-window
 *    input at ~safety·k rows per stratum.
 *
 * Quotas are capped at the stratum's size (without-replacement can't
 * up-sample past 1 epoch; the `deficit` column reports what an
 * up-weighting trainer would repeat). α = 1 is proportional sampling;
 * α = 0 is equal-per-stratum.
 */
object Temperature {

  /** Per-stratum target plane: (stratum, n_docs, quota, deficit) for a
    * resampled corpus of ~`totalDocs` documents at temperature `alpha`.
    * quota = min(n_docs, round(totalDocs · n_docs^α / Σ_t n_t^α));
    * deficit = the unmet remainder of the target (0 when the stratum is
    * big enough). */
  def quotas(docs: DataFrame, strataCol: String, alpha: Double,
      totalDocs: Long): DataFrame = {
    require(alpha >= 0.0, s"alpha=$alpha")
    require(totalDocs > 0, s"totalDocs=$totalDocs")
    val counts = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__w", pow(col("n_docs").cast("double"), lit(alpha)))
    // ordered O(strata) fold -> ONE driver scalar (a self-join of the
    // counts plane would trip ambiguous-attribute resolution and buy
    // nothing: the plane is strata-sized)
    val w = counts.agg(
      aggregate(
        transform(sort_array(collect_list(struct(col(strataCol), col("__w")))),
          e => e.getField("__w")),
        lit(0.0), (acc, x) => acc + x)).head().getDouble(0)
    val target = round(lit(totalDocs.toDouble) * col("__w") / lit(w))
      .cast("long")
    counts
      .select(col(strataCol), col("n_docs"),
        least(col("n_docs"), target).as("quota"),
        greatest(lit(0L), target - col("n_docs")).as("deficit"))
  }

  /** The resampled corpus: input columns + `sample_rank`
    * (1..quota(stratum)). Deterministic (hash-ranked, tie-broken), a
    * strict subset of the input, exactly `quota` rows per stratum. */
  def resample(docs: DataFrame, strataCol: String, hash: Column,
      tieBreak: Column, alpha: Double, totalDocs: Long): DataFrame = {
    val q = quotas(docs, strataCol, alpha, totalDocs)
    // O(strata) plane -> one driver scalar; rows whose rank exceeds kMax
    // can never survive any stratum's cutoff. max() over zero strata is
    // NULL (empty input corpus) -> same empty-result path as quota 0.
    val kMaxRow = q.agg(max(col("quota"))).head()
    val kMax = if (kMaxRow.isNullAt(0)) 0L else kMaxRow.getLong(0)
    if (kMax <= 0L) return docs.limit(0).withColumn("sample_rank", lit(1))
    val ranked = Sampling.quotaPerStratum(docs, strataCol, hash, tieBreak,
      kMax.toInt)
    val sk = s"`$strataCol`"
    ranked.as("r")
      .join(broadcast(q.select(col(strataCol), col("quota"))).as("q"),
        col(s"r.$sk") <=> col(s"q.$sk"))
      .filter(col("sample_rank") <= col("quota"))
      .select(col("r.*"))
  }
}
