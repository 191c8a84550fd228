package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. Everything is keyed
 * on a content hash, never on RNG state: the same corpus always yields the
 * same sample (reproducible across runs, engines, partitionings, and
 * cluster sizes — `df.sample()` is none of those), and the sample decision
 * is a pure per-row predicate, so it composes with predicate pushdown and
 * costs no shuffle.
 *
 * Two hash planes, matching the rest of graft.ops:
 *  - [[hashSample]]/[[quotaPerStratum]] take a pre-computed hash column;
 *    use `graft.functions.HashFns.polyHash` (portable: DuckDB-reproducible,
 *    the correctness plane) or `xxhash64` (the production plane).
 */
object Sampling {

  private val M = 1000000L

  /** Deterministic Bernoulli sample: keep a row iff
    * `pmod(hash, 10^6) < fraction * 10^6`. A pure map-side predicate —
    * no shuffle, no state, survives any re-partitioning; at 100 TB this
    * is the only sampling shape that costs nothing beyond the scan. */
  def hashSample(df: DataFrame, hash: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction=$fraction")
    df.filter(pmod(hash, lit(M)) < lit(math.round(fraction * M)))
  }

  /** Deterministic quota sample: the `k` rows per stratum with the
    * smallest `(hash, tieBreak)` — a uniform without-replacement sample
    * per stratum (language/source/quality-band quotas are the standard
    * shape for training-mix curation).
    *
    * Scale path: a naive window over the full corpus shuffles every row
    * to sort each stratum — O(corpus) exchange for an O(k·strata) result.
    * Instead, when `prefilter` is on (default), a first pass computes
    * per-stratum counts (map-side partial agg, result is O(strata) and
    * broadcasts), every row is pre-filtered by the hash-threshold
    * predicate P[hash quantile ≤ ~(safety·k)/n] — so only ~safety·k rows
    * per stratum reach the window — and any stratum the prefilter
    * over-cut (< k survivors while more existed; Chernoff-improbable at
    * the default safety) is RESCUED by re-running its rows unfiltered.
    * The result is therefore EXACTLY the unprefiltered window's output at
    * any scale; `safety` is exposed so tests can force the rescue path.
    *
    * Output: input columns + `sample_rank` (1..k within the stratum). */
  def quotaPerStratum(df: DataFrame, strataCol: String, hash: Column,
      tieBreak: Column, k: Int, prefilter: Boolean = true,
      safety: Double = 8.0): DataFrame = {
    require(k > 0, s"k=$k")
    val withH = df.withColumn("__h", pmod(hash, lit(M)))
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__h"), tieBreak)
    def rank(d: DataFrame): DataFrame =
      d.withColumn("sample_rank", row_number().over(w))
        .filter(col("sample_rank") <= k)
        .drop("__h")

    if (!prefilter) rank(withH)
    else {
      val counts = withH.groupBy(col(strataCol))
        .agg(count(lit(1)).as("__n"))
        // threshold on the 10^6-bucket hash: keep ~safety*k+64 of n
        .withColumn("__thr",
          least(lit(M), ceil((lit(safety) * k + 64) * M / col("__n")).cast("long")))
        .select(col(strataCol), col("__n"), col("__thr"))
      val joined = withH.join(broadcast(counts), strataCol)
      val kept = joined.filter(col("__h") < col("__thr"))
      // rescue: strata where the prefilter left fewer than min(k, n) rows
      // (possible only in the far tail of the hash distribution) re-run
      // unfiltered; everything else keeps the slim plan
      val shortStrata = kept.groupBy(col(strataCol))
        .agg(count(lit(1)).as("__kept"))
        .join(counts.select(col(strataCol), col("__n")), strataCol)
        .filter(col("__kept") < least(lit(k.toLong), col("__n")))
        .select(col(strataCol))
      val rescued = joined.join(broadcast(shortStrata), Seq(strataCol), "left_semi")
      val survivors = kept.join(broadcast(shortStrata), Seq(strataCol), "left_anti")
        .unionByName(rescued)
        .drop("__n", "__thr")
      rank(survivors)
    }
  }
}
