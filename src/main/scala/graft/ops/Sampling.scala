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
      // every stratum join below is null-safe (<=>): a NULL stratum
      // (unidentified language, missing source — routine in curation
      // data) is a real window partition and must survive the
      // prefiltered plan too; a plain equi-join would silently drop it.
      // (String aliases throughout — dataset-qualified refs share
      // lineage here and trip DetectAmbiguousSelfJoin.)
      val sk = s"`$strataCol`"
      val joined = withH.as("d").join(broadcast(counts).as("c"),
          col(s"d.$sk") <=> col(s"c.$sk"))
        .select(col("d.*"), col("c.__n"), col("c.__thr"))
      val kept = joined.filter(col("__h") < col("__thr"))
      // rescue: strata where the prefilter left fewer than min(k, n) rows
      // (possible only in the far tail of the hash distribution) re-run
      // unfiltered; everything else keeps the slim plan. Short strata are
      // derived from `counts` (left join, missing kept-count -> 0), NOT
      // from kept's groups alone: a stratum the prefilter emptied
      // entirely has no kept group at all and must still be rescued.
      val keptCounts = kept.groupBy(col(strataCol)).agg(count(lit(1)).as("__kept"))
      val shortStrata = counts.as("c").join(keptCounts.as("kc"),
          col(s"c.$sk") <=> col(s"kc.$sk"), "left")
        .filter(coalesce(col("__kept"), lit(0L)) < least(lit(k.toLong), col("__n")))
        .select(col(s"c.$sk"))
      val ss = broadcast(shortStrata)
      val rescued = joined.as("j").join(ss.as("s"),
        col(s"j.$sk") <=> col(s"s.$sk"), "left_semi")
      val survivors = kept.as("k").join(ss.as("s"),
          col(s"k.$sk") <=> col(s"s.$sk"), "left_anti")
        .unionByName(rescued)
        .drop("__n", "__thr")
      rank(survivors)
    }
  }
}
