package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection — importance resampling of a raw corpus
 * toward a target distribution (Xie et al. 2023, "Data Selection for
 * Language Models via Importance Resampling", arXiv:2302.03169). The
 * standard way a 100 TB crawl is narrowed to a training mix: featurize
 * documents as hashed n-gram counts, fit two bag-of-buckets unigram
 * models (target corpus vs raw corpus), weight each raw document by its
 * log-likelihood ratio, and resample with Gumbel-top-k.
 *
 * Everything is deterministic and engine-portable (the oracle recomputes
 * the pipeline): shingles hash with the portable polynomial hash
 * ([[graft.functions.HashImpl.polyHash]]'s documented DuckDB twin),
 * Gumbel noise derives from a hash of the document id rather than an
 * RNG, and per-document log-ratio sums fold in bucket order so
 * floating-point addition order is identical everywhere.
 *
 * Scale shape (the whole point of DSIR — it is linear):
 *  - [[features]]: one map-side-combinable groupBy over (id, bucket)
 *    rows; the n-gram hashing is one native loop per document inside
 *    the scan; nothing else ever touches text.
 *  - [[bucketLogRatios]]: two O(nBuckets) aggregate planes (map-side
 *    partials) + one O(nBuckets) frame — broadcast-sized by
 *    construction (buckets are a config constant, never data-scale).
 *  - [[importanceWeights]]: features ⋈ broadcast ratio plane, then one
 *    groupBy(id) with a bucket-ORDERED fold — O(corpus n-grams) rows of
 *    fixed width, one exchange keyed by id.
 *  - [[select]]: Gumbel-perturbed top-k = TakeOrderedAndProject
 *    (per-partition heaps + driver merge), never a global sort.
 */
object Dsir {

  /** Hashed n-gram occurrence counts: (id, bucket, cnt). `bucket` =
    * polyHash(space-joined n-gram) mod nBuckets — every OCCURRENCE
    * counts (PolyShingleHashesAll, not the distinct dedup form). */
  def features(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2, nBuckets: Int = 4096): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(graft.functions.HashFns.polyShingleHashesAll(
          split(trim(col(textCol)), "\\s+"), n)).as("h"))
      .select(col("id"), pmod(col("h"), lit(nBuckets.toLong)).as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Per-bucket importance log-ratio w[b] = ln(p_target[b] / p_raw[b]),
    * both models Laplace-smoothed with `alpha` over `nBuckets` buckets
    * (a bucket unseen in either corpus still gets a finite ratio).
    * Output: one row per bucket 0..nBuckets-1 — broadcast-sized. */
  def bucketLogRatios(targetFeatures: DataFrame, rawFeatures: DataFrame,
      nBuckets: Int, alpha: Double = 1.0): DataFrame = {
    val spark = targetFeatures.sparkSession
    import spark.implicits._
    def plane(f: DataFrame, cntName: String) =
      f.groupBy(col("bucket")).agg(sum(col("cnt")).as(cntName))
    // ONE action evaluates both feature planes; everything after is
    // driver arithmetic over nBuckets rows. (A lazy-DF formulation costs
    // the expensive featurization once for the totals aggregate and
    // again for every consumer of the returned frame.)
    val counts = new Array[(Long, Long)](nBuckets)
    java.util.Arrays.fill(counts.asInstanceOf[Array[AnyRef]], (0L, 0L))
    plane(targetFeatures, "ct")
      .join(plane(rawFeatures, "cr"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)), coalesce(col("cr"), lit(0L)))
      .collect()
      .foreach(r => counts(r.getLong(0).toInt) = (r.getLong(1), r.getLong(2)))
    val tt = counts.iterator.map(_._1).sum
    val tr = counts.iterator.map(_._2).sum
    val denomT = tt + alpha * nBuckets
    val denomR = tr + alpha * nBuckets
    counts.iterator.zipWithIndex.map { case ((ct, cr), b) =>
      (b.toLong,
        math.log((ct + alpha) / denomT) - math.log((cr + alpha) / denomR))
    }.toSeq.toDF("bucket", "w")
  }

  /** Per-document importance weight: sum over the document's buckets of
    * cnt·w[bucket], folded in ASCENDING BUCKET ORDER (collect → sort →
    * fold) so the double-precision sum is order-deterministic — the same
    * value on any partitioning, and bit-identical to the oracle's
    * ordered list_reduce. Documents with no n-grams (shorter than n
    * tokens) are absent; treat missing as weight 0 downstream. */
  def importanceWeights(rawFeatures: DataFrame, ratios: DataFrame): DataFrame =
    rawFeatures
      .join(broadcast(ratios), Seq("bucket"))
      .select(col("id"), col("bucket"), (col("cnt") * col("w")).as("contrib"))
      .groupBy(col("id"))
      .agg(aggregate(
        transform(sort_array(collect_list(struct(col("bucket"), col("contrib")))),
          e => e.getField("contrib")),
        lit(0.0), (acc, x) => acc + x).as("weight"))

  /** Deterministic Gumbel(0,1) noise from the id itself: u =
    * ((polyHash(id)·2654435761) mod P + 0.5) / P, g = -ln(-ln(u)). A hash
    * stands in for the RNG so selection is reproducible and
    * oracle-checkable. The affine spread mod P matters (same pathology
    * [[Splits.polyUnit]] documents): the raw polynomial of a short id is
    * far below P, so without it u collapses near 0 for every short id —
    * length-correlated noise instead of Gumbel(0,1) — and "top-k by
    * weight + g" stops being sampling-without-replacement ∝ exp(weight).
    * The product stays ≤ (P−1)·2654435761 < 2⁶³ (no ANSI overflow). */
  def gumbel(id: Column): Column = {
    val u = (pmod(graft.functions.HashFns.polyHash(id.cast("string")) *
        lit(2654435761L), lit(1000000007L)) + lit(0.5)) /
      lit(1000000007.0)
    -log(-log(u))
  }

  /** Gumbel-top-k importance resampling: keep the k raw documents with
    * the highest (weight + gumbel(id)) — equivalent to sampling k items
    * without replacement with probability ∝ exp(weight), i.e. the
    * importance-resampling step of DSIR, derandomized. Returns
    * (id, weight, score) for the selected rows, score descending. */
  def select(weights: DataFrame, k: Int): DataFrame =
    weights
      .select(col("id"), col("weight"),
        (col("weight") + gumbel(col("id"))).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)

  /** The composed pipeline: featurize both corpora, fit ratios, weight
    * the raw side, select k. */
  def dsirSelect(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, k: Int, n: Int = 2, nBuckets: Int = 4096,
      alpha: Double = 1.0): DataFrame = {
    val tf = features(target, idCol, textCol, n, nBuckets)
    // the raw feature plane is read twice (ratio fit + weights) — cache
    // it across the two, release after the eager top-k materializes
    // (localCheckpoint: the returned k rows stand alone, so the caller
    // never silently re-runs the whole featurization)
    val rf = features(raw, idCol, textCol, n, nBuckets).cache()
    try {
      val ratios = bucketLogRatios(tf, rf, nBuckets, alpha)
      select(importanceWeights(rf, ratios), k).localCheckpoint(true)
    } finally rf.unpersist(blocking = false)
  }
}
