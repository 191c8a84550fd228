package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic train/valid/test split assignment and the cross-split
 * near-dup leakage guard (GPT-3, Brown et al. 2020 §2.2 / The Pile,
 * Gao et al. 2021: training documents that near-duplicate an eval
 * document are removed so held-out numbers measure generalization, not
 * memorization). Exact dedup cannot catch these — the leak is a
 * near-copy that hashes differently — so the guard is an LSH band-bucket
 * join BETWEEN splits, the cross-corpus form of
 * [[Dedup.minhashLshPairs]].
 *
 * Scale shape:
 *  - [[assignSplit]]: a row-local hash predicate (same posture as
 *    [[Sampling]] — no RNG state, no shuffle, partition- and
 *    engine-invariant; a document keeps its split for life, so
 *    incremental ingests never reshuffle old data across splits).
 *  - [[crossSplitLeakPairs]]: both sides reduce to (id, band, bv) rows;
 *    the join carries ids only (text and signatures never move), each
 *    side's degenerate buckets are capped BEFORE the |A|·|B| per-bucket
 *    expansion (boilerplate bands — same documented sacrifice semantics
 *    as every pair generator here).
 *  - [[purgeByIds]]: one anti-join, broadcast-vs-shuffle left to AQE.
 */
object Splits {

  /** Uniform-ish u ∈ [0, 1) from the id via the portable polynomial
    * hash, spread by an affine map mod P: the raw polynomial of a short
    * id string is far below P (a 4-char id stays under ~6·10⁷), so the
    * raw value/P would land every short id in the first split.
    * Multiplying by a constant coprime to the prime P is a bijection of
    * [0, P) that decorrelates magnitude from string length. The product
    * stays ≤ (P−1)·2654435761 < 2⁶³, so ANSI mode never overflows, and
    * the DuckDB twin is the literal same expression. Swap for
    * `pmod(xxhash64(c), P)/P` when entropy matters more than oracle
    * portability. */
  def polyUnit(id: Column): Column =
    (pmod(graft.functions.HashFns.polyHash(id.cast("string")) *
        lit(2654435761L), lit(1000000007L)) + lit(0.5)) /
      lit(1000000007.0)

  /** Deterministic split assignment: appends a `split` column chosen by
    * where unit(id) falls in the cumulative-fraction intervals of
    * `fracs` (which must sum to 1). Hash-gated like [[Sampling]]: no
    * randomness, no state, stable under repartitioning, re-runs, and
    * corpus growth. */
  def assignSplit(docs: DataFrame, idCol: String,
      fracs: Seq[(String, Double)],
      unit: Column => Column = polyUnit): DataFrame = {
    require(fracs.nonEmpty && fracs.forall(_._2 > 0.0) &&
      math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must be positive and sum to 1: $fracs")
    val u = unit(col(idCol))
    val thresholds = fracs.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = fracs.init.zip(thresholds.init)
      .foldRight(lit(fracs.last._1): Column) {
        case (((name, _), thr), acc) => when(u < thr, lit(name)).otherwise(acc)
      }
    docs.withColumn("split", label)
  }

  /** Band-bucket collision pairs between two banded corpora: one
    * (a_id, b_id) row per cross-side pair sharing any (band, bv).
    * Inputs are (idCol, band, bv) rows — from [[Dedup.bandValues]], a
    * SimHash blocking, or any locality-sensitive bucketing. Buckets
    * larger than `maxBucketSize` on either side are dropped before the
    * expansion (pass Int.MaxValue to disable, e.g. under an oracle). */
  def leakPairsBanded(aBanded: DataFrame, bBanded: DataFrame,
      idCol: String, maxBucketSize: Int = 10000): DataFrame = {
    def capped(df: DataFrame, as: String) = {
      val named = df.select(col(idCol).as(as), col("band"), col("bv"))
      if (maxBucketSize == Int.MaxValue) named
      else named
        .withColumn("bucket_n",
          count(lit(1)).over(Window.partitionBy(col("band"), col("bv"))))
        .filter(col("bucket_n") <= maxBucketSize)
        .drop("bucket_n")
    }
    capped(aBanded, "a_id")
      .join(capped(bBanded, "b_id"), Seq("band", "bv"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Cross-split near-dup leak pairs with the production MinHash
    * banding: (train_id, eval_id) rows where a `train` document shares
    * an LSH band bucket with an `eval` document. */
  def crossSplitLeakPairs(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 16, bands: Int = 4,
      maxBucketSize: Int = 10000): DataFrame =
    leakPairsBanded(
      Dedup.bandValues(train, idCol, textCol, numHashes, bands),
      Dedup.bandValues(eval, idCol, textCol, numHashes, bands),
      idCol, maxBucketSize)
      .withColumnRenamed("a_id", "train_id")
      .withColumnRenamed("b_id", "eval_id")

  /** Drop the rows of `docs` whose id appears in `ids`' single column —
    * the purge consumer for either direction (GPT-3 purged TRAIN so
    * eval sets stay intact and comparable; purging eval instead keeps
    * every training token). */
  def purgeByIds(docs: DataFrame, idCol: String, ids: DataFrame): DataFrame =
    docs.join(ids.toDF("__leak_id").distinct(),
      docs(idCol) === col("__leak_id"), "left_anti")

  /** The composed guard: assign splits, find train↔eval leaks, purge
    * the train side (the GPT-3 direction). Returns the assigned frame
    * minus leaked train rows; eval rows always survive. */
  def splitWithLeakageGuard(docs: DataFrame, idCol: String, textCol: String,
      fracs: Seq[(String, Double)], trainSplit: String,
      numHashes: Int = 16, bands: Int = 4, maxBucketSize: Int = 10000,
      unit: Column => Column = polyUnit): DataFrame = {
    val assigned = assignSplit(docs, idCol, fracs, unit)
    val train = assigned.filter(col("split") === trainSplit)
    val eval = assigned.filter(col("split") =!= trainSplit)
    val leaks = crossSplitLeakPairs(train, eval, idCol, textCol,
      numHashes, bands, maxBucketSize)
    purgeByIds(assigned, idCol, leaks.select(col("train_id")))
  }
}
