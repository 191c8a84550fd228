package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination (training-data op): flag / drop corpus
 * documents that share any word n-gram with a held-out evaluation set, so
 * benchmark answers cannot leak into training. This is the published
 * GPT-3-style filter (Brown et al. 2020, Appendix C: 13-gram overlap;
 * Dodge et al. 2021 measure the same leakage in C4) — the n is a
 * parameter, 13 by default.
 *
 * Scale shape (100 TB corpus, MB-scale benchmark):
 *  - the BENCHMARK side's distinct n-gram hash set is broadcast — eval
 *    sets are orders of magnitude below any broadcast limit, and that
 *    asymmetry is the op's contract (a "benchmark" of corpus size is a
 *    dedup problem, not decontamination — use [[Dedup]]);
 *  - the CORPUS side streams per-doc DISTINCT n-gram hashes out of the
 *    native one-loop shingle expression (no gram strings materialized)
 *    straight into the broadcast hash join: the corpus is never
 *    shuffled, and its text never survives past the scan projection;
 *  - the only exchange is the per-doc hit-count aggregation, which
 *    carries (id, count) rows for MATCHING grams only — in a healthy
 *    corpus a vanishing fraction.
 *
 * Grams join by 64-bit hash, not string: a collision can only create a
 * false POSITIVE (a clean doc flagged), never leak a benchmark doc —
 * the conservative direction for this filter. The hasher is pluggable
 * for the cross-engine oracle (q56 hashes gram strings with the same
 * portable polynomial in both engines, so even collisions match).
 */
object Decontaminate {

  private def defaultShingles(n: Int): Column => Column =
    text => Dedup.shingleHashes(text, n)

  /** (idCol, n_hits) for every CONTAMINATED corpus document: n_hits =
    * how many of the doc's distinct n-gram hashes appear in `bench`'s
    * distinct n-gram hash set. Clean documents do not appear. */
  def contaminationHits(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      shingles: Option[Column => Column] = None): DataFrame = {
    val sh = shingles.getOrElse(defaultShingles(n))
    val benchGrams = bench
      .select(explode(sh(col(benchTextCol))).as("g")).distinct()
    val docGrams = docs
      .select(col(idCol), explode(sh(col(textCol))).as("g"))
    docGrams.join(broadcast(benchGrams), Seq("g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** `docs` minus every contaminated document (the training-side output).
    * The anti-join runs on the id plane against the (small) contaminated
    * id set — document bodies still cross no exchange beyond what AQE
    * chooses for that join. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      shingles: Option[Column => Column] = None): DataFrame =
    docs.join(
      contaminationHits(docs, idCol, textCol, bench, benchTextCol, n, shingles)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
