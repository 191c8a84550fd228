package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Classifier-based quality filtering — the GPT-3 / LLaMA curation stage
 * (Brown et al. 2020, arXiv:2005.14165 Appendix A; Touvron et al. 2023:
 * a linear classifier trained to separate a trusted reference corpus
 * from raw crawl text, applied to every crawled document). Together
 * with [[Perplexity]] (LM scoring) and [[Dsir]] (importance weights)
 * this completes the three standard model-based quality-filter families.
 *
 * The reference pipelines train a logistic-regression/fastText model;
 * sigmoid training is float-iterative and not bit-reproducible across
 * engines, so this engine substitutes the BATCH PERCEPTRON over the same
 * hashed bag-of-words features: every quantity in training — margins,
 * updates, weights, bias — is a BIGINT, so the trained model is exactly
 * recomputable by the DuckDB oracle (iterations unrolled as CTE stages,
 * the [[Bpe.train]] posture) and invariant to partitioning, engine, and
 * summation order. Same decision family (thresholded linear margin over
 * hashed n-gram counts), deterministic by construction.
 *
 * Scale shape:
 *  - [[features]]: [[Dsir.features]] at n = 1 — one native hash loop
 *    inside the scan, one map-side-combinable (id, bucket) groupBy;
 *    text never leaves the scan.
 *  - [[train]] runs on the LABELED SAMPLE's feature table (GPT-3 trains
 *    on a bounded sample, not the corpus; the caller sizes it),
 *    pre-aggregated ONCE into one cached compact row per doc
 *    (id, y, [(bucket, cnt)…]). The weight vector is O(nBuckets)
 *    driver-resident longs; a training iteration is one pure-map margin
 *    fold over the compact table + one O(nBuckets + 1) aggregate/collect
 *    — no join, no per-doc shuffle, one action per iteration. Integer
 *    sums are order-free: no ordered-fold machinery needed.
 *  - [[scoreMargin]]: the corpus-scale pass — feature rows → groupBy(id)
 *    with the literal-array dot product. ZERO joins, one exchange keyed
 *    by id carrying (id, bucket, cnt) fixed-width rows (PlanSpec-pinned).
 */
object QualityClassifier {

  /** A trained linear quality model. `weights(b)` is the BIGINT weight
    * of hash bucket `b`; `converged` = an iteration found zero
    * misclassified docs (further iterations are no-ops). */
  final case class Model(nBuckets: Int, weights: Seq[Long], bias: Long,
      itersRun: Int, converged: Boolean)

  /** Hashed unigram bag-of-buckets counts (id, bucket, cnt) —
    * [[Dsir.features]] at n = 1 (polyHash(token) mod nBuckets, every
    * occurrence counted). */
  def features(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 4096): DataFrame =
    Dsir.features(docs, idCol, textCol, n = 1, nBuckets = nBuckets)

  /** Margin plane (id, margin) for a feature table under (weights, bias).
    * The model is an array LITERAL — the dot product is a per-row
    * expression and the only operator above the scan is the groupBy(id)
    * sum (integer: partial aggregation is exact in any order). Documents
    * with no feature rows emit no margin row (unscorable — same
    * convention as [[Perplexity.scoreNll]]). */
  private def marginOf(feat: DataFrame, weights: Seq[Long], bias: Long): DataFrame =
    feat
      .groupBy(col("id"))
      .agg(sum(element_at(typedLit(weights), col("bucket").cast("int") + 1) *
        col("cnt")).as("dotp"))
      .select(col("id"), (col("dotp") + lit(bias)).as("margin"))

  /** Train a batch perceptron on a labeled feature table.
    *
    * @param feat   (id, bucket, cnt) rows ([[features]] output) of the
    *               labeled sample — cached for the duration of training
    * @param labels (id, y) with y ∈ {+1, -1} (+1 = trusted reference)
    *
    * Each iteration: margin_i = w·x_i + bias; x_i is misclassified iff
    * y_i · margin_i ≤ 0 (the ≤ makes the all-zero start update on every
    * labeled doc, the textbook batch-perceptron first step); then
    * w += Σ_mis y_i·x_i and bias += Σ_mis y_i. Stops early when an
    * iteration misclassifies nothing. One Spark action per iteration
    * (bucket deltas and the bias delta ride one O(nBuckets + 1)
    * collect — the [[Bpe.train]] one-argmax-per-iteration posture). */
  def train(feat: DataFrame, labels: DataFrame, nBuckets: Int,
      maxIters: Int): Model = {
    // one compact row per labeled doc: (id, y, fs = [(bucket, cnt)…]) —
    // joined and aggregated ONCE, cached for every iteration. A doc's
    // fs is at most min(distinct tokens, nBuckets) entries and this is
    // the labeled SAMPLE, so rows stay small by construction.
    val compact = feat
      .select(col("id"), col("bucket").cast("long").as("bucket"),
        col("cnt").cast("long").as("cnt"))
      .join(labels.select(col("id"), col("y")), Seq("id"))
      .groupBy(col("id"), col("y"))
      .agg(collect_list(struct(col("bucket"), col("cnt"))).as("fs"))
      .cache()
    val w = Array.fill(nBuckets)(0L)
    var bias = 0L
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      // margin = fold over the doc's own feature list — a pure map over
      // the cached compact table (no join, no shuffle; integer adds are
      // exact in any order). The lambda runs interpreted (higher-order
      // functions skip whole-stage codegen), which here is a FEATURE:
      // the weights change every iteration, and an inlined-literal
      // codegen path would pay a Janino recompile per iteration.
      val wl = typedLit(w.toSeq)
      val margin = aggregate(col("fs"), lit(bias), (acc, e) =>
        acc + element_at(wl, e.getField("bucket").cast("int") + 1) *
          e.getField("cnt"))
      // misclassified docs explode their features (plus a bucket = -1
      // sentinel carrying the bias delta) into ONE O(nBuckets + 1)
      // aggregate — the iteration's only shuffle and only action.
      val updates = compact
        .filter(col("y") * margin <= 0)
        .select(col("y").cast("long").as("y"),
          explode(concat(col("fs"),
            array(struct(lit(-1L).as("bucket"), lit(1L).as("cnt"))))).as("e"))
        .groupBy(col("e.bucket").as("bucket"))
        .agg(sum(col("y") * col("e.cnt")).as("d"))
        .collect()
      if (updates.isEmpty) converged = true
      else {
        updates.foreach { r =>
          val b = r.getLong(0)
          if (b < 0L) bias += r.getLong(1) else w(b.toInt) += r.getLong(1)
        }
        iters += 1
      }
    }
    compact.unpersist()
    Model(nBuckets, w.toSeq, bias, iters, converged)
  }

  /** Corpus-scale scoring: (id, margin) with margin = w·x + bias, exact
    * BIGINT. Positive margin = "reference-like" (keep). */
  def scoreMargin(feat: DataFrame, model: Model): DataFrame =
    marginOf(feat, model.weights, model.bias)

  // ------------------------------------------------------------------
  // doc-direct fast paths: because the margin is linear,
  //   Σ_b w[b]·cnt[b]  =  Σ_tokens w[bucket(token)]
  // so neither training nor scoring ever needs the materialized
  // (id, bucket, cnt) histogram — the per-doc BUCKET LIST (one native
  // hash loop inside the scan) folds straight into the margin. These
  // paths are value-identical to train/scoreMargin over [[features]]
  // (pinned in QualityClassifierSpec) and strictly cheaper: no
  // feature-histogram shuffle at all.
  // ------------------------------------------------------------------

  /** Per-doc hashed token bucket list (id, bs: array<long>) — a pure
    * map inside the scan; one entry per token OCCURRENCE. */
  def bucketList(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      transform(
        graft.functions.HashFns.polyShingleHashesAll(
          split(trim(col(textCol)), "\\s+"), 1),
        h => pmod(h, lit(nBuckets.toLong))).as("bs"))

  private def marginOverList(bs: Column, weights: Seq[Long], bias: Long): Column =
    aggregate(bs, lit(bias), (acc, b) =>
      acc + element_at(typedLit(weights), b.cast("int") + 1))

  /** [[train]] straight from documents: the labeled sample is one
    * cached (id, y, bs) row per doc — feature extraction never leaves
    * the scan, an iteration is a pure-map margin fold plus one
    * O(nBuckets + 1) aggregate/collect. Same model as
    * `train(features(docs…), labels…)`, bit for bit. */
  def trainOnDocs(docs: DataFrame, idCol: String, textCol: String,
      labels: DataFrame, nBuckets: Int, maxIters: Int): Model =
    trainCompact(
      bucketList(docs, idCol, textCol, nBuckets)
        .join(labels.select(col("id"), col("y")), Seq("id")),
      nBuckets, maxIters)

  /** The training loop over a prebuilt (y, bs) sample. */
  private def trainCompact(compactIn: DataFrame, nBuckets: Int,
      maxIters: Int): Model = {
    val compact = compactIn.cache()
    val w = Array.fill(nBuckets)(0L)
    var bias = 0L
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      val margin = marginOverList(col("bs"), w.toSeq, bias)
      // misclassified docs explode their bucket lists (plus a -1
      // sentinel whose sum of y's is the bias delta): each occurrence
      // contributes y·1, which sums to exactly y·cnt per bucket.
      val updates = compact
        .filter(col("y") * margin <= 0)
        .select(col("y").cast("long").as("y"),
          explode(concat(col("bs"), array(lit(-1L)))).as("b"))
        .groupBy(col("b")).agg(sum(col("y")).as("d"))
        .collect()
      if (updates.isEmpty) converged = true
      else {
        updates.foreach { r =>
          val b = r.getLong(0)
          if (b < 0L) bias += r.getLong(1) else w(b.toInt) += r.getLong(1)
        }
        iters += 1
      }
    }
    compact.unpersist()
    Model(nBuckets, w.toSeq, bias, iters, converged)
  }

  /** Corpus-scale scoring straight from documents — a PURE MAP: the
    * hash loop, the bucket fold, and the bias all ride one expression
    * tree; the plan has zero joins and zero exchanges (PlanSpec-pinned).
    * Every doc gets a margin row. */
  def scoreMarginOnDocs(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    bucketList(docs, idCol, textCol, model.nBuckets)
      .select(col("id"),
        marginOverList(col("bs"), model.weights, model.bias).as("margin"))

  /** The model as a table: one row per NONZERO bucket weight plus a
    * `bucket = -1` row carrying the bias — the persistable / comparable
    * form (the q81 oracle recomputes exactly this). */
  def weightTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    (model.weights.zipWithIndex.collect {
      case (wv, b) if wv != 0L => (b.toLong, wv)
    } :+ (-1L, model.bias)).toDF("bucket", "w")
  }

  /** The composed GPT-3 gate: train reference(+1) vs a raw negatives
    * sample(-1) on the doc-direct path, score `corpus` with the
    * pure-map margin, keep margin > threshold. The sides need not share
    * an id space — training never looks at ids, only (y, bs) rows. */
  def classifierGate(positives: DataFrame, negatives: DataFrame,
      corpus: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 4096, maxIters: Int = 10,
      threshold: Long = 0L): DataFrame = {
    val sample = bucketList(positives, idCol, textCol, nBuckets)
      .withColumn("y", lit(1))
      .unionAll(bucketList(negatives, idCol, textCol, nBuckets)
        .withColumn("y", lit(-1)))
    val model = trainCompact(sample, nBuckets, maxIters)
    val keep = scoreMarginOnDocs(corpus, idCol, textCol, model)
      .filter(col("margin") > threshold)
      .select(col("id").as("__clf_keep_id"))
    corpus
      .join(keep, corpus(idCol) === keep("__clf_keep_id"))
      .drop("__clf_keep_id")
  }
}
