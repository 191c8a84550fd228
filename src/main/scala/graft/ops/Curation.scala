package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end curation pipeline: the composition a training-data run
 * executes over a raw crawled corpus before tokenization. One call chains
 * the individually-verified stages in their canonical order:
 *
 *   1. exact dedup, first-wins by content hash   ([[Dedup]] shape, q22)
 *   2. quality gate: token count + uniqueness    ([[TextStats]] shape, q21)
 *   3. repetition gate: Gopher dup-line fraction ([[Repetition]], q49)
 *   4. PII scrub + audit counts                  ([[Scrub]], q51)
 *   5. deterministic Bernoulli sample            ([[Sampling]], q47)
 *
 * Stage ORDER is load-bearing: dedup must see the raw text (two copies of
 * one page must collapse before any doc_id-keyed augmentation or sampling
 * could tell them apart), gates run before the scrub so audit counts are
 * only paid for surviving documents, and the sample is last so the kept
 * fraction applies to the CURATED distribution, not the raw one.
 *
 * Scale shape (100 TB): the dedup DECISION shuffles only (64-bit content
 * hash, id) pairs; document bodies move at most once, in the survivor
 * semi-join, whose broadcast-vs-shuffle choice is left to AQE (near-total
 * survival → winner set is O(corpus) and must shuffle; heavy duplication →
 * it broadcasts and bodies never move). Stages 2-5 are row-local
 * projections and filters fused into whole-stage codegen on top of that
 * single pass — no further exchange. The repetition gate uses the native
 * one-pass RepetitionStatsExpr, and the sample is a pure hash predicate
 * (no RNG state, partition- and engine-invariant).
 *
 * The whole pipeline is pinned end-to-end against a DuckDB recomputation
 * in q55 (every stage mirrored as a SQL CTE over the portable polynomial
 * hash).
 */
object Curation {

  /** Gate thresholds + sample rate. Defaults are deliberately permissive
    * (Gopher's published cuts are corpus-tuned; these are the knobs, not
    * the policy). `sampleRate >= 1.0` disables the sampling stage. */
  final case class Config(
      minTokens: Long = 10,
      minUniqRatio: Double = 0.2,
      maxDupLineFrac: Double = 0.5,
      sampleRate: Double = 1.0)

  /** Runs the five-stage pipeline over `docs`. Returns one row per
    * surviving document: (idCol, n_tokens, scrubbed, n_email, n_ipv4,
    * n_phone). `contentHash`/`sampleHash` are pluggable for the
    * cross-engine oracle (q55); production uses xxhash64.
    *
    * `augment` (identity by default) is applied AFTER dedup and the
    * gates but BEFORE scrub/audit — the hook the q55 oracle uses to
    * inject deterministic PII into a corpus that has none (mirrors q51). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      contentHash: Column => Column = c => xxhash64(c),
      sampleHash: Column => Column = c => xxhash64(c),
      augment: Column => Column = identity): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)

    // 1. first-wins exact dedup — decision plane carries (hash, id) only
    val winners = docs
      .select(contentHash(trim(text)).as("__ch"), id)
      .groupBy(col("__ch")).agg(min(id).as(idCol))
      .select(id)
    val deduped = docs.join(winners, Seq(idCol), "left_semi")

    // 2 + 3. row-local quality and repetition gates — the SAME token
    // definitions as the standalone metrics ops (TextStats.uniqueTokenRatio's
    // divide guard is value-neutral here: split() output is never empty)
    val gated = deduped
      .withColumn("__nt", TextStats.tokenCount(text))
      .filter(col("__nt") >= cfg.minTokens &&
        TextStats.uniqueTokenRatio(text) >= cfg.minUniqRatio &&
        Repetition.duplicateLineFraction(text) <= cfg.maxDupLineFrac)

    // 4. scrub + audit over the (possibly augmented) text
    val aug = augment(text)
    val scrubbed = gated.select(
      id,
      col("__nt").as("n_tokens"),
      Scrub.scrub(aug).as("scrubbed"),
      Scrub.emailCount(aug).as("n_email"),
      Scrub.ipv4Count(aug).as("n_ipv4"),
      Scrub.phoneCount(aug).as("n_phone"))

    // 5. deterministic Bernoulli sample on the id
    if (cfg.sampleRate >= 1.0) scrubbed
    else Sampling.hashSample(scrubbed, sampleHash(id.cast("string")), cfg.sampleRate)
  }

  /** Stage labels emitted by [[funnel]], in pipeline order. A document's
    * verdict is its FIRST failing stage (matching [[curate]]'s sequential
    * semantics: a dedup loser never reaches the token gate, a short doc
    * never reaches the sampler). */
  val FunnelStages: Seq[String] = Seq(
    "dedup_loser", "too_few_tokens", "low_uniq_ratio", "repetitive",
    "sampled_out", "kept")

  /** Per-document drop attribution for [[curate]]: one row per INPUT
    * document with the stage that dropped it (or `kept`). This is the
    * audit plane a production curation run reports — "of 4.1 B pages,
    * 31% died to dedup, 9% to the token gate, …" — and the invariant
    * `funnel(...).filter(stage = 'kept').ids == curate(...).ids` pins it
    * to the pipeline it describes (CurationSpec).
    *
    * Scale shape: STRICTLY cheaper than [[curate]] itself. Every gate
    * metric is computed row-local in the scan projection, so the only
    * exchange is the dedup decision (fixed-width `(content_hash, id,
    * 4 metric words)` rows — document bodies never shuffle at all, where
    * curate's survivor semi-join must still move surviving bodies), and
    * the winner join is a self-equi-join on the hash plane that AQE can
    * broadcast when duplication is heavy. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      contentHash: Column => Column = c => xxhash64(c),
      sampleHash: Column => Column = c => xxhash64(c)): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)
    // one row-local pass: all gate metrics die into fixed-width columns
    val metrics = docs.select(
      id,
      contentHash(trim(text)).as("__ch"),
      TextStats.tokenCount(text).as("n_tokens"),
      TextStats.uniqueTokenRatio(text).as("__uq"),
      Repetition.duplicateLineFraction(text).as("__dl"),
      pmod(sampleHash(id.cast("string")), lit(1000000L)).as("__sh"))
    val winners = metrics.groupBy(col("__ch")).agg(min(id).as("__win"))
    val sampleCut = math.round(cfg.sampleRate * 1000000L)
    // null-safe join: a pluggable contentHash may null-propagate (the
    // portable polyHash does, unlike xxhash64), and the ledger contract
    // is one row per INPUT document — a plain equi-join would silently
    // drop every null-hash doc
    metrics.join(winners.withColumnRenamed("__ch", "__chw"),
        col("__ch") <=> col("__chw"))
      .drop("__chw")
      .withColumn("stage",
        // each gate is the NEGATION of curate's keep-predicate with
        // null folded to "dropped" — curate's filters drop a null
        // predicate row, so the ledger must attribute it, not "keep" it
        when(id =!= col("__win"), FunnelStages(0))
          .when(!coalesce(col("n_tokens") >= cfg.minTokens, lit(false)), FunnelStages(1))
          .when(!coalesce(col("__uq") >= cfg.minUniqRatio, lit(false)), FunnelStages(2))
          .when(!coalesce(col("__dl") <= cfg.maxDupLineFrac, lit(false)), FunnelStages(3))
          .when(lit(cfg.sampleRate < 1.0) &&
            !coalesce(col("__sh") < sampleCut, lit(false)), FunnelStages(4))
          .otherwise(FunnelStages(5)))
      .select(id, col("stage"), col("n_tokens"))
  }

  /** Aggregate funnel report over [[funnel]]'s verdicts: per stage,
    * documents and tokens attributed to it. Map-side combinable — the
    * report is O(stages) and the natural thing to log per curation run. */
  def funnelReport(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
}
