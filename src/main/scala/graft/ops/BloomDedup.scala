package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * BFF-style incremental paragraph deduplication behind a Bloom filter
 * (Dolma's "Bloom Filter File" dedup, Soldaini et al. 2024
 * arXiv:2402.00159 §4.1; Kirsch–Mitzenmacher double hashing, "Less
 * Hashing, Same Performance", ESA 2006): membership state whose size is
 * O(m), INDEPENDENT of corpus size — the property that lets a 3T-token
 * crawl dedup against a fixed-size filter where the exact hash index
 * ([[Dedup.dedupIncremental]]) grows O(distinct content) forever.
 *
 * The filter is stored as the SET of set-bit positions in a
 * [[graft.sinks.SnapshotTable]] keyed by position: at most `m` rows of
 * one long each, mergeable, and membership = a bucket-pruned semi-join
 * (readForKeys) — no driver-resident bitmap, so `m` can be 2^33+ on a
 * cluster while a batch probe still reads only its own buckets.
 *
 * Positions are double-hashed: pos_i = (h1' + i·(2·h2'+1)) mod m for
 * i < k, with h1' = h1 mod m, h2' = h2 mod m (the 2·h2'+1 keeps the
 * stride odd, so for power-of-two m the k probes never collapse onto a
 * short cycle). Both hashes are pluggable: production uses xxhash64;
 * the q84 oracle swaps in the portable polynomial hash with a salt
 * prefix, making every position — and therefore every verdict,
 * INCLUDING false positives — bit-identical in DuckDB.
 *
 * Batch semantics (the distributed analogue of BFF's sequential scan):
 *   - within-batch: identical paragraphs (same (h1,h2)) keep one witness
 *     occurrence, min (doc, offset); the rest are `dup_batch`.
 *   - cross-batch: a witness is `dup_bloom` iff ALL of its k distinct
 *     positions are already set — the Bloom "definitely contains" test.
 *     A false positive over-drops (conservative toward emitting no dup),
 *     never under-drops; FP rate is the standard (1-e^{-kn/m})^k.
 *   - only SURVIVORS' positions extend the filter (a rejected paragraph
 *     never strengthens the state it was rejected by), and the verdict
 *     frame is pinned (localCheckpoint) BEFORE the state advances, so a
 *     lazily-consumed result cannot re-probe its own insertions.
 *
 * Scale shape: paragraph text is hashed in the scan and never shuffles —
 * the gate's exchanges carry (h1, h2, 8-byte position) rows; text
 * crosses exactly once, in the per-doc rebuild keyed by doc id.
 * Admission is at-most-once on replay (same contract as
 * dedupIncremental): replaying a batch after the state advanced sees
 * its own survivors as dup_bloom.
 */
object BloomDedup {

  /** Bloom geometry: `m` filter slots, `k` probes per paragraph. */
  final case class Config(m: Long = 1L << 30, k: Int = 5) {
    require(m > 0 && m <= (1L << 40), s"m out of range: $m")
    require(k >= 1 && k <= 64, s"k out of range: $k")
  }

  /** The k double-hashed probe positions (distinct, each in [0, m)). */
  def positions(h1: Column, h2: Column, cfg: Config): Column = {
    val m = lit(cfg.m)
    val h1m = pmod(h1, m)
    val stride = pmod(h2, m) * 2 + 1
    array_distinct(array(
      (0 until cfg.k).map(i => pmod(h1m + lit(i.toLong) * stride, m)): _*))
  }

  /** Split documents into non-empty trimmed paragraphs:
    * (idCol, par_idx: long = position in the original split, par). */
  def paragraphs(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n"): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), sepRegex)).as(Seq("par_idx", "par")))
      .select(col(idCol), col("par_idx").cast("long").as("par_idx"),
        trim(col("par")).as("par"))
      .filter(length(col("par")) > 0)

  /** Gate a paragraph batch against the persisted filter at `indexRoot`.
    *
    * @param pars (idCol, par_idx, par) rows, e.g. from [[paragraphs]]
    * @return the input rows + `verdict` ∈ {kept, dup_batch, dup_bloom},
    *         pinned before the filter state advanced
    */
  def gateParagraphs(spark: SparkSession, pars: DataFrame, idCol: String,
      indexRoot: String, cfg: Config = Config(),
      h1: Column => Column = xxhash64(_),
      h2: Column => Column = c => xxhash64(lit("bff"), c),
      compactOver: Int = 64): DataFrame = {
    // eagerly pinned (lineage truncation): the gate runs ~6 actions over
    // these two frames; with cache() each action re-analyzed the full
    // paragraph-split subtree
    val hashed = pars
      .select(col(idCol), col("par_idx"), col("par"),
        h1(col("par")).as("h1"), h2(col("par")).as("h2"))
      .localCheckpoint(true)
    // one row per distinct paragraph: min-(doc,offset) witness + probes
    val perPar = hashed
      .groupBy(col("h1"), col("h2"))
      .agg(min(struct(col(idCol), col("par_idx"))).as("w"))
      .withColumn("ps", positions(col("h1"), col("h2"), cfg))
      .localCheckpoint(true)
    val index = new graft.sinks.SnapshotTable(spark, indexRoot)
    val withBloom =
      if (!index.exists) perPar.withColumn("dup_bloom", lit(false))
      else {
        val probe = perPar.select(col("h1"), col("h2"), explode(col("ps")).as("pos"))
        val hits = probe
          .join(index.readForKeys(probe.select(col("pos")), "pos").select(col("pos")),
            Seq("pos"), "left_semi")
          .groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("n_hit"))
        perPar.join(hits, Seq("h1", "h2"), "left")
          .withColumn("dup_bloom", coalesce(col("n_hit"), lit(0L)) === size(col("ps")))
          .drop("n_hit")
      }
    // pin verdicts BEFORE the filter advances: a lazily re-evaluated plan
    // probing post-insert state would see its own survivors as dups
    val out = hashed
      .join(withBloom, Seq("h1", "h2"))
      .select(col(idCol), col("par_idx"), col("par"),
        when(struct(col(idCol), col("par_idx")) =!= col("w"), lit("dup_batch"))
          .when(col("dup_bloom"), lit("dup_bloom"))
          .otherwise(lit("kept")).as("verdict"))
      .localCheckpoint(true)
    // survivors extend the filter; a rejected paragraph never does
    index.insertIfAbsent(
      withBloom.filter(!col("dup_bloom"))
        .select(explode(col("ps")).as("pos"), col("w").getField(idCol).as("witness_id")),
      "pos", col("witness_id"))
    index.compact(compactOver): Unit
    // the verdict frame is pinned on its own; the working pins are fully
    // consumed — release them so a per-batch loop does not accumulate
    // one paragraph plane per gate call until driver GC
    hashed.unpersist(blocking = false)
    perPar.unpersist(blocking = false)
    out
  }

  /** Full pipeline over (idCol, textCol) documents: split → gate →
    * rebuild. Returns one row per input document: (idCol, kept_text =
    * surviving paragraphs re-joined with '\n' in original order, n_pars,
    * n_kept, n_dup_batch, n_dup_bloom); a document whose every paragraph
    * died comes back with kept_text = ''. */
  def bloomParagraphDedup(spark: SparkSession, batch: DataFrame,
      idCol: String, textCol: String, indexRoot: String,
      cfg: Config = Config(),
      h1: Column => Column = xxhash64(_),
      h2: Column => Column = c => xxhash64(lit("bff"), c),
      sepRegex: String = "\n",
      compactOver: Int = 64): DataFrame = {
    val id = col(idCol)
    val verdicts = gateParagraphs(spark,
      paragraphs(batch, idCol, textCol, sepRegex), idCol, indexRoot, cfg,
      h1, h2, compactOver)
    val rebuilt = verdicts.groupBy(id).agg(
      array_join(
        transform(
          // sort_array (native struct ordering), not array_sort: the
          // default array_sort comparator is an interpreted lambda per
          // comparison; (par_idx, par) natural order is the same order
          sort_array(collect_list(
            when(col("verdict") === "kept", struct(col("par_idx"), col("par"))))),
          x => x.getField("par")),
        "\n").as("kept_text"),
      count(lit(1)).as("n_pars"),
      sum(when(col("verdict") === "kept", 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("verdict") === "dup_batch", 1L).otherwise(0L)).as("n_dup_batch"),
      sum(when(col("verdict") === "dup_bloom", 1L).otherwise(0L)).as("n_dup_bloom"))
    batch.select(id).distinct()
      .join(rebuilt, Seq(idCol), "left")
      .select(id,
        coalesce(col("kept_text"), lit("")).as("kept_text"),
        coalesce(col("n_pars"), lit(0L)).as("n_pars"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dup_batch"), lit(0L)).as("n_dup_batch"),
        coalesce(col("n_dup_bloom"), lit(0L)).as("n_dup_bloom"))
  }
}
