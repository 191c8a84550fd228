package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Production-scale dedup operators for training-data pipelines. These are
 * the xxhash64-powered variants (codegen'd, 64-bit, skew-aware); the
 * cross-engine oracle-checked semantics live in graft.queries (portable
 * 30-bit polynomial hash).
 *
 * Scale notes (100 TB):
 *  - exact dedup groups by a 64-bit content hash, never by the full text
 *    (shuffle carries 8-byte keys + doc ids, not bodies);
 *  - MinHash/LSH shuffles only (band_hash, doc_id) pairs — band buckets
 *    are the classic near-dup join that avoids the O(n²) self-join;
 *  - hot band buckets (boilerplate pages) are capped by `maxBucketSize`
 *    before the pair expansion — a bucket of b docs emits b²/2 pairs, so
 *    one degenerate bucket otherwise dominates the job.
 */
object Dedup {

  private def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingle hashes (distinct) — 64-bit, one native loop per
    * document (graft.functions.XxShingleHashes; identical output to the
    * round-1 transform/element_at composition, ~100x faster because the
    * token array is scanned once instead of re-split per element). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    graft.functions.HashFns.xxShingleHashes(tokens(text), n)

  /** Exact dedup: one keeper row per identical content; returns
    * (doc_id, canonical_doc, n_copies) for every input row. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = df.select(col(idCol), xxhash64(col(textCol)).as("content_hash"))
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    h.withColumn("canonical_doc", first(col(idCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("n_copies", count(lit(1)).over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(idCol), col("canonical_doc"), col("n_copies"))
  }

  private def $(s: String): Column = org.apache.spark.sql.functions.col(s)

  /** MinHash signature columns m0..m{k-1} for a text column — ONE native
    * pass per document (HashImpl.minhashSig: the same pmod permutation
    * minima, bit-identical), where the round-1 form exploded every
    * shingle and re-aggregated per doc: a corpus-sized (hash, id)
    * exchange bought nothing, since the signature is a pure per-row
    * function of the document. Rows with no shingles (fewer than 3
    * tokens) are dropped by the cheap token-count predicate — pushable
    * to the scan — exactly the rows the explode used to eliminate. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16): DataFrame = {
    val sig = df
      // the <3-token gate runs on the native counting scan (tokenCount),
      // not on size(split(...)): a split-based predicate pushes a SECOND
      // whole-text split per row to the scan (§4.4 duplication in filter
      // form) — the counter allocates nothing
      .filter(TextStats.tokenCount(col(textCol)) >= 3)
      .select(col(idCol), graft.functions.HashFns.minhashSig(
        shingleHashes(col(textCol)), numHashes).as("__sig"))
    sig.select(col(idCol) +:
      (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"m$i")): _*)
  }

  /** MinHash-LSH near-dup candidate pairs: signatures banded `bands` ways;
    * docs sharing any band bucket become candidates. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val sig = minhashSignature(df, idCol, textCol, numHashes)
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", (0 until rows).map(r => $(s"m${b * rows + r}")): _*)).as("bv")))
    val banded = sig.select(col(idCol).as("doc"), explode(array(bandCols: _*)).as("x"))
      .select(col("doc"), col("x.band"), col("x.bv"))
    // skew guard: drop degenerate buckets
    val sized = banded.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bv"))))
      .filter(col("bucket_n") <= maxBucketSize)
    sized.as("l").join(sized.as("r"),
        $("l.band") === $("r.band") && $("l.bv") === $("r.bv") && $("l.doc") < $("r.doc"))
      .select($("l.doc").as("doc_a"), $("r.doc").as("doc_b"))
      .distinct()
  }

  /** Exact word-shingle Jaccard for given pairs (verification stage after
    * LSH candidate generation). The pair set is pinned ONCE (eager
    * localCheckpoint — it is consumed three times below: two candidate-id
    * filters and the join itself, and near-dup candidates are tiny next
    * to the corpus), then each shingle side is pre-filtered to candidate
    * docs BEFORE shingle hashing — verifying k pairs must cost O(k)
    * shingle passes, not two full corpus hash scans (guide §8: decide
    * with small rows, touch the heavy bytes only for survivors). */
  def jaccardFor(pairs: DataFrame, df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val p = pairs.localCheckpoint(true)
    def side(c: String) = df
      .join(p.select(col(c).as(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol).as(c), shingleHashes(col(textCol)).as(s"sh_$c"))
    p
      .join(side("doc_a"), "doc_a")
      .join(side("doc_b"), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_doc_a"), col("sh_doc_b"))).cast("double") /
          size(array_union(col("sh_doc_a"), col("sh_doc_b"))).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard near-dup pairs over RARE shingles — the
    * LSH-free exact form (q23). Shingles with document frequency >
    * `maxDf` are dropped BEFORE the posting-list self-join: a shingle in
    * f documents emits f² join rows, so one hot boilerplate n-gram would
    * otherwise dominate the whole job at scale, while carrying ~no
    * near-dup signal. Jaccard is computed over the capped sets on BOTH
    * sides (sizes too), so the estimate is self-consistent. The df guard
    * is a streaming window count (bounded memory per shingle, unlike a
    * collect_list posting build, which one degenerate shingle OOMs).
    * Shuffles carry (8-byte shingle hash, id) — text never moves. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.25, maxDf: Int = 64,
      shingles: Column => Column = shingleHashes(_, 3)): DataFrame = {
    val all = docs.select(col(idCol), explode(shingles(col(textCol))).as("sh"))
    postingJaccardPairs(all, idCol, "sh", threshold, maxDf)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Posting-list set-Jaccard core shared by [[ngramJaccardPairs]] (text
    * shingles) and `Multimodal.videoNearDupPairs` (frame fingerprints):
    * df cap (streaming window count, bounded memory per key) → per-id set
    * sizes → equi self-join on the key → per-pair intersection counts →
    * Jaccard over the capped sets on both sides (self-consistent, rounded
    * to 4 decimals so the driver gate never rides a raw-double last bit).
    * Emits (doc_a, doc_b, inter, jaccard); shuffles carry (key, id). */
  private[ops] def postingJaccardPairs(posting: DataFrame, idCol: String,
      keyCol: String, threshold: Double, maxDf: Int): DataFrame = {
    val rare = posting
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))))
      .filter(col("df") <= maxDf).drop("df")
    val sizes = rare.groupBy(idCol).agg(count(lit(1)).as("n_keys"))
    val pairs = rare.as("x").join(rare.as("y"),
        col(s"x.$keyCol") === col(s"y.$keyCol") && col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed(idCol, "doc_a").withColumnRenamed("n_keys", "na"), "doc_a")
      .join(sizes.withColumnRenamed(idCol, "doc_b").withColumnRenamed("n_keys", "nb"), "doc_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over token hashes — single native pass per document
    * (graft.functions.SimHash64Expr). Round 1 ran 64 interpreted aggregate
    * folds per row, each re-hashing every token. */
  def simhash64(text: Column): Column =
    graft.functions.HashFns.simhash64(tokens(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs over PRECOMPUTED signatures: multi-index
    * pigeonhole blocking, generalized to multi-block indexes (the
    * multi-index Hamming scheme of Manku et al., WWW'07). The signature's
    * low `bits` split into `maxHamming + agreeBlocks` contiguous blocks
    * (widths differing by at most 1): a pair within Hamming distance
    * `maxHamming` differs in at most `maxHamming` blocks, so it agrees
    * exactly on at least `agreeBlocks` of them — hence on at least one of
    * the C(nBlocks, agreeBlocks) block-subsets used as join keys.
    * Candidate generation is complete for any `agreeBlocks ≥ 1`, and the
    * emitted pairs are verified against the true distance. (The round-2
    * version hard-coded 4 blocks, which only guarantees completeness for
    * distance ≤ 3 — a larger threshold silently dropped qualifying pairs.)
    *
    * `agreeBlocks = 2` trades a wider explode (C(n,2) rows/doc instead of
    * n) for join keys twice as wide: per-bucket size drops from N/2^w to
    * ~N/2^2w, so the candidate-pair volume falls ~2^w/n-fold — the win on
    * clustered corpora where verification dominates (q37 was the bench's
    * most expensive query for exactly that reason).
    *
    * Scale: block selectivity is ~N/2^width per bucket, so at a fixed
    * threshold, wider signatures (64-bit) keep buckets selective as the
    * corpus grows; `maxBucketSize` caps degenerate buckets (boilerplate
    * signatures) before the b² pair expansion, like [[minhashLshPairs]] —
    * pairs inside a dropped bucket are sacrificed knowingly (documented
    * skew guard), never silently. */
  def simhashPairsFor(sigs: DataFrame, idCol: String, sigCol: String,
      bits: Int, maxHamming: Int, maxBucketSize: Int = 10000,
      agreeBlocks: Int = 1): DataFrame = {
    require(agreeBlocks == 1 || agreeBlocks == 2,
      s"agreeBlocks=$agreeBlocks not supported (1 or 2)")
    val nBlocks = maxHamming + agreeBlocks
    require(bits >= 1 && bits <= 64 && nBlocks <= bits,
      s"maxHamming=$maxHamming needs at least ${nBlocks} blocks over $bits bits")
    val bounds = (0 to nBlocks).map(i => i * bits / nBlocks)
    def blockVal(b: Int): Column = {
      val lo = bounds(b)
      val w = bounds(b + 1) - lo
      val maskv = if (w >= 64) -1L else (1L << w) - 1L
      shiftright(col(sigCol), lo).bitwiseAND(maskv)
    }
    val blockCols =
      if (agreeBlocks == 1)
        (0 until nBlocks).map(b => struct(lit(b).as("blk"), blockVal(b).as("bv")))
      else
        // pair-of-blocks keys: block width ≤ ceil(64/3) < 32 bits
        // whenever agreeBlocks = 2 (nBlocks ≥ 3), so two values pack
        // losslessly into one 64-bit bv
        for {
          i <- 0 until nBlocks
          j <- i + 1 until nBlocks
        } yield struct(lit(i * nBlocks + j).as("blk"),
          shiftleft(blockVal(i), 32).bitwiseOR(blockVal(j)).as("bv"))
    val blocks = sigs.select(col(idCol).as("doc"), col(sigCol).as("sig"),
        explode(array(blockCols.toSeq: _*)).as("x"))
      .select(col("doc"), col("sig"), col("x.blk"), col("x.bv"))
    val sized = blocks.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("blk"), col("bv"))))
      .filter(col("bucket_n") <= maxBucketSize)
    // CANONICAL-WITNESS dedup instead of distinct(): a near-dup pair
    // agrees on several index keys and the join emits it once per key —
    // on a clustered corpus that duplicate factor multiplies the
    // distinct()'s shuffle (matches × keys agreeing). Each emitted row
    // carries both signatures, so "is THIS key the pair's first agreeing
    // key?" is a row-local codegen'd predicate on sig_a XOR sig_b: every
    // surviving pair passes for exactly one key and the aggregation
    // shuffle disappears entirely.
    //
    // Interaction with the skew cap: the witness is defined over ALL
    // keys, so a pair whose first-agreeing bucket was dropped as
    // degenerate is sacrificed even if a later agreeing bucket survived
    // (the r3 distinct() kept such pairs). The sacrifice set is still
    // deterministic and documented — decided at the canonical witness —
    // and in practice a boilerplate cluster saturates all of its keys'
    // buckets together.
    val x = $("l.sig").bitwiseXOR($("r.sig"))
    def xBlock(b: Int): Column = {
      val lo = bounds(b)
      val w = bounds(b + 1) - lo
      val maskv = if (w >= 64) -1L else (1L << w) - 1L
      shiftright(x, lo).bitwiseAND(maskv)
    }
    // id of the pair's canonical witness key, -1 if none (unreachable for
    // emitted rows: the join key itself agrees)
    val witness: Column =
      if (agreeBlocks == 1)
        (0 until nBlocks).reverse.foldLeft(lit(-1)) { (acc, b) =>
          when(xBlock(b) === 0L, lit(b)).otherwise(acc)
        }
      else
        (0 until nBlocks).reverse.foldLeft(lit(-1)) { (acc, i) =>
          val secondAgree = (i + 1 until nBlocks).reverse.foldLeft(lit(-1)) { (a2, j) =>
            when(xBlock(j) === 0L, lit(i * nBlocks + j)).otherwise(a2)
          }
          when(xBlock(i) === 0L && secondAgree =!= -1, secondAgree).otherwise(acc)
        }
    sized.as("l").join(sized.as("r"),
        $("l.blk") === $("r.blk") && $("l.bv") === $("r.bv") && $("l.doc") < $("r.doc"))
      // both filters are codegen'd row-local predicates on the joined row:
      // verification and witness-dedup cost no shuffle at all
      .filter($("l.blk") === witness &&
        bit_count(x) <= maxHamming)
      .select($("l.doc").as("doc_a"), $("r.doc").as("doc_b"),
        bit_count($("l.sig").bitwiseXOR($("r.sig"))).cast("long").as("hamming"))
  }

  /** Passage-level duplicate coverage (the distributed re-expression of
    * suffix-array substring dedup, Lee et al. 2021 "Deduplicating Training
    * Data Makes Language Models Better"): a passage is a `w`-token window;
    * a window duplicated across >= `minDocs` distinct documents marks its
    * tokens as duplicated, and each document reports the fraction of its
    * tokens covered by the union of its duplicated windows.
    *
    * Shape per stage (no pair join anywhere — this op is LINEAR where the
    * near-dup ops are quadratic-in-bucket):
    *  1. positional window hashes: one native loop per doc (XxWindowHashes),
    *     posexplode to (doc, pos, h) — the array index is the token offset;
    *  2. duplicated-hash set: distinct (doc, h) [map-side combine collapses
    *     within-doc repeats] -> groupBy(h) count >= minDocs. Shuffle rows
    *     carry 16 bytes, never text;
    *  3. covered tokens: join positions against the dup set on h (AQE
    *     picks broadcast when the dup set is small), then interval-union
    *     per doc via one lag window: contribution = least(w, pos - prev),
    *     first window contributes w. One shuffle keyed by doc id.
    * A boilerplate window shared by millions of docs is ONE group in
    * stage 2 and a 1:1 match in stage 3 — no degenerate-bucket expansion,
    * so no skew cap is needed (unlike the pair generators). */
  def duplicatePassageCoverage(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, minDocs: Int = 2,
      windowHasher: (Column, Int) => Column =
        graft.functions.HashFns.xxWindowHashes): DataFrame = {
    require(w >= 1 && minDocs >= 2)
    val win = df
      .select(col(idCol).as("doc"),
        posexplode(windowHasher(tokens(col(textCol)), w)))
      .toDF("doc", "pos", "h")
    val dup = win.select(col("doc"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("h"))
    val covered = win.join(dup, "h")
      .withColumn("prev", lag(col("pos"), 1)
        .over(Window.partitionBy(col("doc")).orderBy(col("pos"))))
      .withColumn("contrib", least(lit(w), col("pos") - coalesce(col("prev"), col("pos") - w)))
      .groupBy(col("doc")).agg(sum(col("contrib")).as("dup_tokens"))
    df.select(col(idCol).as("doc"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(covered, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_fraction"))
  }

  /** Incremental cross-batch exact dedup: keep only the rows of `batch`
    * whose content is NOVEL — absent from the persisted corpus hash index
    * AND first (min id) among identical contents within the batch — then
    * fold the survivors' hashes into the index, so the next batch dedups
    * against everything ever accepted. This is the op a rolling crawl
    * pipeline runs per ingestion batch; re-running global dedup over the
    * accumulated corpus (O(corpus) per batch) does not survive 100 TB.
    *
    * Scale shape: the index is a graft.sinks.SnapshotTable bucketed by
    * the content hash, so the membership anti-join reads ONLY the buckets
    * the batch's hashes land in (never the whole index), and the index
    * write is a fast-append of the novel keys. Shuffles carry
    * (hash, id) — bodies never move. The hash is pluggable for the
    * cross-engine oracle (q53); production uses xxhash64.
    *
    * Determinism: within-batch ties break on min id; index insertion is
    * idempotent (insertIfAbsent), so replaying a batch after a crash
    * cannot double-admit. Admission is AT-MOST-ONCE by default: a crash
    * after the index advance but before the caller consumed the returned
    * survivors loses them (the replay sees their hashes in the index).
    * For exactly-once, pass `persistSurvivors` — it runs on the pinned
    * survivor set BEFORE the index advances, so the durable write and
    * the index move in write-ahead order.
    *
    * `replayStable = true` upgrades replay semantics from at-most-once to
    * REPLAY-EXACT: a row whose content hash is already indexed still
    * survives when the index's witness is the row ITSELF (ids are unique
    * corpus-wide, so only the original admission can match) — re-running
    * the same batch after a crash between the index advance and the
    * output commit reproduces the original survivor set instead of an
    * empty one. This is the mode the streaming foreachBatch sink
    * ([[graft.streaming.Streams.streamingIncrementalDedup]]) pairs with
    * batch-id-keyed overwrite for an exactly-once survivor log. Fresh
    * (non-replayed) batches are unaffected: a different doc with the
    * same content has a different id and still dies in the gate. */
  def dedupIncremental(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String, indexRoot: String,
      contentHash: Column => Column = xxhash64(_),
      persistSurvivors: DataFrame => Unit = _ => (),
      compactOver: Int = 64,
      replayStable: Boolean = false): DataFrame = {
    val hashed = batch.select(col(idCol), contentHash(col(textCol)).as("content_hash"))
    // within-batch first-wins (min id per identical content)
    // eager localCheckpoint, not cache: read by the bucket probe, the
    // anti-join, and the output — and each of those is a separate ACTION
    // whose full upstream plan (batch synthesis, hashing, groupBy) would
    // otherwise be re-analyzed per action; truncating lineage here makes
    // every downstream re-plan a trivial scan (measured: about half of
    // the incremental-gate queries' wall time was driver planning gaps
    // between 20-150 ms jobs)
    val firstWins = hashed.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol))
      .localCheckpoint(true)
    val index = new graft.sinks.SnapshotTable(spark, indexRoot)
    val novel =
      if (!index.exists) firstWins
      else if (replayStable)
        firstWins.join(
          index.readForKeys(firstWins.select(col("content_hash")), "content_hash")
            .select(col("content_hash"), col("witness_id").as("__wit")),
          Seq("content_hash"), "left")
          .filter(col("__wit").isNull || col("__wit") === col(idCol))
          .drop("__wit")
      else firstWins.join(
        index.readForKeys(firstWins.select(col("content_hash")), "content_hash")
          .select(col("content_hash")),
        Seq("content_hash"), "left_anti")
    // localCheckpoint, not cache: the survivor set must stay CORRECT even
    // after storage eviction — a cached plan re-evaluated after the index
    // advance would anti-join against the updated index and come back
    // empty. Eager checkpoint also pins the verdict before the advance.
    val out = novel.select(col(idCol), col("content_hash"))
      .localCheckpoint(true)
    persistSurvivors(out) // write-ahead: durable consumer before the index moves
    index.insertIfAbsent(
      out.select(col("content_hash"), col(idCol).as("witness_id")),
      "content_hash", col("witness_id"))
    // fast-append maintenance: each batch adds one data version to its
    // touched buckets; without periodic compaction a 10^4-batch crawl
    // makes every probe union 10^4 parquet dirs per bucket. The no-op
    // path is one manifest read.
    index.compact(compactOver): Unit
    // firstWins is fully consumed (out is pinned on its own) — release
    // it so a per-batch ingestion loop does not accumulate pins
    firstWins.unpersist(blocking = false)
    out
  }

  /** Incremental NEAR-dup gate over pre-banded LSH signatures: the
    * rolling-crawl twin of [[dedupIncremental]] for near-duplicates.
    * `banded` is (idCol, band, bv) — one row per document per LSH band
    * (from MinHash banding or any locality-sensitive bucketing). Each
    * document reports how many of its band values already exist in the
    * persisted index and the minimum prior witness; documents with zero
    * hits are the batch's near-dup survivors, and ONLY their band values
    * fold into the index (a rejected near-dup must not become a witness).
    *
    * Scale shape: the index is a SnapshotTable bucketed by
    * xxhash64(band, bv), so the probe reads only the batch's buckets
    * (readForKeys) and the update is a fast-append of novel keys with a
    * deterministic min-id witness per key (insertIfAbsent ord). Shuffles
    * carry (8-byte key, id); signatures and text never move. A band-key
    * hash collision couples two buckets — strictly more conservative
    * (extra hit), never a miss. Replay after a crash is idempotent.
    *
    * Within-batch near-dups are NOT chained here (order-dependent);
    * run [[minhashLshPairs]] inside the batch first — this op gates the
    * batch against the accumulated corpus.
    *
    * Admission is AT-MOST-ONCE by default (same contract as
    * [[dedupIncremental]]): pass `persistGate` to durably consume the
    * pinned gate verdict BEFORE the index advances (write-ahead order)
    * when exactly-once matters. */
  def lshIncrementalFor(spark: org.apache.spark.sql.SparkSession,
      batchIds: DataFrame, banded: DataFrame, idCol: String,
      indexRoot: String,
      persistGate: DataFrame => Unit = _ => (),
      compactOver: Int = 64): DataFrame = {
    // eager localCheckpoint, not cache — see dedupIncremental's
    // firstWins note (lineage truncation for the multi-action gate)
    val keyed = banded
      .select(col(idCol), xxhash64(col("band"), col("bv")).as("band_key"))
      .localCheckpoint(true)
    val index = new graft.sinks.SnapshotTable(spark, indexRoot)
    val hitAgg =
      if (!index.exists)
        keyed.select(col(idCol)).limit(0)
          .withColumn("hit_bands", lit(0L)).withColumn("witness", lit(null).cast("long"))
      else keyed
        .join(index.readForKeys(keyed.select(col("band_key")), "band_key"),
          Seq("band_key"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("hit_bands"), min(col("witness_id")).as("witness"))
    // localCheckpoint, not cache: see dedupIncremental — an evicted plan
    // re-evaluated after the index advance would gate against the updated
    // index (every survivor would suddenly hit its own bands)
    val out = batchIds.select(col(idCol))
      .join(hitAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("hit_bands"), lit(0L)).as("hit_bands"),
        col("witness"))
      .localCheckpoint(true)
    persistGate(out) // write-ahead: durable consumer before the index moves
    val survivors = out.filter(col("hit_bands") === 0L).select(col(idCol))
    index.insertIfAbsent(
      keyed.join(survivors, Seq(idCol))
        .select(col("band_key"), col(idCol).as("witness_id")),
      "band_key", col("witness_id"))
    index.compact(compactOver): Unit // see dedupIncremental
    // keyed is fully consumed (the gate verdict is pinned on its own)
    keyed.unpersist(blocking = false)
    out
  }

  /** Production MinHash LSH band rows (idCol, band, bv) — the shared
    * banding of [[lshIncremental]] and [[Splits.crossSplitLeakPairs]]:
    * `numHashes` signature columns folded into `bands` xxhash64 band
    * values. */
  def bandValues(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val sig = minhashSignature(df, idCol, textCol, numHashes)
    sig.select(col(idCol), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",", (0 until rows).map(r => $(s"m${b * rows + r}")): _*)).as("bv"))): _*)).as("x"))
      .select(col(idCol), col("x.band"), col("x.bv"))
  }

  /** [[lshIncrementalFor]] with the production MinHash banding
    * ([[minhashSignature]], xxhash64 shingles). */
  def lshIncremental(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String, indexRoot: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame =
    lshIncrementalFor(spark, batch.select(col(idCol)),
      bandValues(batch, idCol, textCol, numHashes, bands), idCol, indexRoot)

  /** SimHash near-dup pairs from text: 64-bit xxhash SimHash + pigeonhole
    * blocking (block count derived from `maxHamming`), verified distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000,
      agreeBlocks: Int = 1): DataFrame =
    simhashPairsFor(
      df.select(col(idCol), simhash64(col(textCol)).as("simhash_sig")),
      idCol, "simhash_sig", bits = 64, maxHamming = maxHamming,
      maxBucketSize = maxBucketSize, agreeBlocks = agreeBlocks)
}
