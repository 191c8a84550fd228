package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Content-addressed store for the crawl's binary media plane (north rule:
 * "Iceberg tables of interleaved text + media documents") — the sink
 * behind `CrawlConfig.mediaStoreDir`. Two bucketed snapshot tables:
 *
 *  - `blobs`  — one row per distinct CONTENT, keyed by `content_hash` =
 *    md5(bytes) (128-bit; the same collision posture as git's
 *    content addressing). Payload: the bytes, media type, size, and the
 *    first-discovery witness URL. A real site serves the same logo /
 *    shared PDF from thousands of pages — those fetches collapse to one
 *    stored blob.
 *  - `refs`   — one row per distinct media URL (`canonical`), recording
 *    which content that URL served (+ wave/seq discovery lineage). The
 *    URL plane answers "what did /img/logo.png contain"; the blob plane
 *    answers "store each distinct content once".
 *
 * Scale discipline (10^10-URL crawls):
 *  - bytes cross the wire ONCE: the per-wave ingest groupBy(content_hash)
 *    partially aggregates map-side (duplicate payloads collapse per
 *    partition before the shuffle), and
 *    [[SnapshotTable.insertIfAbsent]]'s anti-join reads only the KEY
 *    column of existing buckets — stored bytes are never re-read, never
 *    re-shuffled;
 *  - commits touch only the buckets the batch's hashes land in
 *    (fast-append; untouched buckets' files are byte-identical after an
 *    ingest);
 *  - ingest is idempotent: replaying a wave (crash recovery) re-offers
 *    the same keys and the key-plane anti-join drops them all — the
 *    engine calls this per wave with no dedup bookkeeping of its own.
 */
object MediaStore {

  /** First-discovery total order: (seq, canonical) — deterministic winner
    * for one content served by several URLs in one wave. */
  private def discoveryOrd: Column = struct(col("seq"), col("canonical"))

  /** Ingest one wave's fetched rows (page rows pass through untouched —
    * only successful `parse_fn = "media"` rows with bytes are considered).
    * Returns the number of media rows offered (0 = nothing to do; the
    * store is not even opened, so page-only crawls never create it). */
  def ingestWave(spark: SparkSession, fetched: DataFrame, root: String,
      nBuckets: Int = 16, compactOver: Int = 64): Long = {
    val media = fetched
      .filter(col("parse_fn") === graft.model.SpanKind.Media &&
        col("status") >= 200 && col("status") < 300 && col("media_bytes").isNotNull)
      .select(col("canonical"), col("url_hash"), col("wave"), col("seq"),
        col("media_type"), col("media_bytes"))
      // eagerly pinned: count + two insertIfAbsent consumers, each its own
      // action — lineage truncation keeps re-planning trivial
      .localCheckpoint(true)
    try {
      val n = media.count()
      if (n > 0) {
        val hashed = media
          .withColumn("content_hash", md5(col("media_bytes")))
          .withColumn("size_bytes", length(col("media_bytes")).cast("long"))
        blobsTable(spark, root, nBuckets).insertIfAbsent(
          hashed.select(col("content_hash"), col("media_type"), col("size_bytes"),
            col("media_bytes"), col("canonical").as("witness_canonical"),
            col("wave"), col("seq")),
          "content_hash",
          struct(col("seq"), col("witness_canonical")))
        refsTable(spark, root, nBuckets).insertIfAbsent(
          hashed.select(col("canonical"), col("content_hash"), col("url_hash"),
            col("media_type"), col("size_bytes"), col("wave"), col("seq")),
          "canonical",
          discoveryOrd)
        // per-wave fast-appends accumulate one data version per touched
        // bucket per wave; compact when any bucket's list crosses the
        // threshold (no-op path = one manifest read per table)
        blobsTable(spark, root, nBuckets).compact(compactOver): Unit
        refsTable(spark, root, nBuckets).compact(compactOver): Unit
      }
      n
    } finally
      // fully consumed above — without the release, a per-wave crawl
      // loop pins one batch of media blocks per wave until driver GC
      media.unpersist(blocking = false): Unit
  }

  def blobsTable(spark: SparkSession, root: String, nBuckets: Int = 16): SnapshotTable =
    new SnapshotTable(spark, s"$root/blobs", nBuckets)

  def refsTable(spark: SparkSession, root: String, nBuckets: Int = 16): SnapshotTable =
    new SnapshotTable(spark, s"$root/refs", nBuckets)

  /** The distinct-content plane (one row per stored blob). */
  def blobs(spark: SparkSession, root: String): DataFrame =
    blobsTable(spark, root).read()

  /** The URL plane (one row per distinct media URL ever fetched). */
  def refs(spark: SparkSession, root: String): DataFrame =
    refsTable(spark, root).read()
}
