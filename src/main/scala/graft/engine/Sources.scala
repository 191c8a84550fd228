package graft.engine

import graft.fetch.Fetcher
import graft.model.{Document, FetchResult}
import graft.urls.UrlCanon
import org.apache.spark.sql.{Dataset, SparkSession}

import java.time.LocalDate

/**
 * Frontier seeding and cursor sources (SURVEY.md §2.1 S1-S8).
 *
 * S1/S2 are plain seed lists; S3 enumerates dates; S4/S5 are *stateful*
 * cursor sources: the cursor lives in driver state, each wave fetches a
 * deterministic id batch in parallel, and the stop condition is evaluated
 * on the wave's collected (seq, status) pairs — bodies stay distributed
 * (order-sensitive run of failures — R20). Cursor
 * positions are persisted by the caller via the engine checkpoint
 * (`cursors` table, FIXTURES.md §2).
 */
object Sources {

  /** Frontier-row meta key carrying a revalidation validator (S14): the
    * fetch path sends a conditional request for rows stamped with it —
    * see [[graft.fetch.Fetcher.fetchConditional]] and
    * [[graft.ops.Revalidate]]. */
  val IfHashKey: String = "if_hash"

  /** S14 — refresh-crawl seeds from a [[graft.ops.Revalidate.plan]]
    * result (url, mode, if_hash): `conditional` rows carry their stored
    * validator in [[IfHashKey]] meta (the fetch becomes an If-None-Match
    * round trip — unchanged pages come back as body-less 304 rows);
    * `full` rows (no usable history) seed ordinary fetches. The collect
    * is the engine's existing Seq-seed boundary and is sized by the DUE
    * subset of the schedule — the point of adaptive recrawl is that this
    * is orders of magnitude smaller than the frontier (stable pages are
    * not due at all; see [[graft.ops.Recrawl]]). */
  def revalidatingSeeds(plan: org.apache.spark.sql.DataFrame,
      parseFn: String = "follow_links", priority: Int = 0): Seq[SeedSpec] =
    plan.select("url", "mode", "if_hash").collect().toSeq.map { r =>
      val meta =
        if (r.getString(1) == "conditional" && !r.isNullAt(2))
          Map(IfHashKey -> r.getLong(2).toString)
        else Map.empty[String, String]
      SeedSpec(r.getString(0), parseFn, meta, priority)
    }

  /** S1 — per-diet seed URL from a template with a `%d` slot
    * (e.g. /root/reference/crawler/spiders/shugiin_spider.py:22-24). */
  def perDietSeed(template: String, dietNumber: Int, parseFn: String): SeedSpec =
    SeedSpec(template.format(dietNumber), parseFn)

  /** S3 — one URL per day in [start, end)
    * (/root/reference/crawler/spiders/shugiin_tv_spider.py:19-32). */
  def dateRangeSeeds(template: String, start: LocalDate, end: LocalDate,
      parseFn: String): Seq[SeedSpec] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(end))
      .map(d => SeedSpec(template.format(d.toString), parseFn)).toSeq

  /** S8 — newline-delimited URL file
    * (/root/reference/crawler/spiders/__init__.py:243-248). */
  def urlFileSeeds(spark: SparkSession, path: String, parseFn: String): Seq[SeedSpec] =
    spark.read.textFile(path).collect().toSeq
      .map(_.trim).filter(u => u.nonEmpty && !u.startsWith("#"))
      .map(SeedSpec(_, parseFn))

  /** `fetched` stays a distributed Dataset (cached per wave): only the
    * (seq, status) pairs ever reach the driver for the R20 stop scan, so
    * page bodies/spans never ride a collect — at a 10^6-id cursor range
    * the driver holds 16 bytes/id, not the corpus. Call [[release]] once
    * `fetched` has been materialized (written/consumed): the per-wave
    * cache blocks otherwise live until the session stops. */
  final case class CursorResult(
      fetched: Dataset[FetchResult],
      finalCursor: Long,
      stoppedByFailures: Boolean,
      retained: Seq[Dataset[FetchResult]] = Nil) {
    def release(): Unit = retained.foreach(_.unpersist(blocking = false))
  }

  /**
   * S4 + R20 — sequential-id cursor source: fetch template%id for
   * id = start, start+1, …; stop after `failureLimit` consecutive
   * failures *in id order* or at `maxId`
   * (/root/reference/crawler/spiders/sangiin_tv_spider.py:17-29,47-72,
   * failure_in_row_limit=10; vrsdd 404s are data, not errors:
   * vrsdd_member_spider.py:28-29).
   *
   * Each wave fetches `batchSize` ids in parallel; the trailing-failure
   * run is computed on the id-sorted wave results, so the *observable*
   * stop point equals the reference's sequential scan.
   */
  def sequentialIdCrawl(
      spark: SparkSession,
      fetcher: Fetcher,
      template: String,
      startId: Long,
      batchSize: Int = 64,
      failureLimit: Int = 10,
      maxId: Long = Long.MaxValue,
      partitions: Int = 8): CursorResult = {
    import spark.implicits._
    val waves = scala.collection.mutable.ArrayBuffer[Dataset[FetchResult]]()
    val persisted = scala.collection.mutable.ArrayBuffer[Dataset[FetchResult]]()
    var cursor = startId
    var trailingFailures = 0
    var stopped = false

    while (!stopped && cursor <= maxId) {
      val hi = math.min(cursor + batchSize - 1, maxId)
      val f = fetcher
      val tmpl = template
      val wave = spark.range(cursor, hi + 1)
        .repartition(partitions)
        .map { id =>
          val url = tmpl.format(id)
          val canon = UrlCanon.canonicalize(url)
          val (status, doc) = f.fetch(url)
          FetchResult(url, canon, UrlCanon.urlHash(canon), UrlCanon.hostOf(canon),
            0, "cursor", Map("id" -> id.toString), 0, id, status,
            from_cache = false, fetched_at_ms = 0L, stored_at_ms = 0L, slot = 0, partition_id = 0,
            doc_id = doc.map(_.doc_id).getOrElse(canon),
            spans = doc.map(_.spans).getOrElse(Nil))
        }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // only (seq, status) reaches the driver — materializes the wave
      // cache, so each id is fetched exactly once
      val statuses = wave.map(r => (r.seq, r.status)).collect().sortBy(_._1)

      // order-sensitive scan for the failure run (R20)
      var stopAt = -1L
      for ((seq, status) <- statuses if stopAt < 0) {
        if (status >= 200 && status < 300) trailingFailures = 0
        else {
          trailingFailures += 1
          if (trailingFailures >= failureLimit) stopAt = seq
        }
      }
      if (stopAt >= 0) { stopped = true; cursor = stopAt + 1 }
      else cursor = hi + 1
      // the reference's sequential scan never looks past the stop id
      val bound = if (stopAt >= 0) stopAt else Long.MaxValue
      persisted += wave // the cached dataset (release() target)
      waves += wave.filter(r => r.ok && r.seq < bound)
    }
    val fetched = waves.reduceOption(_ union _)
      .getOrElse(spark.emptyDataset[FetchResult])
    CursorResult(fetched, cursor, stopped, persisted.toSeq)
  }

  /**
   * S6 — numbered-page pagination: fetch page n, collect its article
   * links, advance the page counter until the collected count reaches
   * `limit` or a page fails
   * (/root/reference/crawler/spiders/nikkei_spider.py:24-41 — `?bn=N`
   * advancing by 20; reuters_spider.py:25-40 — `&page=N` advancing by 1).
   * The caller encodes the counter arithmetic in `urlOf`.
   */
  def numberedPageCrawl(
      fetcher: Fetcher,
      urlOf: Long => String,
      linksOf: Document => Seq[String],
      limit: Int,
      start: Long = 1L,
      step: Long = 1L,
      maxPages: Int = 100000): (Seq[String], Long) = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var page = start
    var pages = 0
    var stopped = false
    while (!stopped && out.length < limit && pages < maxPages) {
      val (status, doc) = fetcher.fetch(urlOf(page))
      if (status >= 200 && status < 300 && doc.isDefined) {
        out ++= linksOf(doc.get)
        page += step
        pages += 1
      } else stopped = true
    }
    (out.toSeq, page)
  }

  /**
   * S5 — cursor-paginated API: fetch page at `cursor`, extract the next
   * cursor from the page via `nextCursorOf`, repeat until None
   * (kokkai API `nextRecordPosition`,
   * /root/reference/crawler/spiders/minutes_spider.py:37-42,90-92).
   * Pages are inherently sequential (each cursor comes from the previous
   * response) — parallelism in the reference workload comes from the
   * per-meeting parse fan-out, not pagination.
   */
  def cursorPagedCrawl(
      fetcher: Fetcher,
      urlOf: Long => String,
      nextCursorOf: Document => Option[Long],
      start: Long = 1L,
      maxPages: Int = 100000): (Seq[Document], Long) = {
    val out = scala.collection.mutable.ArrayBuffer[Document]()
    var cursor: Option[Long] = Some(start)
    var pages = 0
    var last = start
    while (cursor.isDefined && pages < maxPages) {
      val (status, doc) = fetcher.fetch(urlOf(cursor.get))
      last = cursor.get
      cursor = if (status >= 200 && status < 300 && doc.isDefined) {
        out += doc.get
        nextCursorOf(doc.get)
      } else None
      pages += 1
    }
    (out.toSeq, last)
  }
}
