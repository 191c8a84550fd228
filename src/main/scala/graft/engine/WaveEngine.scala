package graft.engine

import graft.fetch.Fetcher
import graft.model._
import graft.seen.CuckooFilter
import graft.urls.UrlCanon
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** A seed request (reference: spider `start_urls` / seed builders,
  * e.g. /root/reference/crawler/spiders/shugiin_spider.py:22-24). */
final case class SeedSpec(
    url: String,
    parseFn: String = "follow_links",
    meta: Map[String, String] = Map.empty,
    priority: Int = 0)

/** A parse callback: fetched document → follow-up requests. Entity
  * extraction runs separately as batch transforms over the fetched
  * documents table; the engine only needs the frontier expansion here. */
trait PageParser extends Serializable {
  def followUps(doc: Document, meta: Map[String, String]): Seq[FollowUp]
}

/** Default parser — follow every link span (S9). */
object FollowAllLinks extends PageParser {
  def followUps(doc: Document, meta: Map[String, String]): Seq[FollowUp] =
    doc.spans.filter(_.kind == "link").map(s => FollowUp(s.media_ref, "follow_links"))
}

/** Terminal parser — no follow-ups. */
object NoFollow extends PageParser {
  def followUps(doc: Document, meta: Map[String, String]): Seq[FollowUp] = Nil
}

final case class CrawlConfig(
    checkpointDir: String,
    hostBuckets: Int = 64,
    fetchPartitions: Int = 32,
    politenessRps: Double = 1.0, // per host (reference: 1 rps GLOBAL; cross-host parallelism is the whole point)
    maxPerHostPerWave: Int = 256, // politeness budget per wave per host (Int.MaxValue = uncapped fast path)
    realtime: Boolean = false, // actually sleep between same-host fetches
    referenceOrder: Boolean = false, // replay Scrapy's sequential LIFO order exactly
    robotsEnabled: Boolean = false, // reference: ROBOTSTXT_OBEY = False (settings.py:20)
    robotsDisallow: Map[String, Seq[String]] = Map.empty, // host -> path prefixes
    maxWaves: Int = 10000,
    maxUrls: Long = Long.MaxValue,
    // S11 — fetch cache: point at a prior run's `fetched` dir to reuse
    // still-fresh pages instead of re-fetching (reference: filesystem HTTP
    // cache with 600 s TTL, /root/reference/crawler/settings.py:84-86)
    fetchCacheDir: Option[String] = None,
    cacheTtlSec: Long = 600,
    keepFetched: Boolean = true, // write fetched docs table (off for pure-throughput bench)
    checkpointEvery: Int = 1, // durable checkpoint cadence in waves (always at loop exit)
    filterCapacityPerBucket: Int = 1 << 16)

final case class CrawlRunResult(
    waves: Int,
    fetched: Long,
    deduped: Long,
    seen: Long,
    elapsedMs: Long) {
  def urlsPerSec: Double = (fetched + deduped) * 1000.0 / math.max(1, elapsedMs)
}

/** Intermediate: a follow-up candidate before dedup. */
final case class Candidate(
    url: String,
    canonical: String,
    url_hash: Long,
    host: String,
    host_bucket: Int,
    parse_fn: String,
    meta: Map[String, String],
    priority: Int,
    parent_seq: Long,
    emission_idx: Int)

/**
 * The wave-synchronous crawl engine (SURVEY.md §7, north rule).
 *
 * Replaces the reference's single-threaded Twisted reactor loop
 * (Scrapy scheduler + dupefilter + download-delay,
 * /root/reference/crawler/settings.py:23,28) with a partitioned Spark
 * frontier iterated in waves:
 *
 *   pending ─select(politeness budget)─► batch ─repartition(host_bucket)─►
 *   mapPartitions{per-host politeness slots + fetch} ─► fetched
 *   fetched ─flatMap(parser)─► candidates ─canonicalize+cuckoo+anti-join─►
 *   novel ─distributed seq assignment─► pending(wave+1)
 *
 * Dedup semantics = Scrapy's dupefilter: a URL is marked seen when
 * *enqueued* (never enqueued twice); marking is exact (the cuckoo filter
 * is a pre-filter only — no false negatives, positives verified by
 * anti-join against the exact seen table).
 *
 * Scale design (10^10 frontier):
 *  - the seen set lives as host-bucket-sharded cuckoo filters collocated
 *    with their partitions + an exact parquet table; the per-wave
 *    anti-join only sees filter positives;
 *  - seq assignment is a distributed sortBy + zipWithIndex (no
 *    single-partition window);
 *  - the in-memory seen view is a bounded union of per-wave deltas,
 *    truncated to parquet every `checkpointEvery` waves — which is also
 *    the durable resume point (crash replays at most checkpointEvery
 *    waves; wave recomputation is deterministic and idempotent);
 *  - per-partition lineage rows are buffered on the driver (they are
 *    partition-granular, tiny) and flushed with each checkpoint.
 *
 * Ordering contract (SURVEY.md §2.5): `referenceOrder=true` replays
 * Scrapy's deterministic sequential order (start requests in listed
 * order, consumed lazily; follow-ups LIFO) with waves of size 1. The
 * scalable mode relaxes to per-host FIFO by discovery order, preserving
 * the fetched *set* and per-host order across any parallelism level.
 */
class WaveEngine(
    spark: SparkSession,
    fetcher: Fetcher,
    parsers: Map[String, PageParser],
    cfg: CrawlConfig) extends Serializable {

  import spark.implicits._

  private val ckpt = cfg.checkpointDir
  private val urlRecordSchema = org.apache.spark.sql.Encoders.product[UrlRecord].schema
  private val fetchResultSchema = org.apache.spark.sql.Encoders.product[FetchResult].schema
  private val seenSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("url_hash", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("canonical", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("host_bucket", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("wave", org.apache.spark.sql.types.IntegerType)))

  // ------------------------------------------------------------------
  // candidate construction (canonicalize + robots gate)
  // ------------------------------------------------------------------

  private def toCandidates(fetched: Dataset[FetchResult]): Dataset[Candidate] = {
    val parsersB = spark.sparkContext.broadcast(parsers)
    val buckets = cfg.hostBuckets
    val robotsEnabled = cfg.robotsEnabled
    val robots = cfg.robotsDisallow
    fetched.flatMap { fr =>
      if (!fr.ok) Iterator.empty
      else {
        val parser = parsersB.value.getOrElse(fr.parse_fn, FollowAllLinks)
        parser.followUps(fr.document, fr.meta).iterator.zipWithIndex.flatMap { case (f, idx) =>
          val abs = UrlCanon.resolve(fr.url, f.url)
          val canon = UrlCanon.canonicalize(abs)
          val host = UrlCanon.hostOf(canon)
          val allowed = !robotsEnabled || !robots.getOrElse(host, Nil).exists(p =>
            UrlCanon.parse(canon).path.startsWith(p))
          if (!allowed) Iterator.empty
          else Iterator.single(Candidate(
            url = abs, canonical = canon, url_hash = UrlCanon.urlHash(canon),
            host = host, host_bucket = UrlCanon.hostBucket(host, buckets),
            parse_fn = f.parse_fn, meta = f.meta, priority = f.priority,
            parent_seq = fr.seq, emission_idx = idx))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // dedup: within-wave first-discovery + cuckoo pre-filter + exact anti-join
  // ------------------------------------------------------------------

  /** Lazy novel-candidate plan: within-wave first-discovery dedup, cuckoo
    * pre-filter, exact anti-join verification of filter positives. The
    * caller materializes it exactly once (localCheckpoint) and unpersists
    * the returned `flagged` handle afterwards. */
  private def dedupe(
      candidates: Dataset[Candidate],
      seen: DataFrame,
      filtersB: org.apache.spark.broadcast.Broadcast[Map[Int, CuckooFilter]]): (Dataset[Candidate], DataFrame) = {
    // first discovery wins within the wave (deterministic: discovery order;
    // parent_seq values are globally unique so the order is total)
    val w = Window.partitionBy($"url_hash").orderBy($"parent_seq", $"emission_idx")
    val unique = candidates
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .as[Candidate]

    // cuckoo pre-filter: definitely-new rows skip the anti-join entirely
    val flagged = unique.map { c =>
      (c, filtersB.value.get(c.host_bucket).exists(_.contains(c.url_hash)))
    }.toDF("c", "maybe_seen")
    flagged.cache() // shared by both branches below within one job
    val definiteNew = flagged.filter(!$"maybe_seen").select($"c.*").as[Candidate]
    val maybeSeen = flagged.filter($"maybe_seen").select($"c.*").as[Candidate]
    // exact verification for the filter positives
    val verifiedNew = maybeSeen.join(seen.select("url_hash"), Seq("url_hash"), "left_anti")
      .as[Candidate]
    (definiteNew.unionByName(verifiedNew), flagged)
  }

  /** Distributed per-bucket cuckoo update: each bucket's novel hashes are
    * grouped to one task which folds them (sorted — deterministic filter
    * bytes) into that bucket's filter; the driver collects only the ~B
    * small filter blobs, never the URLs. */
  private def updateFilters(
      novel: DataFrame, // needs host_bucket + url_hash columns
      filters: Map[Int, CuckooFilter]): Map[Int, CuckooFilter] = {
    val filtersB = spark.sparkContext.broadcast(filters)
    val capacity = cfg.filterCapacityPerBucket
    val updated = novel
      .select($"host_bucket", $"url_hash")
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (bucket, it) =>
        val f = filtersB.value.get(bucket) match {
          case Some(existing) => CuckooFilter.deserialize(existing.serialized) // copy
          case None => new CuckooFilter(capacity)
        }
        it.map(_._2).toArray.sorted.foreach(f.insert)
        (bucket, f.serialized)
      }
      .collect()
      .map { case (b, bytes) => b -> CuckooFilter.deserialize(bytes) }
      .toMap
    filters ++ updated
  }

  // ------------------------------------------------------------------
  // wave batch selection (politeness budget / reference order)
  // ------------------------------------------------------------------

  /** Splits pending into (batch, deferred). Scalable mode: per host, first
    * `maxPerHostPerWave` by (priority desc, seq asc). Reference mode:
    * exactly one row — Scrapy's next pop: any non-seed by (priority desc,
    * seq desc) [LIFO], else the lowest-seq seed (start requests are
    * consumed lazily, in listed order); a seed whose fingerprint was
    * already enqueued via a follow-up is dupefiltered (dropped). */
  private def selectBatch(
      pending: Dataset[UrlRecord],
      seen: DataFrame): (Dataset[UrlRecord], Dataset[UrlRecord]) = {
    if (cfg.referenceOrder) {
      // dupefilter unconsumed seeds that were meanwhile discovered as links
      val live = pending.toDF.join(
        seen.select($"url_hash".as("seen_hash")),
        $"url_hash" === $"seen_hash" && $"is_seed", "left_anti").as[UrlRecord]
      if (live.isEmpty) { // only dupefiltered seeds remained
        val empty = live.filter(lit(false)).as[UrlRecord]
        (empty, empty)
      } else {
        val nonSeed = live.filter(!_.is_seed)
        val pick =
          if (nonSeed.isEmpty) live.orderBy($"seq".asc).limit(1)
          else nonSeed.orderBy($"priority".desc, $"seq".desc).limit(1)
        val pickedSeq = pick.as[UrlRecord].head().seq
        (pending.filter($"seq" === pickedSeq).as[UrlRecord],
          live.filter($"seq" =!= pickedSeq).as[UrlRecord])
      }
    } else if (cfg.maxPerHostPerWave == Int.MaxValue) {
      // uncapped fast path: no per-host ranking shuffle at all
      (pending, pending.filter(lit(false)).as[UrlRecord])
    } else {
      val w = Window.partitionBy($"host").orderBy($"priority".desc, $"seq".asc)
      val ranked = pending.withColumn("rank_in_host", row_number().over(w))
      val batch = ranked.filter($"rank_in_host" <= cfg.maxPerHostPerWave)
        .drop("rank_in_host").as[UrlRecord]
      val deferred = ranked.filter($"rank_in_host" > cfg.maxPerHostPerWave)
        .drop("rank_in_host").as[UrlRecord]
      (batch, deferred)
    }
  }

  // ------------------------------------------------------------------
  // fetch with per-host politeness
  // ------------------------------------------------------------------

  private def fetchBatch(
      batch: Dataset[UrlRecord],
      fetchWave: Int,
      waveStartMs: Long,
      lineageAcc: org.apache.spark.util.CollectionAccumulator[(Int, Long, Long, Long)]): Dataset[FetchResult] = {
    val f = fetcher
    val rps = cfg.politenessRps
    val realtime = cfg.realtime
    batch
      .repartition(cfg.fetchPartitions, $"host_bucket")
      .mapPartitions { it =>
        val rows = it.toArray
        val byHost = rows.groupBy(_.host)
        val pid = TaskContext.getPartitionId()
        var nIn = 0L
        var nOk = 0L
        var nErr = 0L
        val out = byHost.iterator.flatMap { case (_, hostRows) =>
          val ordered = hostRows.sortBy(r => (-r.priority, r.seq))
          ordered.iterator.zipWithIndex.map { case (r, slot) =>
            val plannedMs = waveStartMs + math.round(slot * 1000.0 / rps)
            if (realtime) {
              val now = System.currentTimeMillis()
              if (plannedMs > now) Thread.sleep(plannedMs - now)
            }
            val (status, doc) = f.fetch(r.url)
            nIn += 1
            if (status >= 200 && status < 300) nOk += 1
            if (status >= 400) nErr += 1
            FetchResult(
              url = r.url, canonical = r.canonical, url_hash = r.url_hash,
              host = r.host, host_bucket = r.host_bucket, parse_fn = r.parse_fn,
              meta = r.meta, wave = fetchWave, seq = r.seq, status = status,
              from_cache = false, fetched_at_ms = plannedMs, slot = slot,
              partition_id = pid,
              doc_id = doc.map(_.doc_id).getOrElse(r.canonical),
              spans = doc.map(_.spans).getOrElse(Nil))
          }
        }.toArray // drain so the lineage counters are final before emitting
        lineageAcc.add((pid, nIn, nOk, nErr))
        out.iterator
      }
  }

  // ------------------------------------------------------------------
  // checkpointing (north rule: resumable, per-partition lineage + metrics)
  // ------------------------------------------------------------------

  private def writeState(wave: Int, nextSeq: Long, fetched: Long, deduped: Long): Unit = {
    val json = s"""{"wave":$wave,"next_seq":$nextSeq,"fetched":$fetched,"deduped":$deduped}"""
    Files.writeString(Paths.get(s"$ckpt/state_w$wave.json"), json)
    Files.writeString(Paths.get(s"$ckpt/LATEST"), wave.toString,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
  }

  private def readState(wave: Int): (Long, Long, Long) = {
    val s = Files.readString(Paths.get(s"$ckpt/state_w$wave.json"))
    def field(k: String): Long = s""""$k":(-?\\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    (field("next_seq"), field("fetched"), field("deduped"))
  }

  def latestCheckpointWave: Option[Int] = {
    val p = Paths.get(s"$ckpt/LATEST")
    if (Files.exists(p)) Some(Files.readString(p).trim.toInt) else None
  }

  private def saveFilters(wave: Int, filters: Map[Int, CuckooFilter]): Unit = {
    val out = new java.io.ObjectOutputStream(
      Files.newOutputStream(Paths.get(s"$ckpt/filters_w$wave.bin")))
    out.writeObject(filters.map { case (k, v) => (k, v.serialized) })
    out.close()
  }

  private def loadFilters(wave: Int): Map[Int, CuckooFilter] = {
    val in = new java.io.ObjectInputStream(
      Files.newInputStream(Paths.get(s"$ckpt/filters_w$wave.bin")))
    val m = in.readObject().asInstanceOf[Map[Int, Array[Byte]]]
    in.close()
    m.map { case (k, v) => (k, CuckooFilter.deserialize(v)) }
  }

  /** All durable seen deltas (local-FS checkpoint layout; a cluster
    * deployment would point this at a shared store).
    *
    * IMPORTANT: reads the EXPLICIT (growing) list of flush dirs, never the
    * root path — Spark's CacheManager matches plans by canonicalized form,
    * so a cached read of the constant root path would silently pin the
    * FIRST file-listing snapshot forever and hide newer seen marks from
    * the dedup anti-join. */
  private def seenSoFar(): DataFrame = {
    val dirs = Option(new java.io.File(s"$ckpt/seen").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getPath).sorted
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], seenSchema)
    else spark.read.schema(seenSchema).parquet(dirs.toIndexedSeq: _*)
  }

  // ------------------------------------------------------------------
  // entry points
  // ------------------------------------------------------------------

  def run(seeds: Seq[SeedSpec]): CrawlRunResult = {
    Files.createDirectories(Paths.get(ckpt))
    val buckets = cfg.hostBuckets
    val seedRows = seeds.zipWithIndex.map { case (s, i) =>
      val canon = UrlCanon.canonicalize(s.url)
      val host = UrlCanon.hostOf(canon)
      UrlRecord(s.url, canon, UrlCanon.urlHash(canon), host,
        UrlCanon.hostBucket(host, buckets), s.parseFn, s.meta, s.priority,
        is_seed = true, wave = 0, seq = i.toLong)
    }
    // seed self-dedup (first occurrence wins)
    val distinctSeeds = {
      val seenH = scala.collection.mutable.HashSet[Long]()
      seedRows.filter(r => seenH.add(r.url_hash))
    }
    val pending = spark.createDataset(distinctSeeds)
      .repartition(cfg.fetchPartitions).cache()
    // Scalable mode marks all seeds seen at enqueue (wave 0). Reference mode
    // enqueues start requests lazily (Scrapy): a seed is fingerprinted only
    // when consumed, so a link-discovered copy can pre-empt it.
    var seenView = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], seenSchema)
    var filters: Map[Int, CuckooFilter] = Map.empty
    if (!cfg.referenceOrder) {
      seenView = pending.select($"url_hash", $"canonical", $"host_bucket")
        .withColumn("wave", lit(0)).cache()
      filters = updateFilters(pending.toDF, Map.empty)
    }
    pending.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/pending_w0")
    seenView.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/seen/flush_0")
    saveFilters(0, filters)
    writeState(0, distinctSeeds.length.toLong, 0, 0)
    loop(0, pending, seenView, filters, distinctSeeds.length.toLong, 0L, 0L)
  }

  def resume(): CrawlRunResult = {
    val wave = latestCheckpointWave.getOrElse(
      throw new IllegalStateException(s"no checkpoint under $ckpt"))
    val (nextSeq, fetched, deduped) = readState(wave)
    val pending = spark.read.schema(urlRecordSchema)
      .parquet(s"$ckpt/pending_w$wave").as[UrlRecord].cache()
    val filters = loadFilters(wave)
    loop(wave, pending, seenSoFar().cache(), filters, nextSeq, fetched, deduped)
  }

  // ------------------------------------------------------------------
  // main loop
  // ------------------------------------------------------------------

  private def loop(
      startWave: Int,
      pending0: Dataset[UrlRecord],
      seenView0: DataFrame,
      filters0: Map[Int, CuckooFilter],
      nextSeq0: Long,
      fetched0: Long,
      deduped0: Long): CrawlRunResult = {
    val t0 = System.currentTimeMillis()
    var wave = startWave
    var pending = pending0
    var seenView = seenView0 // in-memory view: last flush + unflushed deltas
    var unflushed = List.empty[DataFrame] // cached per-wave deltas since last flush
    var filters = filters0
    var nextSeq = nextSeq0
    var totalFetched = fetched0
    var totalDeduped = deduped0
    var totalSeen = -1L
    val lineageBuf = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long, Long, Long)]()

    def flushCheckpoint(): Unit = {
      pending.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/pending_w$wave")
      // re-read: truncates the pending plan lineage (it otherwise grows
      // across waves through the deferred branch and OOMs the planner)
      pending.unpersist()
      pending = spark.read.schema(urlRecordSchema)
        .parquet(s"$ckpt/pending_w$wave").as[UrlRecord].cache()
      if (unflushed.nonEmpty) {
        unflushed.reduce(_.unionByName(_)).write.mode(SaveMode.Overwrite)
          .parquet(s"$ckpt/seen/flush_$wave")
        unflushed.foreach(_.unpersist())
        unflushed = Nil
      }
      if (lineageBuf.nonEmpty) {
        spark.createDataset(lineageBuf.toSeq)
          .toDF("wave", "partition_id", "in_count", "fetched", "errors", "deduped_wave", "novel_wave")
          .write.mode(SaveMode.Overwrite).parquet(s"$ckpt/lineage/upto_$wave")
        lineageBuf.clear()
      }
      saveFilters(wave, filters)
      writeState(wave, nextSeq, totalFetched, totalDeduped)
      // truncate the in-memory seen view's plan to the durable data
      val flushedSeen = seenSoFar().cache()
      seenView.unpersist()
      seenView = flushedSeen
    }

    // S11 fetch cache: fresh rows of a prior run's fetched table
    val cacheDF: Option[DataFrame] = cfg.fetchCacheDir.map { dir =>
      val cutoff = System.currentTimeMillis() - cfg.cacheTtlSec * 1000L
      spark.read.schema(fetchResultSchema)
        .option("recursiveFileLookup", "true").parquet(dir)
        .filter($"fetched_at_ms" >= cutoff && $"status" >= 200 && $"status" < 300)
        .select($"url_hash", $"status".as("c_status"),
          $"fetched_at_ms".as("c_fetched_at_ms"), $"doc_id".as("c_doc_id"),
          $"spans".as("c_spans"))
        .dropDuplicates("url_hash")
        .cache()
    }

    var done = pending.isEmpty
    while (!done && wave < cfg.maxWaves && totalFetched < cfg.maxUrls) {
      val tW0 = System.currentTimeMillis()
      val waveStartMs = t0 + (wave.toLong * 1000L) // simulated clock base
      val (batch, deferred) = selectBatch(pending, seenView)

      if (cfg.referenceOrder) {
        // fingerprint the consumed request at schedule time (Scrapy
        // semantics); keep the cuckoo filters in sync with the seen set
        val seedmark = batch.select($"url_hash", $"canonical", $"host_bucket")
          .withColumn("wave", lit(wave)).cache()
        seedmark.count()
        unflushed = unflushed :+ seedmark
        seenView = seenView.unionByName(seedmark)
        filters = updateFilters(batch.toDF, filters)
      }

      // per-partition lineage via accumulator — no dedicated job
      val lineageAcc = new org.apache.spark.util.CollectionAccumulator[(Int, Long, Long, Long)]()
      spark.sparkContext.register(lineageAcc, s"lineage_w$wave")
      // serve cache hits without consuming politeness slots (S11)
      val hitAcc = spark.sparkContext.longAccumulator(s"cache_hits_w$wave")
      val (toFetch, cacheHits) = cacheDF match {
        case None => (batch, None)
        case Some(cache) =>
          val misses = batch.toDF.join(cache.select($"url_hash"), Seq("url_hash"), "left_anti")
            .as[UrlRecord]
          val fw = wave
          val hitResults = batch.joinWith(cache, batch("url_hash") === cache("url_hash"))
            .map { case (r, c) =>
              hitAcc.add(1L)
              FetchResult(r.url, r.canonical, r.url_hash, r.host, r.host_bucket,
                r.parse_fn, r.meta, fw, r.seq,
                status = c.getAs[Int]("c_status"), from_cache = true,
                fetched_at_ms = c.getAs[Long]("c_fetched_at_ms"), slot = -1,
                partition_id = -1, doc_id = c.getAs[String]("c_doc_id"),
                spans = c.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("c_spans")
                  .map(sp => Span(sp.getAs[String]("kind"), sp.getAs[String]("text"),
                    sp.getAs[String]("media_ref"), sp.getAs[Int]("offset"))).toSeq)
            }
          (misses, Some(hitResults))
      }
      val liveFetched = fetchBatch(toFetch, wave, waveStartMs, lineageAcc)
      val fetchedRaw = cacheHits.map(h => liveFetched.unionByName(h)).getOrElse(liveFetched)
      val fetched = if (cfg.keepFetched) {
        val f = fetchedRaw.cache()
        f.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/fetched/wave_$wave")
        f
      } else fetchedRaw // single downstream consumer — no cache needed

      // duplicates collapsed inside the wave + already-seen candidates
      val emittedAcc = spark.sparkContext.longAccumulator("emitted")
      val candidates = toCandidates(fetched).map { c => emittedAcc.add(1L); c }
      val filtersB = spark.sparkContext.broadcast(filters)
      val tD0 = System.currentTimeMillis()
      val (novel, flagged) = dedupe(candidates, seenView, filtersB)
      val tDedupe = System.currentTimeMillis() - tD0

      // Deterministic seq assignment by discovery order. Scalable mode:
      // interleaved per-bucket ranks — seq = base + (rank-1)*B + bucket is
      // globally unique and preserves per-host discovery order with one
      // hash shuffle and no global sort. Reference mode needs the global
      // LIFO total order (tiny batches), so it ranks globally.
      val base = nextSeq
      val w1 = wave + 1
      val nBuckets = cfg.hostBuckets.toLong
      val seqCol =
        if (cfg.referenceOrder)
          lit(base) + row_number().over(
            Window.orderBy($"parent_seq", $"emission_idx")).cast("long") - 1L
        else
          lit(base) + (row_number().over(
            Window.partitionBy($"host_bucket").orderBy($"parent_seq", $"emission_idx"))
            .cast("long") - 1L) * nBuckets + $"host_bucket".cast("long")
      val ordered = novel
        .withColumn("seq", seqCol)
        .withColumn("is_seed", lit(false))
        .withColumn("wave", lit(w1))
        .select($"url", $"canonical", $"url_hash", $"host", $"host_bucket",
          $"parse_fn", $"meta", $"priority", $"is_seed", $"wave", $"seq")
        .as[UrlRecord]
        // eager localCheckpoint: the wave's SINGLE materializing action
        // (fetch → parse → dedup → seq) — also truncates the plan, which
        // otherwise grows into a DAG whose tree rendering is exponential
        .localCheckpoint()
      flagged.unpersist()
      val tS0 = System.currentTimeMillis()
      val novelCount = ordered.count()
      val tSeq = System.currentTimeMillis() - tS0
      nextSeq += (novelCount + 1) * nBuckets
      val fetchedCount = lineageAcc.value.asScala.map(_._2).sum + hitAcc.value
      totalFetched += fetchedCount
      val dedupedCount = emittedAcc.value - novelCount
      totalDeduped += dedupedCount

      lineageAcc.value.asScala.foreach { case (pid, in, ok, err) =>
        lineageBuf += ((wave, pid, in, ok, err, dedupedCount, novelCount))
      }

      // mark novel as seen at enqueue time (Scrapy dupefilter semantics)
      val tDl0 = System.currentTimeMillis()
      val seenDelta = ordered.select($"url_hash", $"canonical", $"host_bucket")
        .withColumn("wave", lit(w1)).cache() // 1-deep off checkpointed `ordered`
      val tDelta = System.currentTimeMillis() - tDl0
      unflushed = unflushed :+ seenDelta
      seenView = seenView.unionByName(seenDelta)
      val tF0 = System.currentTimeMillis()
      filters = updateFilters(ordered.toDF, filters)
      filtersB.destroy()
      val tFilters = System.currentTimeMillis() - tF0
      if (sys.env.contains("GRAFT_DEBUG"))
        println(s"DBG wave=$wave fetched=$fetchedCount novel=$novelCount " +
          s"deduped=$dedupedCount tWave=${System.currentTimeMillis() - tW0}ms " +
          s"tDedupe=${tDedupe}ms tSeq=${tSeq}ms tDelta=${tDelta}ms tFilters=${tFilters}ms")

      val newPending =
        if (cfg.maxPerHostPerWave == Int.MaxValue) { done = novelCount == 0; ordered }
        else {
          val np = deferred.unionByName(ordered).cache()
          // fully materialize BEFORE unpersisting parents — isEmpty would
          // only populate one partition and later evaluations would
          // recompute the whole wave chain recursively
          done = np.count() == 0
          np
        }
      pending.unpersist()
      if (cfg.keepFetched) fetched.unpersist()
      novel.unpersist()
      if (!(newPending eq ordered)) ordered.unpersist()
      pending = newPending
      wave += 1

      if (wave % cfg.checkpointEvery == 0 || done) flushCheckpoint()
    }
    if (latestCheckpointWave.forall(_ < wave)) flushCheckpoint()
    totalSeen = seenView.select($"url_hash").distinct().count()
    val elapsed = System.currentTimeMillis() - t0
    CrawlRunResult(wave - startWave, totalFetched, totalDeduped, totalSeen, elapsed)
  }

  /** All fetched pages of a finished run, in fetch order columns
    * (wave, host, slot). */
  def fetchedTable(): DataFrame = spark.read.schema(fetchResultSchema)
    .option("recursiveFileLookup", "true").parquet(s"$ckpt/fetched")
}
