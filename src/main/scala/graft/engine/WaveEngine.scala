package graft.engine

import graft.fetch.Fetcher
import graft.model._
import graft.seen.CuckooFilter
import graft.urls.UrlCanon
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}

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
    politenessRps: Double = 1.0, // per host (reference: 1 rps GLOBAL, we keep it per host — cross-host parallelism is the whole point)
    maxPerHostPerWave: Int = 256, // politeness budget per wave per host
    realtime: Boolean = false, // actually sleep between same-host fetches
    referenceOrder: Boolean = false, // replay Scrapy's sequential LIFO order exactly
    robotsEnabled: Boolean = false, // reference: ROBOTSTXT_OBEY = False (settings.py:20)
    robotsDisallow: Map[String, Seq[String]] = Map.empty, // host -> path prefixes
    maxWaves: Int = 10000,
    maxUrls: Long = Long.MaxValue,
    keepFetched: Boolean = true) // write fetched docs table (off for pure-throughput bench)

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
 * The wave-synchronous crawl engine (SURVEY.md §7.9, north rule).
 *
 * Replaces the reference's single-threaded Twisted reactor loop
 * (Scrapy scheduler + dupefilter + download-delay,
 * /root/reference/crawler/settings.py:23,28) with a partitioned Spark
 * frontier iterated in waves:
 *
 *   pending ─select(politeness budget)─► batch ─repartition(host_bucket)─►
 *   mapPartitions{per-host token bucket + fetch} ─► fetched
 *   fetched ─flatMap(parser)─► candidates ─canonicalize+cuckoo+anti-join─►
 *   novel ─seq assignment─► pending(wave+1);  checkpoint each wave.
 *
 * Dedup semantics = Scrapy's dupefilter: a URL is marked seen when
 * *enqueued* (never enqueued twice); marking is exact (cuckoo filter is a
 * pre-filter only — no false negatives, positives verified by anti-join
 * against the exact seen table).
 *
 * Ordering contract (SURVEY.md §2.5): `referenceOrder=true` replays
 * Scrapy's deterministic sequential order (start requests in listed order,
 * consumed lazily; follow-ups LIFO) by running waves of size 1. The
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

  /** Returns (novel, dedupedCount). `seen` has columns (url_hash). */
  private def dedupe(
      candidates: Dataset[Candidate],
      seen: DataFrame,
      filters: Map[Int, CuckooFilter]): (Dataset[Candidate], Long) = {
    val total = candidates.count()

    // first discovery wins within the wave (deterministic: discovery order)
    val w = Window.partitionBy($"url_hash").orderBy($"parent_seq", $"emission_idx")
    val unique = candidates
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .as[Candidate]

    // cuckoo pre-filter: definitely-new rows skip the anti-join entirely
    val filtersB = spark.sparkContext.broadcast(filters)
    val flagged = unique.map(c =>
      (c, filtersB.value.get(c.host_bucket).exists(_.contains(c.url_hash))))
      .toDF("c", "maybe_seen")
    flagged.cache()
    val definiteNew = flagged.filter(!$"maybe_seen").select($"c.*").as[Candidate]
    val maybeSeen = flagged.filter($"maybe_seen").select($"c.*").as[Candidate]
    // exact verification for the (few) filter positives
    val verifiedNew = maybeSeen.join(seen.select("url_hash"), Seq("url_hash"), "left_anti")
      .as[Candidate]
    val novel = definiteNew.unionByName(verifiedNew).cache()
    val novelCount = novel.count()
    flagged.unpersist()
    (novel, total - novelCount)
  }

  /** Distributed per-bucket cuckoo update: each bucket's novel hashes are
    * grouped to one task which folds them (sorted — deterministic filter
    * bytes) into that bucket's filter; the driver collects only the ~B
    * small filter blobs, never the URLs. */
  private def updateFilters(
      novel: Dataset[Candidate],
      filters: Map[Int, CuckooFilter]): Map[Int, CuckooFilter] = {
    val filtersB = spark.sparkContext.broadcast(filters)
    val capacity = 1 << 16
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
        val picked = pick.as[UrlRecord]
        val pickedSeq = picked.head().seq
        (picked, live.filter($"seq" =!= pickedSeq).as[UrlRecord])
      }
    } else {
      val w = Window.partitionBy($"host").orderBy($"priority".desc, $"seq".asc)
      val ranked = pending.withColumn("rank_in_host", row_number().over(w)).cache()
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

  private def fetchBatch(batch: Dataset[UrlRecord], fetchWave: Int, waveStartMs: Long): Dataset[FetchResult] = {
    val f = fetcher
    val rps = cfg.politenessRps
    val realtime = cfg.realtime
    batch
      .repartition(cfg.fetchPartitions, $"host_bucket")
      .mapPartitions { it =>
        val rows = it.toArray
        val byHost = rows.groupBy(_.host)
        val pid = TaskContext.getPartitionId()
        byHost.iterator.flatMap { case (_, hostRows) =>
          val ordered = hostRows.sortBy(r => (-r.priority, r.seq))
          ordered.iterator.zipWithIndex.map { case (r, slot) =>
            val plannedMs = waveStartMs + math.round(slot * 1000.0 / rps)
            if (realtime) {
              val now = System.currentTimeMillis()
              if (plannedMs > now) Thread.sleep(plannedMs - now)
            }
            val (status, doc) = f.fetch(r.url)
            FetchResult(
              url = r.url, canonical = r.canonical, url_hash = r.url_hash,
              host = r.host, host_bucket = r.host_bucket, parse_fn = r.parse_fn,
              meta = r.meta, wave = fetchWave, seq = r.seq, status = status,
              from_cache = false, fetched_at_ms = plannedMs, slot = slot,
              partition_id = pid,
              doc_id = doc.map(_.doc_id).getOrElse(r.canonical),
              spans = doc.map(_.spans).getOrElse(Nil))
          }
        }
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

  // ------------------------------------------------------------------
  // main loop
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
    // seed self-dedup (first occurrence wins), mark seen at enqueue
    val distinctSeeds = {
      val seenH = scala.collection.mutable.HashSet[Long]()
      seedRows.filter(r => seenH.add(r.url_hash))
    }
    val pending = spark.createDataset(distinctSeeds).repartition(cfg.fetchPartitions)
    // Scalable mode marks all seeds seen at enqueue (wave 0). Reference mode
    // enqueues start requests lazily (Scrapy): a seed is fingerprinted only
    // when consumed, so a link-discovered copy can pre-empt it.
    val filters: Map[Int, CuckooFilter] =
      if (cfg.referenceOrder) Map.empty
      else {
        val seenDF = pending.select($"url_hash", $"canonical", $"host_bucket")
          .withColumn("wave", lit(0))
        seenDF.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/seen/wave_0")
        updateFilters(
          pending.map(r => Candidate(r.url, r.canonical, r.url_hash, r.host, r.host_bucket,
            r.parse_fn, r.meta, r.priority, -1L, 0)), Map.empty)
      }
    pending.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/pending_w0")
    saveFilters(0, filters)
    writeState(0, distinctSeeds.length.toLong, 0, 0)
    loop(0, spark.read.schema(urlRecordSchema).parquet(s"$ckpt/pending_w0").as[UrlRecord],
      filters, distinctSeeds.length.toLong, 0L, 0L)
  }

  def resume(): CrawlRunResult = {
    val wave = latestCheckpointWave.getOrElse(
      throw new IllegalStateException(s"no checkpoint under $ckpt"))
    val (nextSeq, fetched, deduped) = readState(wave)
    val pending = spark.read.schema(urlRecordSchema).parquet(s"$ckpt/pending_w$wave").as[UrlRecord]
    val filters = loadFilters(wave)
    loop(wave, pending, filters, nextSeq, fetched, deduped)
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

  /** All seen-marking deltas written so far (local-FS checkpoint layout;
    * a cluster deployment would point this at a shared store). */
  private def seenSoFar(): DataFrame = {
    val dirs = Option(new java.io.File(s"$ckpt/seen").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getPath).sorted
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], seenSchema)
    else spark.read.schema(seenSchema).parquet(dirs.toIndexedSeq: _*)
  }

  private def loop(
      startWave: Int,
      pending0: Dataset[UrlRecord],
      filters0: Map[Int, CuckooFilter],
      nextSeq0: Long,
      fetched0: Long,
      deduped0: Long): CrawlRunResult = {
    val t0 = System.currentTimeMillis()
    var wave = startWave
    var pending = pending0.cache()
    var filters = filters0
    var nextSeq = nextSeq0
    var totalFetched = fetched0
    var totalDeduped = deduped0

    var done = pending.isEmpty
    while (!done && wave < cfg.maxWaves && totalFetched < cfg.maxUrls) {
      val waveStartMs = t0 + (wave.toLong * 1000L) // simulated clock base
      val seenBefore = seenSoFar()
      val (batch, deferred) = selectBatch(pending, seenBefore)

      if (cfg.referenceOrder) {
        // fingerprint the consumed request at schedule time (Scrapy semantics);
        // keep the cuckoo filters in sync with the exact seen table
        batch.select($"url_hash", $"canonical", $"host_bucket")
          .withColumn("wave", lit(wave))
          .write.mode(SaveMode.Overwrite).parquet(s"$ckpt/seen/seedmark_$wave")
        filters = updateFilters(
          batch.map(r => Candidate(r.url, r.canonical, r.url_hash, r.host,
            r.host_bucket, r.parse_fn, r.meta, r.priority, -1L, 0)), filters)
      }

      val fetched = fetchBatch(batch, wave, waveStartMs).cache()
      val fetchedCount = fetched.count()
      totalFetched += fetchedCount

      if (cfg.keepFetched)
        fetched.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/fetched/wave_$wave")

      val candidates = toCandidates(fetched)
      val (novel, dedupedCount) = dedupe(candidates, seenSoFar(), filters)
      totalDeduped += dedupedCount

      // deterministic seq assignment by discovery order
      val ordered = novel
        .withColumn("seq", row_number().over(
          Window.orderBy($"parent_seq", $"emission_idx")).cast("long") + lit(nextSeq) - 1)
        .withColumn("is_seed", lit(false))
        .withColumn("wave", lit(wave + 1))
        .select($"url", $"canonical", $"url_hash", $"host", $"host_bucket",
          $"parse_fn", $"meta", $"priority", $"is_seed", $"wave", $"seq")
        .as[UrlRecord]
        .cache()
      val novelCount = ordered.count()
      nextSeq += novelCount

      // per-partition lineage + metrics (north rule)
      val lineage = fetched.groupBy($"wave", $"partition_id").agg(
        count(lit(1)).as("in_count"),
        sum(when($"status" >= 200 && $"status" < 300, 1L).otherwise(0L)).as("fetched"),
        sum(when($"status" >= 400, 1L).otherwise(0L)).as("errors"))
        .withColumn("deduped_wave", lit(dedupedCount))
        .withColumn("novel_wave", lit(novelCount))
      lineage.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/lineage/wave_$wave")

      // mark novel as seen at enqueue time (Scrapy dupefilter semantics)
      ordered.select($"url_hash", $"canonical", $"host_bucket")
        .withColumn("wave", lit(wave + 1))
        .write.mode(SaveMode.Overwrite).parquet(s"$ckpt/seen/wave_${wave + 1}")
      filters = updateFilters(novel, filters)

      val newPending = deferred.unionByName(ordered)
      wave += 1
      newPending.write.mode(SaveMode.Overwrite).parquet(s"$ckpt/pending_w$wave")
      pending.unpersist()
      fetched.unpersist()
      novel.unpersist()
      ordered.unpersist()
      // re-read the checkpoint — truncates the logical plan lineage, which
      // otherwise grows (and OOMs the planner) across waves
      pending = spark.read.schema(urlRecordSchema).parquet(s"$ckpt/pending_w$wave").as[UrlRecord].cache()
      saveFilters(wave, filters)
      writeState(wave, nextSeq, totalFetched, totalDeduped)
      done = pending.isEmpty
    }
    val elapsed = System.currentTimeMillis() - t0
    val seenCount = seenSoFar().select($"url_hash").distinct().count()
    CrawlRunResult(wave - startWave, totalFetched, totalDeduped, seenCount, elapsed)
  }

  /** All fetched pages of a finished run, in fetch order columns
    * (wave, host, slot). */
  def fetchedTable(): DataFrame = spark.read.schema(fetchResultSchema)
    .option("recursiveFileLookup", "true").parquet(s"$ckpt/fetched")
}
