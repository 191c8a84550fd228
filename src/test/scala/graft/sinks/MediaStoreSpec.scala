package graft.sinks

import graft.SparkTestSession
import graft.engine.{CrawlConfig, FollowLinksAndMedia, PageParser, SeedSpec, WaveEngine}
import graft.fetch.SyntheticSite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dataFileState(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$root/data"))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("insertIfAbsent: one row per key, deterministic min-ord winner, key-plane idempotence") {
    val dir = SparkTestSession.tmpDir("cas-insert")
    val t = new SnapshotTable(spark, dir, nBuckets = 4)
    // duplicate keys in one batch: the (seq, src) minimum must win
    t.insertIfAbsent(
      Seq(("h1", "b", 2L), ("h1", "a", 1L), ("h2", "x", 5L))
        .toDF("content_hash", "src", "seq"),
      "content_hash", struct($"seq", $"src"))
    val r1 = t.read().orderBy("content_hash").collect()
    assert(r1.map(r => (r.getAs[String]("content_hash"), r.getAs[String]("src"))).toSeq ==
      Seq(("h1", "a"), ("h2", "x")))
    // overlapping second batch: existing keys are dropped even when their
    // payload differs (first write wins — content addressing), novel appended
    val before = dataFileState(dir)
    t.insertIfAbsent(
      Seq(("h1", "DIFFERENT", 0L), ("h3", "z", 9L)).toDF("content_hash", "src", "seq"),
      "content_hash", struct($"seq", $"src"))
    val r2 = t.read().orderBy("content_hash").collect()
    assert(r2.map(r => (r.getAs[String]("content_hash"), r.getAs[String]("src"))).toSeq ==
      Seq(("h1", "a"), ("h2", "x"), ("h3", "z")))
    // fast-append: no pre-existing data file was rewritten
    val after = dataFileState(dir)
    assert(before.forall { case (p, m) => after.get(p).contains(m) })
  }

  test("ingestWave: blobs CAS'd by content, refs per URL, replay is a no-op") {
    val root = SparkTestSession.tmpDir("cas-ingest")
    val sharedA = Array[Byte](1, 2, 3, 4)
    val sharedB = Array[Byte](9, 8, 7)
    def fetched(rows: Seq[(String, Long, Array[Byte])]): org.apache.spark.sql.DataFrame =
      rows.toDF("canonical", "seq", "media_bytes")
        .withColumn("parse_fn", lit("media"))
        .withColumn("status", lit(200))
        .withColumn("url_hash", xxhash64($"canonical"))
        .withColumn("wave", lit(1))
        .withColumn("media_type", lit("image/png"))
    // wave 1: three URLs, two distinct contents; page rows must pass through
    val w1 = fetched(Seq(
      ("https://a.jp/logo.png", 10L, sharedA),
      ("https://b.jp/logo.png", 11L, sharedA), // same bytes, later discovery
      ("https://a.jp/hero.png", 12L, sharedB)))
      .unionByName(Seq(("https://a.jp/page", 13L))
        .toDF("canonical", "seq")
        .withColumn("parse_fn", lit("follow_links")).withColumn("status", lit(200))
        .withColumn("url_hash", xxhash64($"canonical")).withColumn("wave", lit(1))
        .withColumn("media_type", lit(null).cast("string"))
        .withColumn("media_bytes", lit(null).cast("binary")))
    assert(MediaStore.ingestWave(spark, w1, root) == 3) // media rows only
    val blobs1 = MediaStore.blobs(spark, root).collect()
    assert(blobs1.length == 2) // two distinct contents
    val byWitness = blobs1.map(r =>
      r.getAs[String]("witness_canonical") -> r.getAs[Array[Byte]]("media_bytes")).toMap
    assert(byWitness("https://a.jp/logo.png").toSeq == sharedA.toSeq) // first discovery won
    assert(byWitness("https://a.jp/hero.png").toSeq == sharedB.toSeq)
    assert(MediaStore.refs(spark, root).count() == 3) // one ref per URL
    // wave 2: one already-stored content under a new URL + replay of an old
    // URL (crash-recovery re-offer) — blobs unchanged, one new ref
    val blobFiles = dataFileState(s"$root/blobs")
    val w2 = fetched(Seq(
      ("https://c.jp/logo.png", 20L, sharedA),
      ("https://a.jp/logo.png", 10L, sharedA)))
    assert(MediaStore.ingestWave(spark, w2, root) == 2)
    assert(MediaStore.blobs(spark, root).count() == 2)
    assert(MediaStore.refs(spark, root).count() == 4)
    // stored blob bytes were not rewritten by the re-offer
    val blobFilesAfter = dataFileState(s"$root/blobs")
    assert(blobFiles.forall { case (p, m) => blobFilesAfter.get(p).contains(m) })
    // empty wave: nothing to do, no new table version
    val vBlobs = MediaStore.blobsTable(spark, root).currentVersion
    assert(MediaStore.ingestWave(spark, w1.limit(0), root) == 0)
    assert(MediaStore.blobsTable(spark, root).currentVersion == vBlobs)
  }

  test("media rows served from the S11 fetch cache keep their bytes (cache ⋈ CAS interplay)") {
    val site = SyntheticSite(nHosts = 2, basePagesPerHost = 10, branching = 2, hotFactor = 1)
    val parsers: Map[String, PageParser] = Map("follow_links" -> FollowLinksAndMedia)
    val seeds = (0 until 2).map(k => SeedSpec(site.pageUrl(k, 0)))
    // run 1: live, no store — just to warm a cache that includes media rows
    val e1 = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = SparkTestSession.tmpDir("mcache-run1"),
        hostBuckets = 4, fetchPartitions = 2))
    e1.run(seeds)
    val fresh = SparkTestSession.tmpDir("mcache-fresh")
    e1.fetchedTable().withColumn("stored_at_ms", lit(System.currentTimeMillis()))
      .write.mode("overwrite").parquet(s"$fresh/wave_all")
    // run 2: everything (pages AND media) serves from cache; the CAS store
    // must still fill, from cached bytes
    val mediaRoot = SparkTestSession.tmpDir("mcache-store")
    val e2 = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = SparkTestSession.tmpDir("mcache-run2"),
        hostBuckets = 4, fetchPartitions = 2,
        fetchCacheDir = Some(fresh), cacheTtlSec = 600, mediaStoreDir = Some(mediaRoot)))
    e2.run(seeds)
    val mediaRows = e2.fetchedTable().filter($"parse_fn" === "media").cache()
    assert(mediaRows.count() > 0)
    assert(mediaRows.filter(!$"from_cache").count() == 0) // all media cache-served
    val blobs = MediaStore.blobs(spark, mediaRoot).collect()
    assert(blobs.nonEmpty)
    blobs.foreach { b =>
      val served = site.fetchMedia(b.getAs[String]("witness_canonical"))._2.get.bytes
      assert(b.getAs[Array[Byte]]("media_bytes").toSeq == served.toSeq)
    }
    val refs = MediaStore.refs(spark, mediaRoot).select($"canonical").as[String].collect().toSet
    assert(refs == mediaRows.select($"canonical").as[String].collect().toSet)
    mediaRows.unpersist()
  }

  test("e2e: crawl with media plane — frontier dedups media URLs, store CAS-dedups bytes") {
    val site = SyntheticSite(nHosts = 3, basePagesPerHost = 20, branching = 2, hotFactor = 2)
    val parsers: Map[String, PageParser] = Map("follow_links" -> FollowLinksAndMedia)
    val ckpt = SparkTestSession.tmpDir("media-crawl")
    val mediaRoot = SparkTestSession.tmpDir("media-store")
    val cfg = CrawlConfig(checkpointDir = ckpt, hostBuckets = 4, fetchPartitions = 2,
      mediaStoreDir = Some(mediaRoot))
    val engine = new WaveEngine(spark, site, parsers, cfg)
    engine.run((0 until 3).map(k => SeedSpec(site.pageUrl(k, 0))))

    val fetched = engine.fetchedTable().cache()
    // every media span any fetched page emitted, canonicalized = the ref set
    val emitted = fetched
      .select(explode($"spans").as("s")).filter($"s.kind" === "media")
      .select($"s.media_ref").as[String].collect()
      .map(graft.urls.UrlCanon.canonicalize).toSet
    assert(emitted.nonEmpty)
    val refs = MediaStore.refs(spark, mediaRoot).select($"canonical").as[String].collect().toSet
    assert(refs == emitted) // frontier fetched each media URL exactly once
    // media fetches ride the same politeness plane: slots assigned, and a
    // (host, wave)'s slot sequence is collision-free across pages + media
    val mediaRows = fetched.filter($"parse_fn" === "media")
    assert(mediaRows.count() == refs.size.toLong)
    assert(mediaRows.filter($"slot" < 0).isEmpty)
    val slotClashes = fetched.groupBy($"host", $"wave", $"slot").count()
      .filter($"count" > 1).count()
    assert(slotClashes == 0)
    // CAS plane: stored blob set == distinct contents the site serves for
    // the fetched refs, each witness being a URL that actually serves it
    val expectedHashes = refs.map { u =>
      val (st, blob) = site.fetchMedia(u)
      assert(st == 200, s"ref $u should resolve")
      java.security.MessageDigest.getInstance("MD5").digest(blob.get.bytes)
        .map("%02x".format(_)).mkString
    }
    val blobs = MediaStore.blobs(spark, mediaRoot).collect()
    assert(blobs.map(_.getAs[String]("content_hash")).toSet == expectedHashes)
    assert(blobs.length < refs.size) // dedup actually collapsed something
    blobs.foreach { b =>
      val w = b.getAs[String]("witness_canonical")
      assert(refs.contains(w))
      assert(site.fetchMedia(w)._2.get.bytes.toSeq ==
        b.getAs[Array[Byte]]("media_bytes").toSeq)
    }
    fetched.unpersist()
  }
}
