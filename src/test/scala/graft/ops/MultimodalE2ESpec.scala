package graft.ops

import graft.SparkTestSession
import graft.engine.{CrawlConfig, FollowLinksAndMedia, PageParser, SeedSpec, WaveEngine}
import graft.fetch.SyntheticSite
import graft.sinks.MediaStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * End-to-end multimodal slice: ONE media-plane crawl feeds caption
 * mining, perceptual-hash dedup, frame-set overlap, and the interleaved
 * packing layout — the media-plane ops composed over REAL engine output
 * (fetched span rows + the CAS store), not synthesized tables. Every
 * assertion replays the deterministic site generator driver-side, so the
 * expectations are exact sets, not shape checks.
 */
class MultimodalE2ESpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("crawl → media CAS → captions, phash dedup, host frame overlap, interleaved packing") {
    val nHosts = 3
    val site = SyntheticSite(nHosts = nHosts, basePagesPerHost = 20,
      branching = 2, hotFactor = 2)
    val parsers: Map[String, PageParser] = Map("follow_links" -> FollowLinksAndMedia)
    val mediaRoot = SparkTestSession.tmpDir("mm-e2e-store")
    val engine = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = SparkTestSession.tmpDir("mm-e2e"),
        hostBuckets = 4, fetchPartitions = 2, mediaStoreDir = Some(mediaRoot)))
    val res = engine.run((0 until nHosts).map(k => SeedSpec(site.pageUrl(k, 0))))
    assert(res.fetched >= site.totalPages) // pages + media rows
    val fetched = engine.fetchedTable().cache()

    // the interleaved span plane straight off the crawl (input_hint shape)
    val spans = fetched
      .filter($"parse_fn" =!= "media" && $"status" === 200)
      .select($"canonical".as("doc_id"), explode($"spans").as("s"))
      .select($"doc_id", $"s.offset".cast("long").as("offset"),
        $"s.kind".as("kind"), $"s.text".as("text"), $"s.media_ref".as("media_ref"))
      .cache()

    // driver-side generator replay shared by the assertions below
    val pages = for (k <- 0 until nHosts; i <- 0 until site.pagesOf(k))
      yield site.page(k, i)

    // ---- 1. caption mining over the real spans: in the generator every
    // image is its page's LAST span, so the mined caption must be the
    // page's LAST text-kind span (titles are not captions) ----
    val got1 = Multimodal.captionPairs(spans, "doc_id", window = 64)
      .select($"doc_id", $"media_ref", $"caption", $"delta")
      .as[(String, String, String, Long)].collect().toSet
    val want1 = (for {
      doc <- pages
      m <- doc.spans.filter(_.kind == "media")
    } yield {
      val caption = doc.spans.filter(_.kind == "text").last
      (graft.urls.UrlCanon.canonicalize(doc.doc_id), m.media_ref,
        caption.text, (m.offset - caption.offset).toLong)
    }).toSet
    assert(want1.nonEmpty && got1 == want1)

    // ---- 2. perceptual-hash near-dup over the CAS store: "decode" =
    // take the 72 bytes after the PNG magic as the grayscale grid; the
    // banded pair join must equal brute force, and its hamming-0 pairs
    // must be exactly the CAS plane's same-content URL pairs ----
    val withBytes = MediaStore.refs(spark, mediaRoot)
      .select($"canonical", $"url_hash", $"content_hash")
      .join(MediaStore.blobs(spark, mediaRoot)
        .select($"content_hash", $"media_bytes"), "content_hash")
      .cache()
    val grids = withBytes
      .select($"url_hash".as[Long], $"canonical".as[String],
        $"media_bytes".as[Array[Byte]])
      .map { case (id, ref, bytes) =>
        Multimodal.GridRow(id, ref, bytes.slice(8, 80))
      }
    val hashes = Multimodal.dhash64(spark, grids).cache()
    val got2 = Multimodal.phashPairs(hashes, maxHamming = 4)
      .as[(Long, Long, Long)].collect().toSet
    val hs = hashes.collect()
    val want2 = (for {
      a <- hs; b <- hs if a.id < b.id
      h = java.lang.Long.bitCount(a.phash ^ b.phash) if h <= 4
    } yield (a.id, b.id, h.toLong)).toSet
    assert(want2.nonEmpty && got2 == want2)
    val sameContentPairs = withBytes.groupBy($"content_hash").count()
      .select($"count".as[Long]).collect().map(n => n * (n - 1) / 2).sum
    assert(got2.count(_._3 == 0L) == sameContentPairs)

    // ---- 3. host-level frame overlap: each host is a "video" whose
    // frame set is its pages' image fingerprints; hosts draw from the
    // same 32-blob pool, so overlap is high and exactly replayable ----
    val frames = withBytes
      .select(regexp_extract($"canonical", "h(\\d+)\\.", 1)
        .cast("long").as("vid"), $"content_hash")
    val got3 = Multimodal.videoNearDupPairs(frames, "vid", "content_hash",
        threshold = 0.3)
      .select($"video_a", $"video_b", $"shared")
      .as[(Long, Long, Long)].collect().toSet
    val hostFrames = (0 until nHosts).map { k =>
      k.toLong -> (0 until site.pagesOf(k)).filter(i => (i & 7) == 0)
        .map(i => site.fetchMedia(s"https://${site.hostName(k)}/img$i.png")
          ._2.get.bytes.toSeq).toSet
    }.toMap
    val want3 = (for {
      a <- 0 until nHosts; b <- (a + 1) until nHosts
      inter = (hostFrames(a.toLong) & hostFrames(b.toLong)).size.toLong
      union = (hostFrames(a.toLong) | hostFrames(b.toLong)).size.toLong
      if union > 0 && inter.toDouble / union >= 0.2995 // pre-round guard
      j = math.rint(inter.toDouble / union * 10000) / 10000
      if j >= 0.3
    } yield (a.toLong, b.toLong, inter)).toSet
    assert(want3.nonEmpty && got3 == want3)

    // ---- 4. interleaved packing over the real span plane: gapless
    // intervals, total budget = generator-replayed token cost ----
    val packed = Packing.interleavedLayout(spans, "doc_id",
      seqLen = 128L, mediaTokens = 64L, nParts = 4)
    val rows = packed.orderBy("doc_id").collect()
    assert(rows.length == spans.select("doc_id").distinct().count())
    var expectStart = 0L
    for (r <- rows) {
      assert(r.getAs[Long]("start_tok") == expectStart, r.getAs[String]("doc_id"))
      expectStart = r.getAs[Long]("end_tok")
    }
    val wantTotal = pages.flatMap(_.spans).map { s =>
      if (s.kind == "media") 64L
      else s.text.trim.split("\\s+").count(_.nonEmpty).toLong
    }.sum
    assert(expectStart == wantTotal)

    hashes.unpersist(); withBytes.unpersist(); spans.unpersist(); fetched.unpersist()
  }
}
