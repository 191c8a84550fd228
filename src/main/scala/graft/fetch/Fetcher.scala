package graft.fetch

import graft.model.{Document, MediaBlob, Span}

/**
 * Pluggable page fetcher. The engine never performs real network I/O in
 * this sandbox (zero egress); production would implement this trait over
 * an HTTP client. Fetchers must be cheap to serialize — they are shipped
 * into `mapPartitions` tasks.
 */
trait Fetcher extends Serializable {
  /** Returns (status, document). 404s are data, not failures (reference
    * treats them so: /root/reference/crawler/spiders/vrsdd_member_spider.py:28-29). */
  def fetch(url: String): (Int, Option[Document])

  /** Binary fetch for `media` spans (images/PDF/audio) — the interleaved
    * payload plane. Same status posture as [[fetch]]. Default: media
    * unsupported (fetchers that only serve pages need not override). */
  def fetchMedia(url: String): (Int, Option[MediaBlob]) = (404, None)

  /** Conditional fetch — the HTTP revalidation primitive (If-None-Match /
    * If-Modified-Since analog). `ifHash` is the span-sequence validator
    * ([[graft.model.SpanHash]]) of the copy the caller already holds;
    * returns `(304, None)` when the page's CURRENT content still matches,
    * else the normal [[fetch]] result. The default implementation fetches
    * and compares — semantics-exact for any fetcher (this sandbox's
    * corpus-backed fetchers pay nothing extra; the page is a pure
    * function). A real HTTP implementation overrides this to send the
    * stored validator and let the server elide the body: on a refresh
    * crawl of a mostly-unchanged corpus that turns almost every fetch
    * into a header-only round trip, which is the point — revisit
    * bandwidth, not politeness slots, is the scarce recrawl resource. */
  def fetchConditional(url: String, ifHash: Long): (Int, Option[Document]) = {
    val (status, doc) = fetch(url)
    if (status >= 200 && status < 300 &&
        doc.exists(d => graft.model.SpanHash.of(d.spans) == ifHash)) (304, None)
    else (status, doc)
  }
}

/** Fetcher over an in-memory page map (small test fixtures). */
final class MapFetcher(pages: Map[String, Document]) extends Fetcher {
  def fetch(url: String): (Int, Option[Document]) =
    pages.get(url) match {
      case Some(d) => (200, Some(d))
      case None => (404, None)
    }
}

/**
 * Deterministic synthetic web site — pure function url → page, so fetching
 * is embarrassingly parallel with zero data shipped to tasks. Used for the
 * frontier oracle tests and the 10^10-shaped throughput bench (the site is
 * never materialized; pages are computed on demand).
 *
 * Topology (all derived from (host k, page i, seed)):
 *  - hosts h0.example.jp … h{nHosts-1}.example.jp
 *  - host k has `pagesOf(k)` pages /p0 … ; host 0 is the "hot host" with
 *    `hotFactor`× the pages — the skew case (SURVEY.md §3.3: all ~465
 *    member pages on one host).
 *  - page (k,i) links to its `branching` children (i*branching+1 …) on the
 *    same host, one cross-host link, and a duplicate back-link to /p0
 *    (exercises the dedup path on every page).
 */
final case class SyntheticSite(
    nHosts: Int,
    basePagesPerHost: Int,
    branching: Int = 3,
    hotFactor: Int = 8,
    seed: Long = 42L,
    textSpansPerPage: Int = 3) extends Fetcher {

  def pagesOf(host: Int): Int = if (host == 0) basePagesPerHost * hotFactor else basePagesPerHost

  def hostName(k: Int): String = s"h$k.example.jp"
  def pageUrl(k: Int, i: Int): String = s"https://${hostName(k)}/p$i"

  /** Total reachable pages (for bench bookkeeping). */
  def totalPages: Long = (0 until nHosts).map(pagesOf(_).toLong).sum

  private def mix(x: Long): Long = {
    var z = x + seed * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val WordBank = Vector(
    "法律案", "委員会", "質疑", "採決", "議事日程", "提出", "内閣", "承認", "調査", "予算",
    "報告", "審議", "可決", "附則", "理由", "国会", "議員", "会議録", "発言", "請願")

  /** Zero-regex URL parse ("https://h<k>.example.jp/p<i>") — this runs
    * once per fetch, i.e. millions of times per bench crawl; a per-call
    * compiled regex here dominated the whole fetch path. */
  def parseUrl(url: String): Option[(Int, Int)] = {
    if (!url.startsWith("https://h")) return None
    var i = 9
    val n = url.length
    var k = 0L
    var kd = 0
    while (i < n && url.charAt(i) >= '0' && url.charAt(i) <= '9') {
      k = k * 10 + (url.charAt(i) - '0'); kd += 1; i += 1
    }
    if (kd == 0 || k > Int.MaxValue || !url.startsWith(".example.jp/p", i)) return None
    i += 13
    var p = 0L
    var pd = 0
    while (i < n && url.charAt(i) >= '0' && url.charAt(i) <= '9') {
      p = p * 10 + (url.charAt(i) - '0'); pd += 1; i += 1
    }
    if (pd == 0 || p > Int.MaxValue || i != n) return None
    Some((k.toInt, p.toInt))
  }

  def fetch(url: String): (Int, Option[Document]) = parseUrl(url) match {
    case Some((k, i)) if k < nHosts && i < pagesOf(k) => (200, Some(page(k, i)))
    case Some(_) => (404, None)
    case None => (404, None)
  }

  /** Deterministic child links of page (k, i): same-host tree children, one
    * cross-host link, one duplicate back-link. */
  def links(k: Int, i: Int): Seq[String] = {
    val n = pagesOf(k)
    val children = (1 to branching).map(b => i * branching + b).filter(_ < n)
      .map(c => s"/p$c") // relative — exercises the resolver
    val cross = {
      val ck = ((mix(k * 1000003L + i) % nHosts + nHosts) % nHosts).toInt
      val ci = ((mix(i * 7919L + k) % pagesOf(ck) + pagesOf(ck)) % pagesOf(ck)).toInt
      Seq(pageUrl(ck, ci))
    }
    val dup = if (i > 0) Seq(s"https://${hostName(k)}/p0") else Nil
    children ++ cross ++ dup
  }

  /** Pooled span texts: a page "server" should not dominate the engine
    * measurement with text-construction garbage. 4096 distinct pre-built
    * paragraphs (same word mix as before); pages reference shared String
    * objects, so page generation allocates no text — the parse stage still
    * scans every character of every span. @transient: rebuilt per JVM. */
  @transient private lazy val SpanPool: Array[String] = Array.tabulate(4096) { t =>
    val sb = new StringBuilder
    var h = mix(t * 1315423911L)
    var w = 0
    val words = 6 + (h & 7).toInt
    while (w < words) {
      h = mix(h)
      sb.append(WordBank(((h % WordBank.size) + WordBank.size).toInt % WordBank.size))
      sb.append(if ((h & 3) == 0) "、" else "の")
      w += 1
    }
    sb.append("に関する第").append((t % 9) + 1).append("項")
    sb.toString
  }

  /** Zero-regex media-URL parse ("https://h<k>.example.jp/img<i>.png") —
    * the binary twin of [[parseUrl]]. */
  def parseImgUrl(url: String): Option[(Int, Int)] = {
    if (!url.startsWith("https://h")) return None
    var i = 9
    val n = url.length
    var k = 0L
    var kd = 0
    while (i < n && url.charAt(i) >= '0' && url.charAt(i) <= '9') {
      k = k * 10 + (url.charAt(i) - '0'); kd += 1; i += 1
    }
    if (kd == 0 || k > Int.MaxValue || !url.startsWith(".example.jp/img", i)) return None
    i += 15
    var p = 0L
    var pd = 0
    while (i < n && url.charAt(i) >= '0' && url.charAt(i) <= '9') {
      p = p * 10 + (url.charAt(i) - '0'); pd += 1; i += 1
    }
    if (pd == 0 || p > Int.MaxValue || !url.startsWith(".png", i) || i + 4 != n) return None
    Some((k.toInt, p.toInt))
  }

  /** 32 distinct deterministic blobs; image (k,i) serves pool slot
    * `mix(i) & 31`, so byte-identical images recur across hosts and pages
    * — the content-addressed dedup case (one logo on every page of a real
    * site). PNG magic prefix, then a seeded byte stream. */
  @transient private lazy val MediaPool: Array[Array[Byte]] = Array.tabulate(32) { t =>
    val len = 512 + ((mix(t * 2654435761L) & 1023).toInt)
    val out = new Array[Byte](len)
    val magic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    System.arraycopy(magic, 0, out, 0, magic.length)
    var h = mix(t * 1000003L)
    var j = magic.length
    while (j < len) {
      h = mix(h)
      out(j) = (h & 0xFF).toByte
      j += 1
    }
    out
  }

  /** Binary plane of the synthetic site: the media refs emitted by
    * [[page]] resolve here. Pages only carry an image when (i & 7) == 0,
    * and only pages that exist serve one. */
  override def fetchMedia(url: String): (Int, Option[graft.model.MediaBlob]) =
    parseImgUrl(url) match {
      case Some((k, i)) if k < nHosts && i < pagesOf(k) && (i & 7) == 0 =>
        (200, Some(graft.model.MediaBlob("image/png", MediaPool((mix(i.toLong) & 31).toInt))))
      case _ => (404, None)
    }

  def page(k: Int, i: Int): Document = {
    val spans = scala.collection.mutable.ArrayBuffer[Span]()
    var off = 0
    def add(kind: String, text: String, ref: String): Unit = { spans += Span(kind, text, ref, off); off += 1 }
    add("title", s"第${(i % 204) + 1}回ページ ${hostName(k)} p$i", "")
    // text spans sized to mimic a real page body (a Diet bill/minutes page
    // carries tens of paragraphs the parse stage must scan)
    val nText = textSpansPerPage + (mix(k * 31L + i) & 3).toInt
    for (t <- 0 until nText)
      add("text", SpanPool((mix(k + i * 131L + t) & 4095).toInt), "")
    for (l <- links(k, i)) add("link", s"リンク$l", l)
    if ((i & 7) == 0) add("media", "", s"https://${hostName(k)}/img$i.png")
    Document(pageUrl(k, i), spans.toSeq)
  }
}

/**
 * DUST fixture site (Bar-Yossef et al., WWW'07 "Do Not Crawl in the
 * DUST"): wraps [[SyntheticSite]] so every emitted link carries a
 * content-IRRELEVANT session parameter — the URL-family explosion a real
 * crawl hits on session-id sites — plus, on each host's root page, two
 * links to print-view variants whose parameter DOES change content.
 *
 * Content is a pure function of (base URL, variant): every member of a
 * session family returns byte-identical spans, so a crawl's fetched table
 * exhibits exactly the (different URL, same content hash) evidence that
 * [[graft.ops.Dust.irrelevantParams]] mines, while the variant pages give
 * the miner a parameter it must NOT judge irrelevant. A ring link (every
 * page → its predecessor) guarantees ≥ 2 distinct inbound session values
 * per page, i.e. ≥ 2 evidence groups per host at the miner's default
 * `minEvidence`. Fully deterministic: sid = hash(emitting base, target),
 * identical across crawls and JVMs.
 */
final case class DustySite(inner: SyntheticSite,
    sessionParam: String = "sid", variantParam: String = "v") extends Fetcher {

  private def sidFor(base: String, target: String): String =
    java.lang.Long.toHexString(
      graft.urls.UrlCanon.urlHash(base + " " + target) & 0xffffffffL)

  private def withSid(base: String, target: String): String =
    target + "?" + sessionParam + "=" + sidFor(base, target)

  def fetch(url: String): (Int, Option[Document]) = {
    val qi = url.indexOf('?')
    val base = if (qi < 0) url else url.substring(0, qi)
    var variant: String = null
    if (qi >= 0) {
      for (kv <- url.substring(qi + 1).split("&"); if kv.nonEmpty) {
        val e = kv.indexOf('=')
        val k = if (e < 0) kv else kv.substring(0, e)
        if (k == variantParam) variant = if (e < 0) "" else kv.substring(e + 1)
        else if (k != sessionParam) return (404, None) // unknown param
      }
    }
    inner.fetch(base) match {
      case (200, Some(doc)) =>
        val out = scala.collection.mutable.ArrayBuffer[Span]()
        doc.spans.foreach { s =>
          out += (if (s.kind == "link")
            s.copy(media_ref = withSid(doc.doc_id, s.media_ref)) else s)
        }
        inner.parseUrl(base).foreach { case (k, i) =>
          val n = inner.pagesOf(k)
          val prev = s"/p${(i + n - 1) % n}"
          out += Span("link", s"前へ$prev", withSid(doc.doc_id, prev), out.size)
          if (i == 0) { // print-view variants: param v CHANGES content
            out += Span("link", "印刷様式1", base + "?" + variantParam + "=1", out.size)
            out += Span("link", "印刷様式2", base + "?" + variantParam + "=2", out.size)
          }
        }
        if (variant != null)
          out += Span("text", s"印刷スタイル $variant", "", out.size)
        (200, Some(Document(doc.doc_id, out.toSeq)))
      case other => other
    }
  }

  override def fetchMedia(url: String): (Int, Option[MediaBlob]) =
    inner.fetchMedia(url)
}

/**
 * Mirror fixture site: alias hosts serving byte-identical copies of a
 * [[SyntheticSite]]'s primary hosts — the country-mirror / re-host case
 * [[graft.ops.Mirror.mirrorHosts]] detects. `aliases` maps alias host →
 * primary host.
 *
 * To make copies byte-identical AND self-contained, the wrapper applies
 * one pure transform to every fetched page (primary or alias alike):
 *  - same-host refs (links and media) are RELATIVIZED, so they resolve
 *    into whichever host space the page was fetched from;
 *  - cross-host link refs are REMAPPED to the target's alias when one
 *    exists, so primaries link INTO mirrors (the in-links that make a
 *    blind crawl fetch every mirror copy — the waste the feedback loop
 *    then eliminates).
 * Span text is untouched, so a page's span sequence is a pure function
 * of its primary — identical across the family. The returned doc_id is
 * the REQUESTED url, so relative refs resolve within the fetched host.
 */
final case class MirroredSite(inner: SyntheticSite,
    aliases: Map[String, String]) extends Fetcher {

  private val mirrorOf: Map[String, String] = aliases.map(_.swap)

  private def hostOf(url: String): String =
    graft.urls.UrlCanon.hostOfOrSame(url, "")

  private def swapHost(url: String, from: String, to: String): String = {
    val i = url.indexOf(from)
    if (i < 0) url else url.substring(0, i) + to + url.substring(i + from.length)
  }

  def fetch(url: String): (Int, Option[Document]) = {
    val host = hostOf(url)
    val primary = aliases.getOrElse(host, host)
    val pUrl = if (primary == host) url else swapHost(url, host, primary)
    inner.fetch(pUrl) match {
      case (200, Some(doc)) =>
        val pHost = hostOf(doc.doc_id)
        val prefix = "https://" + pHost
        val spans = doc.spans.map { s =>
          val ref = s.media_ref
          if (ref == null || ref.isEmpty || !ref.startsWith("https://")) s
          else if (ref.startsWith(prefix)) // same-host: relativize
            s.copy(media_ref = ref.substring(prefix.length))
          else if (s.kind == "link") { // cross-host link: remap to alias
            val tgt = hostOf(ref)
            mirrorOf.get(tgt) match {
              case Some(a) => s.copy(media_ref = swapHost(ref, tgt, a))
              case None => s
            }
          } else s
        }
        (200, Some(Document(url, spans)))
      case other => other
    }
  }

  override def fetchMedia(url: String): (Int, Option[MediaBlob]) = {
    val host = hostOf(url)
    val primary = aliases.getOrElse(host, host)
    inner.fetchMedia(if (primary == host) url else swapHost(url, host, primary))
  }
}

/**
 * Crawler-trap fixture site: wraps [[SyntheticSite]] so every page (k, i)
 * additionally links to `calPerPage` auto-generated calendar URLs
 * `/cal/<k>/<n>` (disjoint per page, so the family has one distinct URL
 * per link). Calendar pages serve CONSTANT per-host content — the
 * low-novelty template family [[graft.ops.Traps.templateStats]] flags
 * (real case: empty calendar/faceted-listing pages) — and emit no links.
 * The waste is exact-dedup-proof: every family member is a distinct URL,
 * so a blind crawl fetches all of them; only the template verdict can
 * stop the family while leaving /p pages crawlable. Deterministic.
 */
final case class TrapSite(inner: SyntheticSite, calPerPage: Int = 3)
    extends Fetcher {

  private val CalRe = "^https://h([0-9]+)\\.example\\.jp/cal/([0-9]+)/([0-9]+)$".r

  def fetch(url: String): (Int, Option[Document]) = url match {
    case CalRe(hk, ck, _) =>
      val k = hk.toInt
      if (k < inner.nHosts && hk == ck)
        (200, Some(Document(url, Seq(
          Span("title", s"カレンダー ${inner.hostName(k)}", "", 0),
          Span("text", "予定はありません。", "", 1)))))
      else (404, None)
    case _ => inner.fetch(url) match {
      case (200, Some(doc)) =>
        val (k, i) = inner.parseUrl(doc.doc_id).get
        val extra = (1 to calPerPage).map(j =>
          Span("link", s"カレンダー$j", s"/cal/$k/${i * calPerPage + j}",
            doc.spans.size + j - 1))
        (200, Some(Document(doc.doc_id, doc.spans ++ extra)))
      case other => other
    }
  }

  override def fetchMedia(url: String): (Int, Option[MediaBlob]) =
    inner.fetchMedia(url)
}

/**
 * Change-over-time fixture site: serves [[SyntheticSite]]'s pages with an
 * extra revision span appended to every page whose index is a multiple of
 * `changeEvery` — those pages' content differs across `version`s, the
 * rest are byte-stable. The adaptive-recrawl case
 * ([[graft.ops.Recrawl.schedule]]): a refresh crawl across two versions
 * observes exactly the changing pages as changed (interval resets) and
 * the stable ones as unchanged (interval doubles), so the next refresh
 * epoch re-fetches only the fast-moving subset. Deterministic.
 */
final case class VersionedSite(inner: SyntheticSite, version: Int,
    changeEvery: Int = 3) extends Fetcher {

  def changes(k: Int, i: Int): Boolean = i % changeEvery == 0

  def fetch(url: String): (Int, Option[Document]) = inner.fetch(url) match {
    case (200, Some(doc)) =>
      val (k, i) = inner.parseUrl(doc.doc_id).get
      if (changes(k, i))
        (200, Some(Document(doc.doc_id, doc.spans :+
          Span("text", s"改訂第${version}版", "", doc.spans.size))))
      else (200, Some(doc))
    case other => other
  }

  override def fetchMedia(url: String): (Int, Option[MediaBlob]) =
    inner.fetchMedia(url)
}
