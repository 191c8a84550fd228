package graft.fetch

import graft.model.Document
import graft.urls.UrlCanon

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/**
 * Deployable [[Fetcher]] over the JDK HTTP client (`java.net.http`,
 * Java 11+): GET with redirect-following, a per-request timeout, and the
 * reference crawler's user agent posture. Responses parse to the
 * engine's span-sequence [[graft.model.Document]] via [[HtmlSpans]] — so
 * the frontier, politeness, extraction transforms, and sinks run
 * unchanged against live sites.
 *
 * Error posture matches the engine's 404-as-data contract (S13):
 *  - any HTTP status is returned verbatim, body parsed only on 2xx;
 *  - transport failures (DNS, refused, timeout) return status 599 with
 *    no document — a row, not an exception, so one dead host can never
 *    fail a fetch partition (the reference's errback-free spiders drop
 *    failures the same way). A task-kill interrupt is the one exception:
 *    the interrupt status is RESTORED so Spark's cancellation actually
 *    stops the partition instead of it politely fetching on.
 *
 * Redirects: the document's `doc_id` is the canonical FINAL response URI
 * (`resp.uri()`), not the requested URL — the engine's candidate stage
 * resolves relative hrefs against `doc_id` when it is a URL, so links on
 * redirected pages resolve against the page that actually served them
 * (Scrapy's `response.url` semantics).
 *
 * Serialization: the fetcher ships into `mapPartitions` tasks, so the
 * client is `@transient lazy` — each executor JVM builds its own
 * connection pool on first use; only the plain config fields serialize.
 *
 * Rate limiting stays with the ENGINE (per-host politeness slots,
 * S10/S11) — the fetcher is deliberately dumb: fetch one URL now.
 */
final class HttpFetcher(
    timeoutMs: Long = 15000,
    userAgent: String = "graft-crawler/0.1 (+https://politylink.jp)",
    maxBodyBytes: Int = 8 << 20) extends Fetcher {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .build()

  def fetch(url: String): (Int, Option[Document]) =
    get(url) match {
      case (status, Some((body, finalUri))) =>
        (status, Some(Document(UrlCanon.canonicalize(finalUri), HtmlSpans.parse(body))))
      case (status, None) => (status, None)
    }

  /** Raw text body (no HTML parsing) — robots.txt, sitemaps, API JSON.
    * Same status/transport posture as [[fetch]]. */
  def fetchText(url: String): (Int, Option[String]) =
    get(url) match {
      case (status, Some((body, _))) => (status, Some(body))
      case (status, None) => (status, None)
    }

  /** Binary fetch for media spans — the interleaved payload plane. Bytes
    * are returned raw (bounded by `maxBodyBytes`, same as pages) with the
    * base media type from Content-Type; no charset decode, no HTML parse.
    *
    * A body LARGER than `maxBodyBytes` is a fetch FAILURE (status 598),
    * never a success: the content-addressed store's contract is "each
    * distinct content, stored once, keyed by its hash" and insertIfAbsent
    * is first-write-wins — a silently truncated prefix would be stored as
    * if it were the real blob and could never be repaired by a later
    * complete fetch. (Text surfaces keep the truncated prefix: a partial
    * HTML parse is useful; a partial PDF is corruption.) */
  override def fetchMedia(url: String): (Int, Option[graft.model.MediaBlob]) =
    getRaw(url) match {
      case (_, Some((_, truncated, _))) if truncated => (598, None)
      case (status, Some((bytes, _, resp))) =>
        (status, Some(graft.model.MediaBlob(mediaTypeOf(resp), bytes)))
      case (status, None) => (status, None)
    }

  /** The one request path all surfaces share: build, send, bounded read,
    * error posture. Returns (status, (raw bytes, truncated, response)) —
    * text surfaces decode via [[charsetOf]], the media surface keeps
    * bytes and refuses truncated ones. */
  private def getRaw(url: String): (Int, Option[(Array[Byte], Boolean, HttpResponse[java.io.InputStream])]) =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("User-Agent", userAgent)
        .GET()
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
      val status = resp.statusCode()
      if (status >= 200 && status < 300) {
        val (bytes, truncated) = readBounded(resp.body())
        (status, Some((bytes, truncated, resp)))
      } else { resp.body().close(); (status, None) }
    } catch {
      case _: InterruptedException =>
        Thread.currentThread().interrupt() // keep Spark's task kill effective
        (599, None)
      case _: Exception => (599, None) // transport failure: a row, not a crash
    }

  private def get(url: String): (Int, Option[(String, String)]) =
    getRaw(url) match {
      case (status, Some((bytes, _, resp))) =>
        (status, Some((new String(bytes, charsetOf(resp)), resp.uri().toString)))
      case (status, None) => (status, None)
    }

  /** Read at most `maxBodyBytes` then CLOSE — the cap bounds what reaches
    * the executor heap (a byte-array body handler would buffer a multi-GB
    * or hostile unbounded response in full before any cap applied, and
    * one such URL would OOM the fetch partition the 599-per-row posture
    * protects). Closing mid-stream aborts the transfer. Returns
    * (bytes, truncated): when the cap is hit, one probe read decides
    * whether the stream actually had more (an exactly-cap-sized body is
    * not truncated). */
  private def readBounded(in: java.io.InputStream): (Array[Byte], Boolean) =
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(64 << 10, maxBodyBytes))
      val buf = new Array[Byte](64 << 10)
      var total = 0
      var truncated = false
      var n = in.read(buf)
      while (n >= 0 && total < maxBodyBytes) {
        val take = math.min(n, maxBodyBytes - total)
        if (take < n) truncated = true // a read overshot the cap: bytes discarded
        out.write(buf, 0, take)
        total += take
        n = if (total < maxBodyBytes) in.read(buf) else -1
      }
      if (total >= maxBodyBytes && !truncated) truncated = in.read() >= 0
      (out.toByteArray, truncated)
    } finally in.close()

  /** Base media type (lowercased, parameters stripped) from Content-Type,
    * defaulting to the octet-stream catch-all. */
  private def mediaTypeOf(resp: HttpResponse[_]): String = {
    val ct = resp.headers().firstValue("Content-Type").orElse("")
    val base = ct.split(";", 2)(0).trim.toLowerCase(java.util.Locale.ROOT)
    if (base.isEmpty) "application/octet-stream" else base
  }

  /** Charset from Content-Type — bare or RFC 9110 quoted parameter form —
    * defaulting to UTF-8 (the Diet sites are UTF-8 or Shift_JIS, both
    * resolvable by name here). */
  private def charsetOf(resp: HttpResponse[_]): java.nio.charset.Charset = {
    val ct = resp.headers().firstValue("Content-Type").orElse("")
    val m = "(?i)charset=\"?([A-Za-z0-9_\\-]+)\"?".r.findFirstMatchIn(ct)
    m.flatMap(g => scala.util.Try(java.nio.charset.Charset.forName(g.group(1))).toOption)
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
  }
}
