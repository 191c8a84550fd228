package graft.fetch

import graft.urls.UrlCanon

/**
 * robots.txt support for the deployable fetch path (S12).
 *
 * The reference crawls with `ROBOTSTXT_OBEY = False`
 * (/root/reference/crawler/settings.py:20), so the engine's gate defaults
 * off; when a deployment enables it, `CrawlConfig.robotsDisallow` wants a
 * host → path-prefix map. This object builds that map from live
 * `robots.txt` files:
 *
 *  - [[parse]] implements the original REP prefix subset the engine's
 *    gate enforces (`User-agent` groups, `Disallow` path prefixes,
 *    case-insensitive field names, `#` comments, BOM tolerated). `Allow`
 *    lines and wildcards are NOT modeled — the gate is a prefix filter —
 *    so a matching group's Allow lines are conservatively ignored
 *    (disallow wins: the engine may skip a page robots would allow, never
 *    fetch one it forbids).
 *  - a blanket `Disallow: /` group yields the single prefix `/`.
 *  - an empty `Disallow:` (allow-all marker) contributes nothing.
 *  - group selection: the most specific matching `User-agent` token wins
 *    (exact agent-substring match beats `*`), groups for other agents
 *    are ignored.
 *
 * [[fetchRules]] resolves each host's `https://host/robots.txt` through
 * any [[Fetcher]] — one bounded fetch per distinct host, driver-side.
 * Seed hosts resolve BEFORE the crawl starts; hosts discovered mid-crawl
 * resolve at the wave boundary before their first page fetch via
 * `CrawlConfig.robotsResolve =
 *   Some(os => Robots.fetchPoliciesForOrigins(fetcher, os))`
 * (the engine calls it once per novel host, passing the scheme+authority
 * origins the host was discovered under, and unions the result into its
 * gate maps — see WaveEngine's loop hook). A missing robots.txt (404,
 * transport failure) means no restrictions, per the REP.
 *
 * Note: [[HttpFetcher]] parses fetched bodies as HTML, so `fetchRules`
 * takes raw text through a dedicated plain-text fetch when given an
 * HttpFetcher; for corpus-backed fetchers the robots body is the
 * document's concatenated text spans.
 */
/** One host's parsed robots policy: Disallow path prefixes plus the
  * non-standard-but-ubiquitous `Crawl-delay` (seconds between fetches —
  * the reference's own politeness is a global `DOWNLOAD_DELAY = 1`,
  * /root/reference/crawler/settings.py:28; per-host robots delay is the
  * per-host generalization the engine's pace map already models). */
final case class RobotsPolicy(
    disallow: Seq[String] = Nil,
    crawlDelaySec: Option[Double] = None)

object Robots {

  /** Disallow prefixes applicable to `agent` (default: the wildcard
    * group). */
  def parse(robotsTxt: String, agent: String = "*"): Seq[String] =
    parsePolicy(robotsTxt, agent).disallow

  /** Full policy (prefixes + crawl-delay) for `agent`. */
  def parsePolicy(robotsTxt: String, agent: String = "*"): RobotsPolicy = {
    val lowerAgent = agent.toLowerCase
    var inMatchingGroup = false
    var matchedSpecific = false // an exact-agent group beats earlier * groups
    var sawAgentLine = false // inside a run of user-agent lines
    val starPrefixes = scala.collection.mutable.ArrayBuffer[String]()
    val exactPrefixes = scala.collection.mutable.ArrayBuffer[String]()
    var starDelay: Option[Double] = None
    var exactDelay: Option[Double] = None
    var currentIsExact = false

    for (raw <- robotsTxt.linesIterator) {
      val line0 = raw.replace("﻿", "")
      val line = (line0.indexOf('#') match {
        case -1 => line0
        case h => line0.substring(0, h)
      }).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              val tok = value.toLowerCase
              val matches = tok == "*" || lowerAgent.contains(tok)
              if (!sawAgentLine) { // a new group starts
                inMatchingGroup = matches
                currentIsExact = matches && tok != "*"
              } else if (matches) { // additional agents of the same group
                inMatchingGroup = true
                currentIsExact = currentIsExact || tok != "*"
              }
              // a specifically-matching group overrides the * group even
              // when it carries no Disallow at all (RFC 9309: the most
              // specific group applies — "User-agent: me\nDisallow:"
              // means unrestricted for me, whatever * says)
              if (currentIsExact) matchedSpecific = true
              sawAgentLine = true
            case "disallow" =>
              sawAgentLine = false
              if (inMatchingGroup && value.nonEmpty) {
                // wildcard rules are kept CONSERVATIVELY: the engine's
                // gate is a prefix filter, so truncate at the first '*'
                // (and drop a trailing '$' anchor) — the gate may then
                // skip pages robots would allow, but never fetches one a
                // wildcard rule forbids ("/private*" → "/private",
                // "/*.pdf" → "/")
                val lit0 = value.indexOf('*') match {
                  case -1 => value
                  case s => value.substring(0, s)
                }
                val lit = if (lit0.endsWith("$")) lit0.dropRight(1) else lit0
                val prefix = if (lit.isEmpty) "/" else lit
                if (currentIsExact) exactPrefixes += prefix
                else starPrefixes += prefix
              }
            case "crawl-delay" =>
              sawAgentLine = false
              if (inMatchingGroup) {
                // non-numeric values are ignored; several delays in the
                // applicable groups keep the MAX (conservative: slower)
                value.toDoubleOption.filter(d => d > 0 && d.isFinite).foreach { d =>
                  if (currentIsExact)
                    exactDelay = Some(exactDelay.fold(d)(math.max(_, d)))
                  else starDelay = Some(starDelay.fold(d)(math.max(_, d)))
                }
              }
            case _ =>
              sawAgentLine = false
          }
        }
      }
    }
    if (matchedSpecific) RobotsPolicy(exactPrefixes.distinct.toSeq, exactDelay)
    else RobotsPolicy(starPrefixes.distinct.toSeq, starDelay)
  }

  /** Build `CrawlConfig.robotsDisallow` for a set of hosts by fetching
    * each `https://host/robots.txt` through `fetcher`. Absent or failing
    * robots mean no restrictions.
    *
    * An [[HttpFetcher]] uses its raw-text path (robots.txt is
    * line-oriented; the HTML parser would collapse newlines). Other
    * fetchers reconstruct the body from the document's text spans, one
    * line per span — the convention corpus fixtures use.
    *
    * `hosts` are authorities for URL construction (may carry a port); the
    * returned map is keyed by [[UrlCanon.hostOf]]'s host form — the exact
    * key the engine's candidate gate looks up. */
  def fetchRules(fetcher: Fetcher, hosts: Seq[String],
      agent: String = "*", scheme: String = "https"): Map[String, Seq[String]] =
    fetchPolicies(fetcher, hosts, agent, scheme)
      .collect { case (k, p) if p.disallow.nonEmpty => k -> p.disallow }

  /** Like [[fetchRules]] but returns the full per-host policy (disallow
    * prefixes + crawl-delay). Hosts with neither restriction are absent. */
  def fetchPolicies(fetcher: Fetcher, hosts: Seq[String],
      agent: String = "*", scheme: String = "https"): Map[String, RobotsPolicy] =
    fetchPoliciesForOrigins(fetcher, hosts.map(h => s"$scheme://$h"), agent)

  /** Raw text of `url` through any fetcher: [[HttpFetcher]] uses its
    * non-HTML-parsing path; corpus fetchers rebuild the body from the
    * document's text spans, one line per span (the fixture convention).
    * Shared by the robots and sitemap fetch paths. */
  private[fetch] def rawBody(fetcher: Fetcher, url: String): Option[String] =
    fetcher match {
      case h: HttpFetcher => h.fetchText(url) match {
        case (s, b) if s >= 200 && s < 300 => b
        case _ => None
      }
      case f => f.fetch(url) match {
        case (s, Some(doc)) if s >= 200 && s < 300 =>
          Some(doc.spans.map(_.text).filter(_.nonEmpty).mkString("\n"))
        case _ => None
      }
    }

  /** [[fetchPolicies]] over full origins ("scheme://authority") instead of
    * https-assumed bare hosts — the form `CrawlConfig.robotsResolve`
    * feeds, preserving the scheme and port each host was discovered
    * under. Results are keyed by the port-less gate-key host. */
  def fetchPoliciesForOrigins(fetcher: Fetcher, origins: Seq[String],
      agent: String = "*"): Map[String, RobotsPolicy] =
    origins.distinct.flatMap { origin =>
      val url = s"$origin/robots.txt"
      val gateKey = UrlCanon.hostOf(UrlCanon.canonicalize(url))
      rawBody(fetcher, url)
        .map(b => parsePolicy(b, agent))
        .filter(p => p.disallow.nonEmpty || p.crawlDelaySec.nonEmpty)
        .map(gateKey -> _)
    }
      // several authorities (ports/schemes) can collapse to one gate key:
      // UNION their prefixes and keep the slowest delay — last-wins would
      // silently drop an earlier authority's restrictions
      .groupBy(_._1)
      .map { case (k, vs) =>
        k -> RobotsPolicy(
          vs.flatMap(_._2.disallow).distinct.toSeq,
          vs.flatMap(_._2.crawlDelaySec).maxOption)
      }

  /** Does `url` pass the given rules? (The same prefix test the engine's
    * candidate gate applies — exposed for tests and ad-hoc use.) */
  def allowed(rules: Map[String, Seq[String]], url: String): Boolean = {
    val canon = UrlCanon.canonicalize(url)
    val host = UrlCanon.hostOf(canon)
    val path = UrlCanon.parse(canon).path
    !rules.getOrElse(host, Nil).exists(path.startsWith)
  }
}
