package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Crawler-trap detection by URL path TEMPLATE: collapse digit runs in
 * the path (`/cal/2020/1/5` → `/cal/{d}/{d}/{d}`) and measure, per
 * (host, template), how much NEW content the template actually yields.
 * Calendar pages, auto-generated pagination, and faceted listings
 * produce unbounded URL families whose content barely varies — the
 * per-host admission budget ([[graft.engine.WaveEngine]]'s trap guard)
 * caps the damage blindly; this op names the offending template so the
 * frontier can stop admitting it specifically, keeping the rest of the
 * host crawlable.
 *
 * `novelty` = distinct content hashes / distinct URLs in the template.
 * A template is flagged when it is both BIG (≥ `minUrls` — small
 * families prove nothing) and LOW-NOVELTY (≤ `maxNovelty`).
 *
 * Scale shape: one projection (the template is a scan-stage regexp) and
 * one aggregation keyed by (host, template); shuffles carry
 * (host, template, url, hash) — no bodies. Template cardinality is
 * bounded by real site structure (thousands per host, not millions),
 * so the result is broadcastable back into the frontier's admission
 * filter.
 */
object Traps {

  /** Per-(host, path-template) URL/content-novelty stats.
    * Returns (host, template, n_urls, n_hashes, novelty, is_trap). */
  def templateStats(fetched: DataFrame, urlCol: String, hashCol: String,
      minUrls: Int = 100, maxNovelty: Double = 0.1): DataFrame = {
    val url = col(urlCol)
    fetched
      .select(
        regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1).as("host"),
        regexp_replace(
          regexp_extract(url, "^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1),
          "[0-9]+", "{d}").as("template"),
        url.as("u"), col(hashCol).as("h"))
      .groupBy(col("host"), col("template"))
      .agg(countDistinct(col("u")).as("n_urls"),
        countDistinct(col("h")).as("n_hashes"))
      .select(col("host"), col("template"), col("n_urls"), col("n_hashes"),
        (col("n_hashes").cast("double") / col("n_urls")).as("novelty"))
      .withColumn("is_trap",
        col("n_urls") >= minUrls && col("novelty") <= maxNovelty)
  }

  /** The path template of an absolute URL — the executor-side twin of
    * [[templateStats]]'s scan-stage projection (digit runs in the path
    * collapse to `{d}`; query/fragment excluded; no path → ""). Single
    * pass, no regex: this runs once per emitted follow-up on the
    * frontier's hot path ([[graft.engine.TrapSkippingParser]]). */
  def templateOf(url: String): String = {
    val ss = url.indexOf("://")
    if (ss < 0) return ""
    val start = url.indexOf('/', ss + 3)
    if (start < 0) return ""
    val sb = new java.lang.StringBuilder(url.length - start)
    var i = start
    var inDigits = false
    while (i < url.length && url.charAt(i) != '?' && url.charAt(i) != '#') {
      val c = url.charAt(i)
      if (c >= '0' && c <= '9') {
        if (!inDigits) { sb.append("{d}"); inDigits = true }
      } else { sb.append(c); inDigits = false }
      i += 1
    }
    sb.toString
  }

  /** Collapse [[templateStats]] to host → trap templates, the form the
    * frontier consumer takes ([[graft.engine.TrapSkippingParser]]).
    * O(hosts·templates) — driver-safe: template cardinality is bounded
    * by site structure, and only flagged rows are collected. */
  def trapMap(stats: DataFrame): Map[String, Set[String]] =
    stats.filter(col("is_trap")).select("host", "template").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
}
