package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL-level quality filtering (RefinedWeb, Penedo et al. 2023
 * arXiv:2306.01116 §3.1: a host blocklist, a weighted spam-keyword URL
 * score, and structural URL heuristics run BEFORE any fetch or text
 * processing — the cheapest gate in the pipeline, so it goes first).
 * The reference crawler needs none of this (closed seed universe); a
 * web-scale frontier needs it both as a corpus op (score what was
 * crawled) and at link emission (don't fetch it in the first place —
 * [[graft.engine.UrlFilterSkippingParser]] consumes the same [[Config]]
 * through the row-local twin [[verdictOf]], which UrlFilterSpec pins
 * against the column plane).
 *
 * All extraction and matching runs over the LOWERCASED url: spam sites
 * control their own link casing, so a case-sensitive host blocklist (or
 * a scheme regex anchored at `^[a-z]`) is trivially evaded by
 * `HTTPS://SPAM.example/…`. Config hosts/suffixes/keywords are
 * lowercased once at construction.
 *
 * Scale shape: everything is a row-local codegen'd expression — ZERO
 * exchanges in the whole plan (PlanSpec-pinned); the config rides the
 * expression tree as literals (O(keywords + hosts), broadcast-free).
 * The keyword score folds in SORTED keyword order so the double sum is
 * independent of config-map iteration order.
 *
 * Rule precedence (first hit wins, one CASE chain):
 * blocked_host > word_score > too_long > digit_ratio > query_params >
 * path_depth > ok.
 */
object UrlFilter {

  /** Filter policy. `blockedHosts` match exactly; `blockedSuffixes`
    * match host tails (ban a registrable domain with ".domain.tld").
    * `wordWeights` are summed over keywords CONTAINED in the lowercased
    * URL; ≥ `softThreshold` blocks. */
  final case class Config(
      blockedHosts: Set[String] = Set.empty,
      blockedSuffixes: Seq[String] = Seq.empty,
      wordWeights: Map[String, Double] = Map.empty,
      softThreshold: Double = 1.0,
      maxUrlLength: Int = 2048,
      maxDigitRatio: Double = 0.5,
      maxQueryParams: Int = 8,
      maxPathDepth: Int = 12) {
    /** Lowercased match planes, computed once — the twin runs per
      * emitted link inside the fetch task, so no per-URL sort or
      * per-keyword re-lowercasing belongs on that path. Keywords stay
      * sorted by the ORIGINAL key (the column plane's fold order) so the
      * double sum is identical in both planes. */
    private[ops] lazy val hostsLower: Set[String] = blockedHosts.map(_.toLowerCase)
    private[ops] lazy val suffixesLower: Seq[String] = blockedSuffixes.map(_.toLowerCase)
    private[ops] lazy val weightsSorted: Array[(String, Double)] =
      wordWeights.toSeq.sortBy(_._1).map { case (k, w) => (k.toLowerCase, w) }.toArray
  }

  // shared Java∩RE2 extraction patterns (one string drives Spark, the
  // DuckDB oracle, and the Scala twin); always applied to lower(url)
  private[ops] val HostRe = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
  private[ops] val PathRe = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
  private[ops] val QueryRe = "\\?([^#]*)"

  def hostOf(url: Column): Column = regexp_extract(lower(url), HostRe, 1)
  def pathOf(url: Column): Column = regexp_extract(lower(url), PathRe, 1)
  def queryOf(url: Column): Column = regexp_extract(lower(url), QueryRe, 1)

  /** Σ weight over keywords contained in lower(url), folded in sorted
    * keyword order (order-invariant double). */
  def wordScore(url: Column, weights: Map[String, Double]): Column =
    if (weights.isEmpty) lit(0.0)
    else {
      val lo = lower(url)
      weights.toSeq.sortBy(_._1).map { case (kw, w) =>
        when(lo.contains(kw.toLowerCase), lit(w)).otherwise(lit(0.0))
      }.reduce(_ + _)
    }

  /** Digit fraction of the path (0.0 for an empty path). */
  def digitRatio(path: Column): Column =
    when(length(path) === 0, lit(0.0)).otherwise(
      length(regexp_replace(path, "[^0-9]", "")).cast("double") /
        length(path))

  /** `?a=1&b=2` → 2; empty query → 0. */
  def queryParamCount(query: Column): Column =
    when(length(query) === 0, lit(0)).otherwise(size(split(query, "&")))

  /** `/a/b/c` → 3; "" or "/" → 0. Trailing slashes don't add depth. */
  def pathDepth(path: Column): Column =
    size(filter(split(path, "/"), s => length(s) > 0))

  private def hostBlocked(host: Column, cfg: Config): Column = {
    val exact =
      if (cfg.hostsLower.isEmpty) lit(false)
      else host.isInCollection(cfg.hostsLower.toSeq.sorted)
    cfg.suffixesLower.foldLeft(exact)((acc, s) => acc || host.endsWith(s))
  }

  /** The verdict column: "ok" or the first violated rule's name. */
  def verdict(url: Column, cfg: Config): Column = {
    val host = hostOf(url)
    val path = pathOf(url)
    when(hostBlocked(host, cfg), lit("blocked_host"))
      .when(wordScore(url, cfg.wordWeights) >= cfg.softThreshold,
        lit("word_score"))
      .when(length(url) > cfg.maxUrlLength, lit("too_long"))
      .when(digitRatio(path) > cfg.maxDigitRatio, lit("digit_ratio"))
      .when(queryParamCount(queryOf(url)) > cfg.maxQueryParams,
        lit("query_params"))
      .when(pathDepth(path) > cfg.maxPathDepth, lit("path_depth"))
      .otherwise(lit("ok"))
  }

  /** Corpus-plane audit: input + (url_host, word_score, url_verdict). */
  def audit(df: DataFrame, urlCol: String, cfg: Config): DataFrame =
    df.withColumn("url_host", hostOf(col(urlCol)))
      .withColumn("word_score", wordScore(col(urlCol), cfg.wordWeights))
      .withColumn("url_verdict", verdict(col(urlCol), cfg))

  /** Survivors only — the pre-fetch gate as a pure pushdown-friendly
    * predicate. */
  def keep(df: DataFrame, urlCol: String, cfg: Config): DataFrame =
    df.filter(verdict(col(urlCol), cfg) === "ok")

  // ------------------------------------------------------------------
  // Row-local Scala twin — the engine-side consumer
  // (UrlFilterSkippingParser) runs per follow-up URL inside the fetch
  // task; UrlFilterSpec pins twin ≡ column plane on adversarial URLs.
  // Lengths count CODE POINTS (Spark's length() / DuckDB's len()), not
  // Java UTF-16 units — supplementary chars would otherwise diverge.
  // ------------------------------------------------------------------

  private val hostP = java.util.regex.Pattern.compile(HostRe)
  private val pathP = java.util.regex.Pattern.compile(PathRe)
  private val queryP = java.util.regex.Pattern.compile(QueryRe)
  private def re1(p: java.util.regex.Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) Option(m.group(1)).getOrElse("") else ""
  }
  private def cp(s: String): Int = s.codePointCount(0, s.length)

  /** Scala twin of [[verdict]]. */
  def verdictOf(url: String, cfg: Config): String = {
    val lo = url.toLowerCase
    val host = re1(hostP, lo)
    val path = re1(pathP, lo)
    val query = re1(queryP, lo)
    var score = 0.0
    var i = 0
    val ws = cfg.weightsSorted
    while (i < ws.length) {
      if (lo.contains(ws(i)._1)) score += ws(i)._2
      i += 1
    }
    val dr =
      if (path.isEmpty) 0.0
      // ASCII digits only — the column plane's [^0-9] class (each is one
      // code point, so the numerator needs no code-point correction)
      else path.count(c => c >= '0' && c <= '9').toDouble / cp(path)
    val qp = if (query.isEmpty) 0 else query.split("&", -1).length
    val pd = path.split("/").count(_.nonEmpty)
    if (cfg.hostsLower.contains(host) ||
        cfg.suffixesLower.exists(host.endsWith)) "blocked_host"
    else if (score >= cfg.softThreshold) "word_score"
    else if (cp(url) > cfg.maxUrlLength) "too_long"
    else if (dr > cfg.maxDigitRatio) "digit_ratio"
    else if (qp > cfg.maxQueryParams) "query_params"
    else if (pd > cfg.maxPathDepth) "path_depth"
    else "ok"
  }
}
