package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Incremental-crawl freshness ops. The reference re-crawls by re-running
 * spiders behind a 600 s HTTP cache (crawler/settings.py:84-86) — fine
 * for hand-picked Diet sites, not for a 10^10-URL frontier where revisit
 * bandwidth is the scarcest resource. [[schedule]] implements the classic
 * adaptive revisit policy (Cho & Garcia-Molina, "Effective Page Refresh
 * Policies for Web Crawlers", TODS'03 family): per URL, the revisit
 * interval doubles while consecutive observations are unchanged and
 * resets on change, clamped to [minInterval, maxInterval].
 *
 * Input = the crawl's own fetch history: one row per (url, wave) with the
 * page's content hash (the fetched table provides all three; hashing the
 * body is one codegen'd xxhash64). Everything here is one window pass +
 * one aggregate over (url, wave, hash) rows — text never enters.
 *
 * Scale shape: the window partitions by url (no global sort); the
 * aggregate is map-side combinable; output is O(distinct urls) rows of
 * fixed-width integers, which is exactly the frontier-admission side
 * input the next crawl needs ("due" = next_due_wave ≤ current wave).
 */
object Recrawl {

  /** Per-URL revisit schedule from observation history.
    * Returns (url, n_obs, n_changes, streak, interval, next_due_wave):
    *  - `n_changes` counts observations whose hash differs from the
    *    previous one (first observation is never a change);
    *  - `streak` = consecutive unchanged observations at the tail
    *    (0 right after a change, n_obs - 1 for a never-changed URL);
    *  - `interval` = min(maxInterval, minInterval · 2^streak) waves;
    *  - `next_due_wave` = last observed wave + interval. */
  def schedule(obs: DataFrame, urlCol: String, waveCol: String,
      hashCol: String, minInterval: Int = 1, maxInterval: Int = 64): DataFrame = {
    require(minInterval >= 1 && maxInterval >= minInterval)
    // 2^shift beyond maxInterval/minInterval can't matter — cap the shift
    // so the integer shift never overflows regardless of streak
    val maxShift = 63 - java.lang.Long.numberOfLeadingZeros(
      (maxInterval / minInterval).max(1).toLong).toInt
    val w = Window.partitionBy(col(urlCol)).orderBy(col(waveCol))
    val marked = obs.select(
      col(urlCol).as("url"), col(waveCol).as("wave"), col(hashCol).as("h"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("changed",
        when(col("rnk") > 1 && col("h") =!= lag(col("h"), 1).over(w), 1)
          .otherwise(0))
    val agg = marked.groupBy("url").agg(
      count(lit(1)).as("n_obs"),
      sum(col("changed")).as("n_changes"),
      max(when(col("changed") === 1, col("rnk"))).as("last_change_rnk"),
      max(col("wave")).as("last_wave"))
    agg
      .withColumn("streak",
        col("n_obs") - coalesce(col("last_change_rnk"), lit(1)))
      .withColumn("interval", expr(
        s"least(CAST($maxInterval AS BIGINT), " +
          s"shiftleft(CAST($minInterval AS BIGINT), CAST(least(streak, $maxShift) AS INT)))"))
      .select(col("url"), col("n_obs"), col("n_changes"), col("streak"),
        col("interval"),
        (col("last_wave") + col("interval")).as("next_due_wave"))
  }

  /** The admission filter for the next crawl: URLs whose schedule says
    * they are due at `wave` (composes with the frontier's seed path). */
  def due(scheduleDf: DataFrame, wave: Long): DataFrame =
    scheduleDf.filter(col("next_due_wave") <= wave).select(col("url"))

  /** Sitemap-lastmod staleness — the PUSH half of freshness ([[schedule]]
    * extrapolates from observed change history; this consumes the host's
    * own "page X changed at T" declaration, sitemaps.org `<lastmod>`,
    * via [[graft.fetch.Sitemaps.entries]]). A URL is stale when the host
    * says it changed after we last stored it (`modified`), or when we
    * have never stored it at all (`unseen` — lastmod or not). A known URL
    * whose entry carries NO lastmod is NOT stale by this signal — the
    * host said nothing, so freshness falls back to [[schedule]]/[[due]].
    *
    * Scale shape: one max aggregate over observations (map-side
    * combinable, O(urls) fixed width) + one equi-join against the entry
    * list. Output joins straight into the refresh seed path
    * (`Sources.revalidatingSeeds` / plain seeds); composed with S14
    * revalidation the stale set re-fetches conditionally — lastmod is a
    * hint, not a validator, so a lying sitemap still costs only headers.
    *
    * Inputs: `entries` (url, lastmod_ms — null when unstated),
    * `obs` (url, stored_at_ms — e.g. [[observationsFromFetched]] output).
    * Returns (url, lastmod_ms, last_seen_ms, reason ∈ modified|unseen). */
  def staleByLastmod(entries: DataFrame, obs: DataFrame): DataFrame =
    entries
      .join(obs.groupBy(col("url"))
          .agg(max(col("stored_at_ms")).as("last_seen_ms")),
        Seq("url"), "left")
      .filter(col("last_seen_ms").isNull ||
        (col("lastmod_ms").isNotNull && col("lastmod_ms") > col("last_seen_ms")))
      .select(col("url"), col("lastmod_ms"), col("last_seen_ms"),
        when(col("last_seen_ms").isNull, lit("unseen"))
          .otherwise(lit("modified")).as("reason"))

  /** Observation rows from a crawl's fetched table
    * ([[graft.engine.WaveEngine.fetchedTable]]): one
    * (url, wave, stored_at_ms, h) per successful page fetch, with `h` a
    * content hash over the page's whole span sequence (order included).
    * Cross-RUN histories union several runs' rows and feed [[schedule]]
    * keyed on whichever time axis fits — `wave` within a run,
    * `stored_at_ms` across runs. */
  def observationsFromFetched(fetched: DataFrame): DataFrame =
    fetched
      .filter(col("status") >= 200 && col("status") < 300 &&
        col("parse_fn") =!= "media")
      .select(col("canonical").as("url"), col("wave"), col("stored_at_ms"),
        xxhash64(to_json(col("spans"))).as("h"))
}
