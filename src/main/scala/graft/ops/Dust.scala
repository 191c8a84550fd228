package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * DUST mining: Different URLs, Similar Text (Bar-Yossef et al., WWW'07
 * — "Do Not Crawl in the DUST"). Session ids, tracking tags, and other
 * content-irrelevant query parameters multiply every page into an
 * unbounded URL family; at a 10^10-URL frontier they are the dominant
 * source of wasted fetches AFTER exact dedup (the fetch happens before
 * the content hash can dedup it). This op learns, per (host, param),
 * whether the param ever changes content, from pages the crawl has
 * already fetched — the output feeds [[graft.urls.UrlCanon]]-style
 * canonicalization so the FRONTIER collapses the family before
 * fetching.
 *
 * Rule mining, per candidate (host, param key):
 *   - group fetched URLs by (base-without-the-param): same scheme/host/
 *     path + the remaining query pairs sorted (so `?a=1&sid=x` and
 *     `?sid=y&a=1` land together);
 *   - an EVIDENCE group is one exhibiting ≥ 2 distinct values of the
 *     param — a single value proves nothing;
 *   - the param is CONSISTENT in a group iff all rows share one content
 *     hash; it is judged irrelevant on the host iff every evidence
 *     group is consistent and there are ≥ `minEvidence` of them.
 *
 * Scale shape: one explode of query pairs (bounded by pairs-per-URL),
 * two hash aggregations — (host,key,group) then (host,key); shuffles
 * carry (host, key, group-key, hash) rows, never page bodies. The
 * verdict table is O(hosts·keys) — broadcastable to the canonicalizer.
 */
object Dust {

  /** Per-(host, param) irrelevance verdicts from fetched (url, hash)
    * rows. Returns (host, param, n_groups, n_consistent, irrelevant),
    * one row per (host, param key) that has ≥ 1 evidence group. */
  def irrelevantParams(fetched: DataFrame, urlCol: String, hashCol: String,
      minEvidence: Int = 2): DataFrame = {
    val url = col(urlCol)
    val withParts = fetched.select(
        url.as("url"), col(hashCol).as("h"),
        regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1).as("host"),
        substring_index(url, "?", 1).as("base"),
        regexp_extract(url, "\\?([^#]*)", 1).as("qs"))
      .filter(col("qs") =!= "")
      .withColumn("kvs", split(col("qs"), "&"))
    // one row per (url, query pair); group key = everything but the pair
    val exploded = withParts
      .select(col("host"), col("h"), col("base"), col("kvs"),
        explode(col("kvs")).as("kv"))
      .select(col("host"), col("h"),
        substring_index(col("kv"), "=", 1).as("param"),
        col("kv"),
        concat(col("base"), lit("|"),
          array_join(array_sort(array_remove(col("kvs"), col("kv"))), "&"))
          .as("gk"))
    val groups = exploded
      .groupBy(col("host"), col("param"), col("gk"))
      .agg(countDistinct(col("kv")).as("n_vals"),
        countDistinct(col("h")).as("n_hashes"))
      .filter(col("n_vals") >= 2)
    groups
      .groupBy(col("host"), col("param"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_hashes") === 1, 1L).otherwise(0L)).as("n_consistent"))
      .select(col("host"), col("param"), col("n_groups"), col("n_consistent"),
        (col("n_consistent") === col("n_groups") &&
          col("n_groups") >= minEvidence).as("irrelevant"))
  }

  /** Collapse [[irrelevantParams]] verdicts to host → params-to-drop, the
    * form the frontier-side consumers take
    * ([[graft.engine.DustCanonicalizingParser]], [[canonicalizeUrls]]'s
    * broadcast side). O(hosts·keys) — driver-safe by construction. */
  def dropMap(verdicts: DataFrame): Map[String, Set[String]] =
    verdicts.filter(col("irrelevant")).select("host", "param").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap

  /** Rewrite URLs dropping the params judged irrelevant for their host
    * — the frontier-side consumer of [[irrelevantParams]]. `verdicts`
    * is broadcast (O(hosts·keys)); the rewrite is a map-side transform:
    * remaining pairs keep their original order, a query that empties
    * loses its `?`. Returns the input plus `canonical_url`. */
  def canonicalizeUrls(urls: DataFrame, urlCol: String,
      verdicts: DataFrame): DataFrame = {
    val drop = verdicts.filter(col("irrelevant"))
      .groupBy(col("host")).agg(collect_set(col("param")).as("drop_params"))
      .select(col("host").as("__dhost"), col("drop_params"))
    val url = col(urlCol)
    urls
      .withColumn("__host",
        regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
      .join(broadcast(drop), col("__host") === col("__dhost"), "left")
      .withColumn("__kept",
        when(col("drop_params").isNull || !url.contains("?"), lit(null))
          .otherwise(filter(
            split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
            kv => !array_contains(col("drop_params"),
              substring_index(kv, "=", 1)))))
      .withColumn("canonical_url",
        when(col("__kept").isNull, url)
          .when(size(col("__kept")) === 0, substring_index(url, "?", 1))
          .otherwise(concat(substring_index(url, "?", 1), lit("?"),
            array_join(col("__kept"), "&"))))
      .drop("__host", "__dhost", "__kept", "drop_params")
  }
}
