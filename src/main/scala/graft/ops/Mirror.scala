package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mirror-host detection: hosts serving (near-)identical page SETS —
 * country mirrors, CDN vanity domains, scraped re-hosts. A 10^10-URL
 * crawl that doesn't collapse mirrors fetches every page once per
 * mirror; host-level containment over page content hashes is the
 * standard cheap detector (page-level dedup alone can't DECIDE to stop
 * crawling the mirror host — this op produces that decision's input).
 *
 * Shape: distinct (host, hash) → per-hash host pairs → pair counts →
 * containment = |A∩B| / min(|A|, |B|). Same skew discipline as the
 * shingle/posting joins ([[Dedup.jaccardFor]]'s df cap): a hash present
 * on more than `maxHashDf` hosts is template boilerplate (error pages,
 * parked-domain bodies) — it would emit df² pairs and carries no mirror
 * signal, so it is dropped BEFORE pair expansion, bounding the join at
 * |rows|·maxHashDf. Shuffles carry (host, hash) pairs only.
 */
object Mirror {

  /** Host pairs with page-set containment ≥ `minContainment`.
    * Returns (host_a, host_b, inter, containment), host_a < host_b.
    * `inter` counts distinct shared hashes (post df-cap); sizes are
    * pre-cap (the cap may only LOWER containment — conservative). */
  def mirrorHosts(pages: DataFrame, hostCol: String, hashCol: String,
      minContainment: Double = 0.5, maxHashDf: Int = 256): DataFrame = {
    val ph = pages.select(col(hostCol).as("host"), col(hashCol).as("h")).distinct()
    val sizes = ph.groupBy("host").agg(count(lit(1)).as("n"))
    val capped = ph
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df") <= maxHashDf)
      .select("host", "h")
    val inter = capped.as("a")
      .join(capped.as("b"),
        col("a.h") === col("b.h") && col("a.host") < col("b.host"))
      .groupBy(col("a.host").as("host_a"), col("b.host").as("host_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("host").as("host_a"), col("n").as("na")), "host_a")
      .join(sizes.select(col("host").as("host_b"), col("n").as("nb")), "host_b")
      .select(col("host_a"), col("host_b"), col("inter"),
        (col("inter").cast("double") / least(col("na"), col("nb"))).as("containment"))
      .filter(col("containment") >= minContainment)
  }

  /** Collapse [[mirrorGroups]] to the hosts a next crawl should SKIP
    * (every grouped host that is not its group's canonical) — the form
    * the frontier consumer takes
    * ([[graft.engine.MirrorSkippingParser]], seed-list pruning).
    * O(hosts) — driver-safe by construction. */
  def skipHosts(groups: DataFrame): Set[String] =
    groups.filter(!col("is_canonical"))
      .select("host").collect().map(_.getString(0)).toSet

  /** Mirror GROUPS: [[mirrorHosts]] pairs → connected components
    * ([[Cluster.connectedComponents]] — mirror relations are transitive
    * in practice but the pair list isn't: A~B, B~C with A,C just under
    * threshold still belong to one group) → one CANONICAL host per
    * group: the host serving the most distinct pages (ties → smallest
    * host string — deterministic). This is the crawl-side decision
    * table: fetch canonical hosts, skip the rest.
    *
    * Returns one row per grouped host:
    * (host, canonical, n_hosts, n_pages, is_canonical), hosts in no
    * mirror pair absent (each is trivially its own canonical). Scale:
    * the pair list and component table are O(hosts) — tiny next to
    * pages — so every join here is broadcast-able by AQE; page rows
    * are touched once, for the distinct-hash host sizes. */
  def mirrorGroups(pages: DataFrame, hostCol: String, hashCol: String,
      minContainment: Double = 0.5, maxHashDf: Int = 256): DataFrame = {
    val pairs = mirrorHosts(pages, hostCol, hashCol, minContainment, maxHashDf)
    val comp = Cluster.connectedComponents(pairs, "host_a", "host_b")
      .withColumnRenamed("id", "host")
    val sizes = pages
      .select(col(hostCol).as("host"), col(hashCol).as("h")).distinct()
      .groupBy("host").agg(count(lit(1)).as("n_pages"))
    val member = comp.join(sizes, "host")
    val groups = member.groupBy("component").agg(
      count(lit(1)).as("n_hosts"),
      min_by(col("host"), struct((-col("n_pages")).as("np"), col("host")))
        .as("canonical"))
    member.join(groups, "component")
      .select(col("host"), col("canonical"), col("n_hosts"), col("n_pages"),
        (col("host") === col("canonical")).as("is_canonical"))
  }
}
