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
}
