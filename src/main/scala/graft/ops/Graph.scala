package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics over the crawl's href plane. The reference never
 * ranks pages (its frontier is a LIFO queue, crawler/settings.py:23), but
 * a 10^10-URL frontier cannot fetch everything — admission and ordering
 * need a quality signal, and the classic crawl-native one is link analysis
 * over the pages already fetched (PageRank / in-degree / anchor text).
 * These ops consume the same `(src, dst)` edge rows the wave engine's
 * link-follow expansion (S9) already produces, so a crawl can periodically
 * rank its own discovered graph and feed `UrlRecord.priority`.
 *
 * Scale discipline:
 *  - every shuffle carries fixed-width (id, double) or (id, id) rows —
 *    never page text;
 *  - PageRank iterations reuse ONE hash partitioning: edges are
 *    pre-partitioned by `src` and cached once, each iteration's
 *    contribution shuffle is sized by |E|, and rank lineage is truncated
 *    with localCheckpoint so Catalyst analysis stays O(1) per round
 *    (same pattern as [[Cluster.connectedComponents]]);
 *  - dangling mass (pages fetched but with no out-links yet — the frontier
 *    tail is mostly dangling) is folded in with one scalar aggregate per
 *    iteration, not an N×N fixup;
 *  - anchor-text top-k runs its window over the PRE-AGGREGATED
 *    (dst, term, cnt) plane — the corpus-sized explode collapses in a
 *    map-side-combinable groupBy first, so the window never sorts raw
 *    anchor occurrences (the hot-page skew case: millions of in-links
 *    collapse to at most |distinct terms| rows per page before ranking).
 */
object Graph {

  /** PageRank with damping `d` over directed `edges(srcCol, dstCol)`.
    * `nodes` fixes the node universe (pages with no in- OR out-links
    * still hold rank mass). Returns (`id`, `rank`) with sum(rank) ≈ 1:
    * rank_{t+1}(v) = (1-d)/N + d·(Σ_{u→v} rank_t(u)/outdeg(u) + D_t/N)
    * where D_t is the total rank of dangling nodes. Deterministic up to
    * float summation order. Duplicate edges are collapsed first (the
    * href plane repeats links across boilerplate). */
  def pageRank(nodes: DataFrame, edges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val spark = nodes.sparkSession
    val idCol = nodes.columns.head
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty node set")
    val uniq = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = uniq.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // outdeg pre-joined onto the edge rows ONCE — iterations join a single
    // cached (src, dst, outdeg) relation, hash-partitioned by src so the
    // per-iteration rank⋈edge join reuses this partitioning
    val e = uniq.join(deg, "src").repartition(col("src")).cache()
    try {
      // the dangling flag is a pure function of the graph — computed once
      // and CARRIED through the iterations, so the per-iteration dangling
      // mass is a filter+agg over the rank rows, not an anti-join
      var ranks = nodes.select(col(idCol).as("id"))
        .join(deg.select(col("src").as("id"), lit(true).as("_out")), Seq("id"), "left")
        .select(col("id"), lit(1.0 / n).as("rank"), col("_out").isNull.as("dang"))
        .repartition(col("id")).localCheckpoint(eager = true)
      for (_ <- 1 to iters) {
        // dangling = rank mass on nodes with no out-edges. A one-row
        // aggregate cross-joined into the update (AQE broadcasts it) —
        // NOT a driver-side action: one materializing job per iteration
        val dangling = ranks.filter(col("dang"))
          .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
        val contrib = ranks.join(e, ranks("id") === e("src"))
          .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
          .groupBy("dst").agg(sum("c").as("s"))
        ranks = ranks.select("id", "dang")
          .join(contrib, col("id") === contrib("dst"), "left")
          .crossJoin(dangling)
          .select(col("id"),
            (lit((1.0 - damping) / n) + lit(damping) *
              (coalesce(col("s"), lit(0.0)) + col("dm") / n)).as("rank"),
            col("dang"))
          .localCheckpoint(eager = true)
      }
      ranks.select("id", "rank")
    } finally e.unpersist(blocking = false)
  }

  /** Per-target anchor summary: in-link count (distinct sources) and the
    * top `k` anchor terms by (occurrence count desc, term asc) joined
    * with ','. Input rows are raw anchor occurrences
    * (srcCol, dstCol, termCol) — one per link; sources repeating a term
    * count each occurrence (boilerplate nav links dominate by design:
    * that IS the signal anchor text carries). */
  def anchorSummary(anchors: DataFrame, srcCol: String, dstCol: String,
      termCol: String, k: Int = 3): DataFrame = {
    val byTerm = anchors
      .groupBy(col(dstCol).as("dst"), col(termCol).as("term"))
      .agg(count(lit(1)).as("cnt"))
    val topTerms = byTerm
      .withColumn("rk", row_number().over(
        Window.partitionBy("dst").orderBy(col("cnt").desc, col("term"))))
      .filter(col("rk") <= k)
      .groupBy("dst")
      .agg(concat_ws(",",
        transform(sort_array(collect_list(struct(col("rk"), col("term")))),
          x => x.getField("term"))).as("top_terms"))
    val inDeg = anchors
      .select(col(dstCol).as("dst"), col(srcCol).as("src")).distinct()
      .groupBy("dst").agg(count(lit(1)).as("in_links"))
    inDeg.join(topTerms, "dst")
  }

  /** Host-level link graph of a crawl's fetched pages: one distinct
    * (src, dst) host pair per observed cross-page link, built from the
    * link spans of successful page fetches with the same native
    * canonicalize/resolve expressions the frontier itself uses — so the
    * ranked graph is exactly the graph the crawl discovered. Input is
    * [[graft.engine.WaveEngine.fetchedTable]]. */
  def hostGraphFromFetched(fetched: DataFrame): DataFrame = {
    import graft.functions.UrlFns
    fetched
      .filter(col("status") >= 200 && col("status") < 300 &&
        col("parse_fn") =!= "media")
      .select(col("host").as("src"), col("canonical"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "link" && length(col("s.media_ref")) > 0)
      .select(col("src"),
        UrlFns.urlHost(UrlFns.canonicalizeUrl(
          UrlFns.resolveUrl(col("canonical"), col("s.media_ref")))).as("dst"))
      .filter(col("dst").isNotNull && col("dst") =!= "")
      .distinct()
  }

  /** Host → frontier priority (0..levels-1, higher = fetch earlier) from
    * PageRank over the crawl's own discovered host graph — the standard
    * between-crawl feedback loop: crawl, rank what was found, seed the
    * next crawl's [[graft.engine.RankPrioritizingParser]] with this map.
    * Driver-side by design: the HOST universe is O(10^7) at worst (the
    * URL universe is the 10^10 one), and the per-host map is broadcast
    * into parser closures anyway. The global ntile window runs over
    * O(hosts) rank rows, never URLs. */
  def hostPriorities(fetched: DataFrame, iters: Int = 5,
      levels: Int = 10): Map[String, Int] = {
    val g = hostGraphFromFetched(fetched)
    val nodes = g.select(col("src").as("h"))
      .union(g.select(col("dst").as("h"))).distinct()
    if (nodes.isEmpty) Map.empty
    else pageRank(nodes, g, iters = iters)
      .select(col("id"),
        (ntile(levels).over(Window.orderBy(col("rank"), col("id"))) - 1).as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
  }
}
