package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Queries.Q

/**
 * Query batch D: link-graph analytics and corpus search (round 4).
 * The crawl's own discovered link graph is the quality signal a
 * 10^10-URL frontier prioritizes by; the inputs here are synthesized
 * deterministically from `documents` with arithmetic both engines
 * express identically (BASELINE.json: no external data).
 *
 * The synthetic graph (q60): node set = all doc_ids; a doc with
 * `doc_id % 17 == 0` emits NO links (dangling — exercises the
 * dangling-mass redistribution), otherwise it emits `1 + doc_id % 3`
 * links with dst = (doc_id²·31 + 13k) % N — irregular in/out degrees,
 * self-loops possible and kept by both engines.
 */
object QueriesD {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** One unrolled PageRank iteration for the DuckDB oracle (the oracle
    * engine has no iteration, so 5 rounds are 5 CTE stages; the dangling
    * scalar is its own one-row cross join, exactly the engine's one
    * scalar aggregate per round). */
  private def prIter(k: Int): String =
    s"""r$k AS (SELECT d.doc_id AS id, 0.15/nn.n + 0.85*(coalesce(c.s, 0) + dang${k - 1}.dm/nn.n) AS rank
       |  FROM documents d CROSS JOIN nn CROSS JOIN (
       |    SELECT coalesce(sum(r.rank), 0) AS dm FROM r${k - 1} r
       |    LEFT JOIN deg ON deg.src = r.id WHERE deg.src IS NULL) dang${k - 1}
       |  LEFT JOIN (
       |    SELECT e.dst, sum(r.rank/deg.outdeg) AS s
       |    FROM e JOIN r${k - 1} r ON r.id = e.src JOIN deg ON deg.src = e.src
       |    GROUP BY 1) c
       |  ON c.dst = d.doc_id)""".stripMargin

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // q60: PageRank over the synthetic link graph (damping 0.85, 5
    // iterations, dangling mass redistributed uniformly). The engine op
    // is graft.ops.Graph.pageRank — per-iteration shuffles carry
    // (id, double) rows only, edges keep one cached partitioning.
    // ------------------------------------------------------------------
    "q60_pagerank" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val n = docs.count()
        val nodes = docs.select(col("doc_id"))
        val edges = docs
          .filter(col("doc_id") % 17 =!= 0)
          .select(col("doc_id").as("src"),
            explode(slice(
              array((1 to 3).map(k =>
                (col("doc_id") * col("doc_id") * 31 + lit(13 * k)) % n): _*),
              lit(1), (lit(1) + col("doc_id") % 3).cast("int"))).as("dst"))
        graft.ops.Graph.pageRank(nodes, edges, iters = 5)
          .select(col("id").as("doc_id"), round(col("rank"), 7).as("rank"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH nn AS (SELECT count(*) AS n FROM documents),
              |e AS (SELECT DISTINCT doc_id AS src, (doc_id*doc_id*31 + 13*k.k) % nn.n AS dst
              |      FROM documents CROSS JOIN nn CROSS JOIN (VALUES (1),(2),(3)) k(k)
              |      WHERE k.k <= 1 + doc_id % 3 AND doc_id % 17 <> 0),
              |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
              |r0 AS (SELECT doc_id AS id, 1.0/nn.n AS rank FROM documents CROSS JOIN nn),
              |${(1 to 5).map(prIter).mkString(",\n")}
              |SELECT id AS doc_id, round(rank, 7) AS rank FROM r5 ORDER BY doc_id""".stripMargin),
      "PageRank over the crawl link graph (Graph.pageRank; frontier quality signal)"),

    // ------------------------------------------------------------------
    // q61: anchor-text aggregation — per link target: distinct-source
    // in-link count + top-3 anchor terms by (count desc, term asc). The
    // window runs over the pre-aggregated (dst, term, cnt) plane, never
    // raw occurrences (Graph.anchorSummary).
    // Anchors: every 5th token of each doc anchors a link to
    // (doc_id*3 + token_index) % N with the token as anchor text.
    // ------------------------------------------------------------------
    "q61_anchor_topk" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val n = docs.count()
        val toks = split(trim(col("text")), "\\s+")
        val occ = docs
          .select(col("doc_id").as("src"),
            explode(filter(
              transform(toks, (tok, i) => struct(tok.as("t"), i.as("i"))),
              x => x.getField("i") % 5 === 0)).as("a"))
          .select(col("src"),
            ((col("src") * 3 + col("a.i")) % n).as("dst"),
            col("a.t").as("term"))
        graft.ops.Graph.anchorSummary(occ, "src", "dst", "term", k = 3)
          .orderBy(col("dst"))
      },
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |occ AS (
             |  SELECT src, (src*3 + a[2]) % nn.n AS dst, a[1] AS term
             |  FROM (SELECT doc_id AS src,
             |          unnest(list_filter(list_zip(ts, generate_series(0, len(ts)-1)), x -> x[2] % 5 = 0)) AS a
             |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents))
             |  CROSS JOIN nn),
             |byterm AS (SELECT dst, term, count(*) AS cnt FROM occ GROUP BY 1, 2),
             |rk AS (SELECT dst, term, cnt,
             |         row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, term) AS rk
             |       FROM byterm),
             |topt AS (SELECT dst, string_agg(term, ',' ORDER BY rk) AS top_terms
             |         FROM rk WHERE rk <= 3 GROUP BY 1),
             |ind AS (SELECT dst, count(DISTINCT src) AS in_links FROM occ GROUP BY 1)
             |SELECT ind.dst, in_links, top_terms
             |FROM ind JOIN topt ON ind.dst = topt.dst ORDER BY ind.dst""".stripMargin),
      "anchor-text top-k + in-link counts (Graph.anchorSummary)"),

    // ------------------------------------------------------------------
    // q62: BM25 ranking of a fixed 4-term query against the corpus
    // (Search.bm25): the corpus explode is filtered against the literal
    // term set inside the scan's codegen stage, the df plane is O(|q|)
    // rows and broadcast — text never shuffles.
    // ------------------------------------------------------------------
    "q62_bm25" -> Q(
      (s, d) => graft.ops.Search.bm25(
          t(s, d, "documents"), "doc_id", "text",
          Seq("data", "spark", "join", "scan"))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id")),
      Some(s"""WITH docs_t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents),
              |stats AS (SELECT count(*) AS n, avg(len(ts)) AS avgdl FROM docs_t),
              |hits AS (
              |  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
              |  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM docs_t) u
              |  WHERE term IN ('data','spark','join','scan') GROUP BY 1, 2),
              |dfp AS (SELECT term, count(*) AS df FROM hits GROUP BY 1),
              |sc AS (SELECT h.doc_id,
              |  sum(ln(1 + (s.n - d.df + 0.5)/(d.df + 0.5)) * (h.tf*2.2)/(h.tf + 1.2*(0.25 + 0.75*h.dl/s.avgdl))) AS score
              |  FROM hits h JOIN dfp d ON h.term = d.term CROSS JOIN stats s GROUP BY 1)
              |SELECT doc_id, round(score, 6) AS score FROM sc ORDER BY doc_id""".stripMargin),
      "BM25 query scoring over the inverted-index plane (Search.bm25)"))
}
