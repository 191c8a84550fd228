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
      "BM25 query scoring over the inverted-index plane (Search.bm25)"),

    // ------------------------------------------------------------------
    // q63: adaptive recrawl scheduling (Recrawl.schedule) — per URL the
    // revisit interval doubles while content is unchanged, resets on
    // change (Cho/Garcia-Molina policy). History synthesized: 5 waves per
    // url, content hash advances every (1 + url % 3) waves.
    // ------------------------------------------------------------------
    "q63_recrawl_schedule" -> Q(
      (s, d) => {
        val obs = t(s, d, "documents")
          .select(col("doc_id").as("url"),
            explode(sequence(lit(0), lit(4))).as("wave"))
          .withColumn("h", col("url") * 100 +
            floor(col("wave") / (lit(1) + col("url") % 3)).cast("long"))
        graft.ops.Recrawl.schedule(obs, "url", "wave", "h",
            minInterval = 1, maxInterval = 64)
          .select(col("url"), col("n_obs").cast("long").as("n_obs"),
            col("n_changes").cast("long").as("n_changes"),
            col("streak").cast("long").as("streak"),
            col("interval").cast("long").as("interval"),
            col("next_due_wave").cast("long").as("next_due_wave"))
          .orderBy(col("url"))
      },
      Some("""WITH obs AS (
             |  SELECT doc_id AS url, w.wave AS wave,
             |    doc_id*100 + CAST(floor(w.wave/(1 + doc_id % 3)) AS BIGINT) AS h
             |  FROM documents CROSS JOIN (VALUES (0),(1),(2),(3),(4)) w(wave)),
             |m AS (SELECT url, wave, h,
             |    row_number() OVER (PARTITION BY url ORDER BY wave) AS rnk,
             |    CASE WHEN lag(h) OVER (PARTITION BY url ORDER BY wave) IS NOT NULL
             |          AND h <> lag(h) OVER (PARTITION BY url ORDER BY wave)
             |         THEN 1 ELSE 0 END AS changed
             |  FROM obs),
             |a AS (SELECT url, count(*) AS n_obs, sum(changed) AS n_changes,
             |    max(CASE WHEN changed = 1 THEN rnk END) AS lcr, max(wave) AS last_wave
             |  FROM m GROUP BY 1)
             |SELECT url, CAST(n_obs AS BIGINT) AS n_obs,
             |  CAST(n_changes AS BIGINT) AS n_changes,
             |  CAST(n_obs - coalesce(lcr, 1) AS BIGINT) AS streak,
             |  CAST(least(64, 1 << least(CAST(n_obs - coalesce(lcr, 1) AS INT), 6)) AS BIGINT) AS interval,
             |  CAST(last_wave + least(64, 1 << least(CAST(n_obs - coalesce(lcr, 1) AS INT), 6)) AS BIGINT) AS next_due_wave
             |FROM a ORDER BY url""".stripMargin),
      "adaptive revisit schedule: doubling interval, change reset (Recrawl.schedule)"),

    // ------------------------------------------------------------------
    // q64: mirror-host detection (Mirror.mirrorHosts) — host pairs whose
    // page-hash sets have containment ≥ 0.5. Pages synthesized: 8 hosts,
    // hash = doc_id % 60 with a deterministic 1-in-13 perturbation so
    // overlaps differ per pair.
    // ------------------------------------------------------------------
    "q64_mirror_hosts" -> Q(
      (s, d) => {
        val pages = t(s, d, "documents").select(
          concat(lit("h"), (col("doc_id") % 8).cast("string")).as("host"),
          ((col("doc_id") % 60) +
            when(col("doc_id") % 13 === 0, 1000).otherwise(0)).as("h"))
        graft.ops.Mirror.mirrorHosts(pages, "host", "h",
            minContainment = 0.5, maxHashDf = 256)
          .select(col("host_a"), col("host_b"), col("inter"),
            round(col("containment"), 4).as("containment"))
          .orderBy(col("host_a"), col("host_b"))
      },
      Some("""WITH pg AS (SELECT 'h' || CAST(doc_id % 8 AS VARCHAR) AS host,
             |    (doc_id % 60) + CASE WHEN doc_id % 13 = 0 THEN 1000 ELSE 0 END AS h
             |  FROM documents),
             |ph AS (SELECT DISTINCT host, h FROM pg),
             |sizes AS (SELECT host, count(*) AS n FROM ph GROUP BY 1),
             |i AS (SELECT a.host AS host_a, b.host AS host_b, count(*) AS inter
             |      FROM ph a JOIN ph b ON a.h = b.h AND a.host < b.host GROUP BY 1, 2)
             |SELECT host_a, host_b, inter,
             |  round(CAST(inter AS DOUBLE)/least(sa.n, sb.n), 4) AS containment
             |FROM i JOIN sizes sa ON sa.host = host_a JOIN sizes sb ON sb.host = host_b
             |WHERE CAST(inter AS DOUBLE)/least(sa.n, sb.n) >= 0.5
             |ORDER BY host_a, host_b""".stripMargin),
      "mirror-host detection: page-set containment over content hashes (Mirror.mirrorHosts)"),

    // ------------------------------------------------------------------
    // q66: mirror GROUPS (Mirror.mirrorGroups) — pairs → connected
    // components → canonical host (most distinct pages, ties → smallest
    // host). Pages synthesized as 3 families of 4 hosts sharing a page
    // plane (page id = doc_id div 12, independent of the host residue;
    // family offset 10000·family; a 1-in-13 perturbation differentiates
    // per-host sets), so the component step has real work (3 groups,
    // ties broken on host). The oracle computes the
    // closure with a recursive CTE; the df cap (256) never binds at 12
    // hosts, so both engines see identical pair lists.
    // ------------------------------------------------------------------
    "q66_mirror_groups" -> Q(
      (s, d) => {
        val pages = t(s, d, "documents").select(
          concat(lit("h"),
            lpad((col("doc_id") % 12).cast("string"), 2, "0")).as("host"),
          (expr("((doc_id div 12) % 50)") +
            expr("((doc_id % 12) div 4) * 10000") +
            when(col("doc_id") % 13 === 0, 1000).otherwise(0)).as("h"))
        graft.ops.Mirror.mirrorGroups(pages, "host", "h",
            minContainment = 0.5, maxHashDf = 256)
          .orderBy(col("host"))
      },
      Some("""WITH RECURSIVE
             |pg AS (SELECT 'h' || lpad(CAST(doc_id % 12 AS VARCHAR), 2, '0') AS host,
             |    ((doc_id // 12) % 50) + ((doc_id % 12) // 4) * 10000 +
             |    CASE WHEN doc_id % 13 = 0 THEN 1000 ELSE 0 END AS h
             |  FROM documents),
             |ph AS (SELECT DISTINCT host, h FROM pg),
             |sizes AS (SELECT host, count(*) AS n_pages FROM ph GROUP BY 1),
             |i AS (SELECT a.host AS ha, b.host AS hb, count(*) AS inter
             |      FROM ph a JOIN ph b ON a.h = b.h AND a.host < b.host GROUP BY 1, 2),
             |p AS (SELECT ha, hb FROM i
             |      JOIN sizes sa ON sa.host = ha JOIN sizes sb ON sb.host = hb
             |      WHERE CAST(inter AS DOUBLE)/least(sa.n_pages, sb.n_pages) >= 0.5),
             |e AS (SELECT ha AS u, hb AS v FROM p UNION SELECT hb, ha FROM p),
             |reach(u, v) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM e) s
             |  UNION
             |  SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v),
             |comp AS (SELECT u AS host, min(v) AS component FROM reach GROUP BY 1),
             |ws AS (SELECT c.host, c.component, s.n_pages
             |       FROM comp c JOIN sizes s ON s.host = c.host),
             |rk AS (SELECT host, component, n_pages,
             |         row_number() OVER (PARTITION BY component
             |                            ORDER BY n_pages DESC, host) AS rk
             |       FROM ws),
             |can AS (SELECT component, host AS canonical FROM rk WHERE rk = 1),
             |nh AS (SELECT component, count(*) AS n_hosts FROM ws GROUP BY 1)
             |SELECT ws.host, can.canonical, nh.n_hosts, ws.n_pages,
             |  ws.host = can.canonical AS is_canonical
             |FROM ws JOIN can ON can.component = ws.component
             |        JOIN nh ON nh.component = ws.component
             |ORDER BY ws.host""".stripMargin),
      "mirror groups: components over mirror pairs, canonical host per group (Mirror.mirrorGroups)"),

    // ------------------------------------------------------------------
    // q67: DUST param mining (Dust.irrelevantParams) — per (host, param),
    // is the query param content-irrelevant? Fetches synthesized with a
    // page param that drives content and a sid param that doesn't —
    // except on host h0 where sid leaks into the hash, so the verdict
    // must differ BY HOST. Moduli 4/9/5/7 are pairwise coprime-enough
    // that both params get multi-value evidence groups at 500 docs.
    // ------------------------------------------------------------------
    "q67_dust_params" -> Q(
      (s, d) => {
        val id = col("doc_id")
        val fetched = t(s, d, "documents").select(
          concat(lit("http://h"), (id % 4).cast("string"), lit(".ex/p"),
            (id % 9).cast("string"), lit("?page="), (id % 5).cast("string"),
            lit("&sid=s"), (id % 7).cast("string")).as("url"),
          ((id % 4) * 1000 + (id % 9) * 100 + (id % 5) * 10 +
            when(id % 4 === 0, id % 7).otherwise(0)).as("h"))
        graft.ops.Dust.irrelevantParams(fetched, "url", "h", minEvidence = 2)
          .orderBy(col("host"), col("param"))
      },
      Some("""WITH f AS (
             |  SELECT 'http://h' || CAST(doc_id % 4 AS VARCHAR) || '.ex/p'
             |      || CAST(doc_id % 9 AS VARCHAR)
             |      || '?page=' || CAST(doc_id % 5 AS VARCHAR)
             |      || '&sid=s' || CAST(doc_id % 7 AS VARCHAR) AS url,
             |    (doc_id % 4) * 1000 + (doc_id % 9) * 100 + (doc_id % 5) * 10 +
             |      CASE WHEN doc_id % 4 = 0 THEN doc_id % 7 ELSE 0 END AS h
             |  FROM documents),
             |parts AS (
             |  SELECT url, h,
             |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
             |    split_part(url, '?', 1) AS base,
             |    string_split(regexp_extract(url, '\?([^#]*)', 1), '&') AS kvs
             |  FROM f),
             |ex AS (
             |  SELECT host, h, split_part(kv, '=', 1) AS param, kv,
             |    base || '|' ||
             |      array_to_string(list_sort(list_filter(kvs, x -> x <> kv)), '&') AS gk
             |  FROM (SELECT host, h, base, kvs, unnest(kvs) AS kv FROM parts)),
             |g AS (
             |  SELECT host, param, gk, count(DISTINCT kv) AS n_vals,
             |    count(DISTINCT h) AS n_hashes
             |  FROM ex GROUP BY 1, 2, 3 HAVING count(DISTINCT kv) >= 2)
             |SELECT host, param, CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(sum(CASE WHEN n_hashes = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_consistent,
             |  (sum(CASE WHEN n_hashes = 1 THEN 1 ELSE 0 END) = count(*)
             |    AND count(*) >= 2) AS irrelevant
             |FROM g GROUP BY 1, 2 ORDER BY host, param""".stripMargin),
      "DUST: content-irrelevant URL params per host (Dust.irrelevantParams)"),

    // ------------------------------------------------------------------
    // q68: trap templates (Traps.templateStats) — per (host, path
    // template with digit runs collapsed), URL-family size vs content
    // novelty. h0 hosts a calendar trap (every doc a fresh URL, 5
    // contents total); h1/h2 host 20-article archives (novelty 1.0).
    // ------------------------------------------------------------------
    "q68_trap_templates" -> Q(
      (s, d) => {
        val id = col("doc_id")
        val fetched = t(s, d, "documents").select(
          when(id % 3 === 0,
              concat(lit("http://h0.ex/cal/"), id.cast("string")))
            .otherwise(concat(lit("http://h"), (id % 3).cast("string"),
              lit(".ex/art/"), (id % 20).cast("string"))).as("url"),
          when(id % 3 === 0, id % 5)
            .otherwise((id % 20) * 10 + id % 3).as("h"))
        graft.ops.Traps.templateStats(fetched, "url", "h",
            minUrls = 50, maxNovelty = 0.1)
          .select(col("host"), col("template"), col("n_urls"),
            col("n_hashes"), round(col("novelty"), 6).as("novelty"),
            col("is_trap"))
          .orderBy(col("host"), col("template"))
      },
      Some("""WITH f AS (
             |  SELECT CASE WHEN doc_id % 3 = 0
             |      THEN 'http://h0.ex/cal/' || CAST(doc_id AS VARCHAR)
             |      ELSE 'http://h' || CAST(doc_id % 3 AS VARCHAR)
             |        || '.ex/art/' || CAST(doc_id % 20 AS VARCHAR) END AS url,
             |    CASE WHEN doc_id % 3 = 0 THEN doc_id % 5
             |         ELSE (doc_id % 20) * 10 + doc_id % 3 END AS h
             |  FROM documents),
             |p AS (SELECT
             |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
             |    regexp_replace(regexp_extract(url,
             |      '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1),
             |      '[0-9]+', '{d}', 'g') AS template,
             |    url AS u, h
             |  FROM f),
             |a AS (SELECT host, template, count(DISTINCT u) AS n_urls,
             |        count(DISTINCT h) AS n_hashes
             |      FROM p GROUP BY 1, 2)
             |SELECT host, template, CAST(n_urls AS BIGINT) AS n_urls,
             |  CAST(n_hashes AS BIGINT) AS n_hashes,
             |  round(CAST(n_hashes AS DOUBLE)/n_urls, 6) AS novelty,
             |  (n_urls >= 50 AND CAST(n_hashes AS DOUBLE)/n_urls <= 0.1) AS is_trap
             |FROM a ORDER BY host, template""".stripMargin),
      "trap templates: URL-family size vs content novelty (Traps.templateStats)"),

    // ------------------------------------------------------------------
    // q69: corpus-frequency boilerplate line removal
    // (Boilerplate.stripFrequentLines, C4-style) — docs synthesized as
    // 4 lines: universal nav chrome, a content slice, a footer on even
    // ids / a unique line on odd ids, a second content slice. minDocs=50
    // drops the nav (df 500) and footer (df 250), keeps the rest.
    // ------------------------------------------------------------------
    "q69_boilerplate_lines" -> Q(
      (s, d) => {
        val id = col("doc_id")
        val src = t(s, d, "documents").select(id,
          concat(lit("NAV MENU\n"), substring(col("text"), 1, 40), lit("\n"),
            when(id % 2 === 0, lit("COPYRIGHT FOOTER"))
              .otherwise(concat(lit("rare-"), id.cast("string"))),
            lit("\n"), substring(col("text"), 60, 40)).as("text"))
        graft.ops.Boilerplate.stripFrequentLines(src, "doc_id", "text",
            minDocs = 50)
          .orderBy(col("doc_id"))
      },
      Some("""WITH src AS (SELECT doc_id,
             |    'NAV MENU' || chr(10) || substr(text, 1, 40) || chr(10) ||
             |    CASE WHEN doc_id % 2 = 0 THEN 'COPYRIGHT FOOTER'
             |         ELSE 'rare-' || CAST(doc_id AS VARCHAR) END
             |    || chr(10) || substr(text, 60, 40) AS text
             |  FROM documents),
             |l AS (SELECT doc_id, a[1] AS line, a[2] AS pos
             |      FROM (SELECT doc_id,
             |              unnest(list_zip(ls, generate_series(1, len(ls)))) AS a
             |            FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
             |                  FROM src))),
             |freq AS (SELECT line
             |         FROM (SELECT line, count(DISTINCT doc_id) AS df
             |               FROM l GROUP BY 1)
             |         WHERE df >= 50),
             |kept AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM freq)),
             |r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             |        CAST(count(*) AS BIGINT) AS n_kept
             |      FROM kept GROUP BY 1)
             |SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
             |  coalesce(r.n_kept, 0) AS n_kept
             |FROM documents d LEFT JOIN r ON r.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin),
      "boilerplate line removal by corpus df (Boilerplate.stripFrequentLines)"),

    // ------------------------------------------------------------------
    // q70: DUST canonicalization from mined verdicts — the DF-plane
    // consumer of q67's (host, param) irrelevance table
    // (Dust.canonicalizeUrls; the frontier-side twin is
    // graft.engine.DustCanonicalizingParser). Same synthetic fetched
    // derivation as q67: sid is content-irrelevant except on host h0
    // (where it perturbs the hash), page always changes content — so the
    // rewrite must drop sid on h1-h3 only and never touch page.
    // ------------------------------------------------------------------
    "q70_dust_canonical" -> Q(
      (s, d) => {
        val id = col("doc_id")
        val fetched = t(s, d, "documents").select(
          concat(lit("http://h"), (id % 4).cast("string"), lit(".ex/p"),
            (id % 9).cast("string"), lit("?page="), (id % 5).cast("string"),
            lit("&sid=s"), (id % 7).cast("string")).as("url"),
          ((id % 4) * 1000 + (id % 9) * 100 + (id % 5) * 10 +
            when(id % 4 === 0, id % 7).otherwise(0)).as("h"))
        val verdicts =
          graft.ops.Dust.irrelevantParams(fetched, "url", "h", minEvidence = 2)
        graft.ops.Dust.canonicalizeUrls(
            fetched.select(col("url")).distinct(), "url", verdicts)
          .select(col("url"), col("canonical_url"))
          .orderBy(col("url"))
      },
      Some("""WITH f AS (
             |  SELECT 'http://h' || CAST(doc_id % 4 AS VARCHAR) || '.ex/p'
             |      || CAST(doc_id % 9 AS VARCHAR)
             |      || '?page=' || CAST(doc_id % 5 AS VARCHAR)
             |      || '&sid=s' || CAST(doc_id % 7 AS VARCHAR) AS url,
             |    (doc_id % 4) * 1000 + (doc_id % 9) * 100 + (doc_id % 5) * 10 +
             |      CASE WHEN doc_id % 4 = 0 THEN doc_id % 7 ELSE 0 END AS h
             |  FROM documents),
             |parts AS (
             |  SELECT url, h,
             |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
             |    split_part(url, '?', 1) AS base,
             |    string_split(regexp_extract(url, '\?([^#]*)', 1), '&') AS kvs
             |  FROM f),
             |ex AS (
             |  SELECT host, h, split_part(kv, '=', 1) AS param, kv,
             |    base || '|' ||
             |      array_to_string(list_sort(list_filter(kvs, x -> x <> kv)), '&') AS gk
             |  FROM (SELECT host, h, base, kvs, unnest(kvs) AS kv FROM parts)),
             |g AS (
             |  SELECT host, param, gk, count(DISTINCT kv) AS n_vals,
             |    count(DISTINCT h) AS n_hashes
             |  FROM ex GROUP BY 1, 2, 3 HAVING count(DISTINCT kv) >= 2),
             |v AS (
             |  SELECT host, param,
             |    (sum(CASE WHEN n_hashes = 1 THEN 1 ELSE 0 END) = count(*)
             |      AND count(*) >= 2) AS irrelevant
             |  FROM g GROUP BY 1, 2),
             |drops AS (SELECT host, list(param) AS dps FROM v WHERE irrelevant GROUP BY 1),
             |u AS (SELECT DISTINCT url FROM f),
             |j AS (SELECT u.url,
             |    regexp_extract(u.url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host
             |  FROM u),
             |r AS (SELECT j.url,
             |    CASE WHEN d.dps IS NULL OR strpos(j.url, '?') = 0 THEN NULL
             |         ELSE list_filter(
             |           string_split(regexp_extract(j.url, '\?([^#]*)', 1), '&'),
             |           x -> NOT list_contains(d.dps, split_part(x, '=', 1)))
             |    END AS kept
             |  FROM j LEFT JOIN drops d ON d.host = j.host)
             |SELECT url,
             |  CASE WHEN kept IS NULL THEN url
             |       WHEN len(kept) = 0 THEN split_part(url, '?', 1)
             |       ELSE split_part(url, '?', 1) || '?' || array_to_string(kept, '&')
             |  END AS canonical_url
             |FROM r ORDER BY url""".stripMargin),
      "DUST URL canonicalization from mined verdicts (Dust.canonicalizeUrls)"),

    // ------------------------------------------------------------------
    // q65: per-document tf-idf topic signature (Search.tfIdfTopTerms) —
    // top-3 terms by tf·ln(N/df), score rounded before ranking so ties
    // break on the term, df plane term-keyed (never broadcast).
    // ------------------------------------------------------------------
    "q65_tfidf_topterms" -> Q(
      (s, d) => graft.ops.Search.tfIdfTopTerms(
          t(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id")),
      Some("""WITH dt AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
             |            FROM documents),
             |post AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY 1, 2),
             |stats AS (SELECT count(*) AS n FROM documents),
             |dfp AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
             |sc AS (SELECT p.doc_id, p.term,
             |         round(p.tf * ln(CAST(s.n AS DOUBLE)/d.df), 6) AS score
             |       FROM post p JOIN dfp d ON p.term = d.term CROSS JOIN stats s),
             |rk AS (SELECT doc_id, term, score,
             |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
             |       FROM sc)
             |SELECT doc_id, string_agg(term, ',' ORDER BY rk) AS top_terms,
             |  max(CASE WHEN rk = 1 THEN score END) AS top_score
             |FROM rk WHERE rk <= 3 GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "per-doc tf-idf topic signature, deterministic rank (Search.tfIdfTopTerms)"),

    // ------------------------------------------------------------------
    // q71: revalidation fetch plan (Revalidate.plan) — for each due URL,
    // conditional-with-last-validator when history has one, full
    // otherwise. History synthesized: urls observed at waves 0..(id % 3),
    // ids ≡ 0 (mod 5) have no history at all; due = the even ids. The
    // plan op is one max_by aggregate + one left join — O(urls)
    // fixed-width rows; the validator values here are arithmetic so the
    // oracle can reproduce them (the REAL validator, SpanHash, is pinned
    // Scala≡Catalyst in RevalidateSpec and end-to-end in the 304 e2e).
    // ------------------------------------------------------------------
    "q71_revalidate_plan" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val hist = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"),
            explode(sequence(lit(0L), col("doc_id") % 3)).as("wave"))
          .select(concat(lit("u"), col("doc_id").cast("string")).as("url"),
            col("wave"),
            (col("doc_id") * 1000 + col("wave") * 7).as("validator"))
        val due = docs.filter(col("doc_id") % 2 === 0)
          .select(concat(lit("u"), col("doc_id").cast("string")).as("url"))
        graft.ops.Revalidate.plan(due, hist).orderBy(col("url"))
      },
      Some("""WITH hist AS (
             |  SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, w.wave AS wave,
             |    doc_id*1000 + w.wave*7 AS validator
             |  FROM documents CROSS JOIN (VALUES (0),(1),(2)) w(wave)
             |  WHERE doc_id % 5 <> 0 AND w.wave <= doc_id % 3),
             |due AS (SELECT DISTINCT 'u' || CAST(doc_id AS VARCHAR) AS url
             |        FROM documents WHERE doc_id % 2 = 0),
             |last AS (SELECT url, arg_max(validator, wave) AS if_hash
             |         FROM hist GROUP BY 1)
             |SELECT due.url,
             |  CASE WHEN l.if_hash IS NOT NULL THEN 'conditional' ELSE 'full' END AS mode,
             |  CAST(l.if_hash AS BIGINT) AS if_hash
             |FROM due LEFT JOIN last l ON l.url = due.url
             |ORDER BY due.url""".stripMargin),
      "revalidation fetch plan: conditional w/ last validator vs full (Revalidate.plan)"),

    // ------------------------------------------------------------------
    // q72: SemDeDup (SemDedup.semDedup, Abbas et al. 2023) — semantic
    // dedup within k-means clusters. Corpus = embeddings + the q42 planted
    // near-twins; coarse centroids = the 8 embeddings with vec_id < 8
    // (deterministic and SQL-expressible, so the oracle recomputes the
    // whole pipeline: assignment argmax, within-cluster pairs ≥ 0.98,
    // recursive-CTE component closure, keep = lowest centroid-cosine).
    // ------------------------------------------------------------------
    "q72_semdedup" -> Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        // two-step select: in ONE select, Spark's lateral-column-alias
        // resolution binds the lambda's col("vec_id") to the (vec_id +
        // 1000000) alias — the perturbation must key on the SOURCE id
        // (the oracle's lambda sees only the source column)
        val twins = emb.filter(col("vec_id") % 25 === 0)
          .select(col("vec_id"),
            transform(col("v"), (x, i) =>
              x * (lit(1.0) + (((col("vec_id") + i) % 7 - 3) / lit(1000.0)))).as("v"))
          .select((col("vec_id") + 1000000L).as("vec_id"), col("v"))
        val corpus = emb.unionByName(twins)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("int").as("cluster"), col("v").as("cv"))
          .withColumn("cn", sqrt(graft.ops.Ann.dot(col("cv"), col("cv"))))
        // uncapped: the oracle mines ALL within-cluster pairs, so the
        // engine must too — the skew cap's conservative drop semantics
        // are pinned separately in SemDedupSpec
        graft.ops.SemDedup.semDedup(corpus, "vec_id", "v", cents,
          threshold = 0.98, maxClusterSize = Int.MaxValue)
          .select(col("id"), col("cluster").cast("long").as("cluster"),
            round(col("ccos"), 4).as("ccos"), col("component"), col("keep"))
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE
             |emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |        FROM embeddings),
             |twins AS (SELECT vec_id + 1000000 AS tvid,
             |    list_transform(v, (x, i) -> x * (1.0 + ((vec_id + i - 1) % 7 - 3) / 1000.0)) AS v
             |  FROM emb WHERE vec_id % 25 = 0),
             |corpus AS (SELECT * FROM emb
             |           UNION ALL SELECT tvid AS vec_id, v FROM twins),
             |normed AS (SELECT vec_id, v,
             |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
             |  FROM corpus),
             |cents AS (SELECT vec_id AS cluster, v AS cv, nrm AS cn
             |          FROM normed WHERE vec_id < 8),
             |scored AS (SELECT n.vec_id, c.cluster,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(list_zip(n.v, c.cv), p -> p[1] * p[2])), (x, y) -> x + y)
             |      / (n.nrm * c.cn) AS ccos
             |  FROM normed n CROSS JOIN cents c),
             |best AS (SELECT vec_id, cluster, ccos FROM (
             |    SELECT vec_id, cluster, ccos,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cluster) AS rk
             |    FROM scored) WHERE rk = 1),
             |pairs AS (SELECT ba.vec_id AS id_a, bb.vec_id AS id_b
             |  FROM best ba JOIN best bb ON ba.cluster = bb.cluster AND ba.vec_id < bb.vec_id
             |  JOIN normed a ON a.vec_id = ba.vec_id
             |  JOIN normed b ON b.vec_id = bb.vec_id
             |  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])), (x, y) -> x + y)
             |      / (a.nrm * b.nrm) >= 0.98),
             |e AS (SELECT id_a AS u, id_b AS v FROM pairs
             |      UNION SELECT id_b, id_a FROM pairs),
             |reach(u, v) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM e) s
             |  UNION
             |  SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v),
             |compe AS (SELECT u AS vec_id, min(v) AS component FROM reach GROUP BY 1),
             |comp AS (SELECT b.vec_id, coalesce(c.component, b.vec_id) AS component
             |         FROM best b LEFT JOIN compe c ON c.vec_id = b.vec_id),
             |rk AS (SELECT comp.vec_id, b.cluster, b.ccos, comp.component,
             |    row_number() OVER (PARTITION BY comp.component
             |                       ORDER BY b.ccos ASC, comp.vec_id) AS rk
             |  FROM comp JOIN best b ON b.vec_id = comp.vec_id)
             |SELECT vec_id AS id, CAST(cluster AS BIGINT) AS cluster,
             |  round(ccos, 4) AS ccos, component, rk = 1 AS keep
             |FROM rk ORDER BY id""".stripMargin),
      "SemDeDup: within-cluster semantic dedup, keep-the-outlier rule (SemDedup.semDedup)"),

    // ------------------------------------------------------------------
    // q73: sitemap-lastmod staleness (Recrawl.staleByLastmod) — the
    // host-published freshness signal. Entries: every doc, lastmod_ms =
    // doc_id·100 except ids ≡ 3 (mod 4) which state none. Observations:
    // ids ≢ 0 (mod 3) were stored, even ids BEFORE their lastmod (stale),
    // odd ids after (fresh); two obs rows per url exercise the max.
    // Expected: unseen = ids ≡ 0 (mod 3); modified = seen ∧ lastmod ∧
    // even; fresh/no-signal rows excluded.
    // ------------------------------------------------------------------
    "q73_sitemap_stale" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val entries = docs.select(
          concat(lit("u"), col("doc_id").cast("string")).as("url"),
          when(col("doc_id") % 4 =!= 3, col("doc_id") * 100).as("lastmod_ms"))
        val obs = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"),
            explode(array(lit(0), lit(1))).as("k"))
          .select(concat(lit("u"), col("doc_id").cast("string")).as("url"),
            (col("doc_id") * 100 - lit(40) + col("k") * 20 +
              (col("doc_id") % 2) * 100).as("stored_at_ms"))
        graft.ops.Recrawl.staleByLastmod(entries, obs).orderBy(col("url"))
      },
      Some("""WITH entries AS (
             |  SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
             |    CASE WHEN doc_id % 4 <> 3 THEN doc_id*100 END AS lastmod_ms
             |  FROM documents),
             |obs AS (
             |  SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
             |    doc_id*100 - 40 + k.k*20 + (doc_id % 2)*100 AS stored_at_ms
             |  FROM documents CROSS JOIN (VALUES (0),(1)) k(k)
             |  WHERE doc_id % 3 <> 0),
             |seen AS (SELECT url, max(stored_at_ms) AS last_seen_ms FROM obs GROUP BY 1)
             |SELECT e.url, e.lastmod_ms, s.last_seen_ms,
             |  CASE WHEN s.last_seen_ms IS NULL THEN 'unseen' ELSE 'modified' END AS reason
             |FROM entries e LEFT JOIN seen s ON s.url = e.url
             |WHERE s.last_seen_ms IS NULL
             |   OR (e.lastmod_ms IS NOT NULL AND e.lastmod_ms > s.last_seen_ms)
             |ORDER BY e.url""".stripMargin),
      "sitemap-lastmod staleness: modified vs unseen vs no-signal (Recrawl.staleByLastmod)"),

    // ------------------------------------------------------------------
    // q74: DSIR importance resampling (Dsir.dsirSelect, Xie et al. 2023)
    // — target = docs with doc_id ≡ 0 (mod 9), raw = the rest; hashed
    // word-bigram counts into 512 buckets (portable poly hash), Laplace
    // α = 1, Gumbel-top-50 with hash-derived noise. The oracle recomputes
    // the WHOLE pipeline; per-doc sums fold in bucket order on both
    // sides, so the doubles are bit-identical, not approximately equal.
    // ------------------------------------------------------------------
    "q74_dsir_select" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.ops.Dsir.dsirSelect(
            docs.filter(col("doc_id") % 9 === 0),
            docs.filter(col("doc_id") % 9 =!= 0),
            "doc_id", "text", k = 50, n = 2, nBuckets = 512)
          // final presentation order is by id: the raw score already chose
          // the k rows on both engines bit-identically, and ordering by the
          // ROUNDED score would flake when two raws round to the same 6-dp
          // value but straddle each other unrounded
          .select(col("id"), round(col("weight"), 6).as("weight"),
            round(col("score"), 6).as("score"))
          .orderBy(col("id"))
      },
      Some {
        def sh(src: String) =
          s"""SELECT doc_id, unnest(list_filter(
             |    list_transform(ts, (x, i) -> CASE WHEN i + 1 <= len(ts)
             |      THEN x || ' ' || ts[i+1] END), s -> s IS NOT NULL)) AS sh
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
             |        FROM documents WHERE $src)""".stripMargin
        s"""WITH shT AS (${sh("doc_id % 9 = 0")}),
           |shR AS (${sh("doc_id % 9 <> 0")}),
           |fT AS (SELECT ${QueriesB.polyHashSql("sh")} % 512 AS bucket, count(*) AS ct
           |       FROM shT GROUP BY 1),
           |fR AS (SELECT doc_id, ${QueriesB.polyHashSql("sh")} % 512 AS bucket,
           |         count(*) AS cnt
           |       FROM shR GROUP BY 1, 2),
           |pR AS (SELECT bucket, sum(cnt) AS cr FROM fR GROUP BY 1),
           |tots AS (SELECT (SELECT coalesce(sum(ct), 0) FROM fT) AS tt,
           |                (SELECT coalesce(sum(cr), 0) FROM pR) AS tr),
           |contrib AS (
           |  SELECT f.doc_id, f.bucket,
           |    f.cnt * (ln((coalesce(ft.ct, 0) + 1.0) / (tots.tt + 512.0))
           |           - ln((coalesce(pr.cr, 0) + 1.0) / (tots.tr + 512.0))) AS c
           |  FROM fR f LEFT JOIN fT ft USING (bucket)
           |            LEFT JOIN pR pr USING (bucket) CROSS JOIN tots),
           |wts AS (SELECT doc_id, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |          list(c ORDER BY bucket)), (a, b) -> a + b) AS weight
           |        FROM contrib GROUP BY doc_id),
           |scored AS (SELECT doc_id AS id, weight,
           |    weight + (-ln(-ln(((${QueriesB.polyHashSql("CAST(doc_id AS VARCHAR)")} * 2654435761)
           |      % 1000000007 + 0.5) / 1000000007.0))) AS score
           |  FROM wts),
           |sel AS (SELECT id, weight, score FROM scored
           |        ORDER BY score DESC, id LIMIT 50)
           |SELECT id, round(weight, 6) AS weight, round(score, 6) AS score
           |FROM sel ORDER BY id""".stripMargin
      },
      "DSIR importance resampling: hashed-bigram LLR weights + Gumbel-top-k (Dsir.dsirSelect)"))
}
