package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Queries.Q

/**
 * Query batch G: round-4 continuation ops — curation observability and
 * interleaved-payload text analysis. Inputs are synthesized
 * deterministically from `documents` (BASELINE.json: no external data).
 */
object QueriesG {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // q99: curation filter funnel (Curation.funnel) — per-document drop
    // attribution for the q55 pipeline, same config and portable hashes.
    // The audit plane a production run reports ("31% died to dedup, 9%
    // to the token gate"); first-failing-stage semantics pin the
    // pipeline's stage ORDER, and document bodies never shuffle (the
    // only exchange carries fixed-width (hash, id, metrics) rows).
    // ------------------------------------------------------------------
    "q99_curation_funnel" -> Q(
      (s, d) => {
        graft.ops.Curation.funnel(t(s, d, "documents"), "doc_id", "text",
            graft.ops.Curation.Config(minTokens = 10, minUniqRatio = 0.2,
              maxDupLineFrac = 0.5, sampleRate = 0.5),
            contentHash = c => graft.functions.HashFns.polyHash(c),
            sampleHash = c => graft.functions.HashFns.polyHash(c))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH h AS (
             |  SELECT doc_id, text, ${QueriesB.polyHashSql("trim(text)")} AS ch FROM documents),
             |win AS (SELECT ch, min(doc_id) AS win FROM h GROUP BY ch),
             |m AS (
             |  SELECT doc_id, ch,
             |    CAST(len(ts) AS BIGINT) AS n_tokens,
             |    CAST(len(list_distinct(ts)) AS DOUBLE) / greatest(len(ts), 1) AS uq,
             |    round(1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / greatest(len(ls), 1), 4) AS dl,
             |    ${QueriesB.polyHashSql("CAST(doc_id AS VARCHAR)")} % 1000000 AS sh
             |  FROM (SELECT doc_id, ch,
             |          string_split_regex(trim(text), '\\s+') AS ts,
             |          string_split(text, chr(10)) AS ls FROM h))
             |SELECT m.doc_id,
             |  CASE WHEN m.doc_id <> w.win THEN 'dedup_loser'
             |       WHEN m.n_tokens < 10 THEN 'too_few_tokens'
             |       WHEN m.uq < 0.2 THEN 'low_uniq_ratio'
             |       WHEN m.dl > 0.5 THEN 'repetitive'
             |       WHEN m.sh >= 500000 THEN 'sampled_out'
             |       ELSE 'kept' END AS stage,
             |  m.n_tokens
             |FROM m JOIN win w ON m.ch = w.ch
             |ORDER BY m.doc_id""".stripMargin),
      "curation filter funnel: per-doc first-failing-stage attribution == SQL CTE replay"),

    // ------------------------------------------------------------------
    // q100: interleaved span-plane language profile
    // (TextStats.interleavedLangProfile) — the input_hint span shape.
    // Both engines synthesize the q93 span table (token spans, media iff
    // (offset+doc_id)%7 < 2); per-doc profile = one map-side-combinable
    // groupBy of fixed-width hit counts, media spans counted but never
    // voting, verdict chain identical to q31's with an added `und` row
    // (docs whose text spans hit no lexicon).
    // ------------------------------------------------------------------
    "q100_span_langid" -> Q(
      (s, d) => {
        val spans = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("offset", "tok")))
          .select(col("doc_id"), col("offset").cast("long").as("offset"),
            when((col("offset") + col("doc_id")) % 7 < 2, lit("media"))
              .otherwise(lit("text")).as("kind"),
            col("tok").as("text"))
        graft.ops.TextStats.interleavedLangProfile(spans, "doc_id", Seq(
            "en" -> Seq("the", "of", "and", "to", "a"),
            "de" -> Seq("der", "die", "das", "und", "ist"),
            "fr" -> Seq("le", "la", "et", "les", "des"),
            "es" -> Seq("el", "los", "y", "en", "que")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS o, tok,
             |    CASE WHEN ((pos - 1) + doc_id) % 7 < 2 THEN 'media' ELSE 'text' END AS kind
             |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
             |               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
             |        FROM documents)),
             |agg AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text_spans,
             |    CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT) AS n_media_spans,
             |    CAST(sum(CASE WHEN kind = 'text' AND tok IN ('the','of','and','to','a') THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
             |    CAST(sum(CASE WHEN kind = 'text' AND tok IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS BIGINT) AS de_hits,
             |    CAST(sum(CASE WHEN kind = 'text' AND tok IN ('le','la','et','les','des') THEN 1 ELSE 0 END) AS BIGINT) AS fr_hits,
             |    CAST(sum(CASE WHEN kind = 'text' AND tok IN ('el','los','y','en','que') THEN 1 ELSE 0 END) AS BIGINT) AS es_hits
             |  FROM sp GROUP BY doc_id)
             |SELECT doc_id, n_text_spans, n_media_spans, en_hits, de_hits, fr_hits, es_hits,
             |  CASE WHEN en_hits + de_hits + fr_hits + es_hits = 0 THEN 'und'
             |       WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
             |       WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
             |       WHEN fr_hits >= es_hits THEN 'fr'
             |       ELSE 'es' END AS pred_lang
             |FROM agg ORDER BY doc_id""".stripMargin),
      "interleaved span-plane language profile: media-aware per-doc verdict == SQL replay"),

    // ------------------------------------------------------------------
    // q101: latency-adaptive politeness update (Throttle, S15) — both
    // engines synthesize the same fetched-plane rows (host = doc_id%19,
    // h3 all-errors, doc_id%17 cache hits excluded, service latency
    // (doc_id%7)*25+5) and prev-delay table (hosts h0–h8), then replay
    // the batch AutoThrottle rule: EWMA toward latency/target for ok
    // hosts, backoff-only for error hosts, clamps at [250, 520]. The
    // only exchange carries (host, 3 longs); bodies/spans never exist.
    // ------------------------------------------------------------------
    "q101_adaptive_throttle" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val f = docs.select(
          concat(lit("h"), (col("doc_id") % 19).cast("string")).as("host"),
          when(col("doc_id") % 19 === 3, 503).otherwise(200).as("status"),
          (col("doc_id") % 17 === 0).as("from_cache"),
          (col("doc_id") * 10).as("fetched_at_ms"),
          (col("doc_id") * 10 + (col("doc_id") % 7) * 25 + 5).as("stored_at_ms"))
        val prev = docs.select((col("doc_id") % 19).as("k")).distinct()
          .filter(col("k") < 9)
          .select(concat(lit("h"), col("k").cast("string")).as("host"),
            (lit(300L) + col("k") * 40).as("delay_ms"))
        graft.ops.Throttle.adaptiveHostDelays(f, prev,
            startDelayMs = 1000L, targetConcurrency = 2.0,
            minDelayMs = 250L, maxDelayMs = 520L)
          .orderBy(col("host"))
      },
      Some("""WITH f AS (
             |  SELECT 'h' || CAST(doc_id % 19 AS VARCHAR) AS host,
             |    CASE WHEN doc_id % 19 = 3 THEN 503 ELSE 200 END AS status,
             |    doc_id % 17 = 0 AS from_cache,
             |    (doc_id % 7) * 25 + 5 AS lat
             |  FROM documents),
             |obs AS (
             |  SELECT host, CAST(count(*) AS BIGINT) AS n_obs,
             |    CAST(sum(CASE WHEN status >= 200 AND status < 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
             |    avg(CAST(lat AS DOUBLE)) AS avg_latency_ms
             |  FROM f WHERE NOT from_cache GROUP BY host),
             |prev AS (
             |  SELECT 'h' || CAST(k AS VARCHAR) AS host, 300 + k * 40 AS p
             |  FROM (SELECT DISTINCT doc_id % 19 AS k FROM documents WHERE doc_id % 19 < 9)),
             |j AS (
             |  SELECT coalesce(o.host, prev.host) AS host, o.n_obs, o.n_ok, o.avg_latency_ms,
             |    CAST(coalesce(prev.p, 1000) AS DOUBLE) AS p
             |  FROM obs o FULL OUTER JOIN prev ON o.host = prev.host)
             |SELECT host,
             |  CAST(floor(least(520.0, greatest(250.0,
             |    CASE WHEN n_obs IS NULL THEN p
             |         WHEN n_ok > 0 THEN (p + avg_latency_ms / 2.0) / 2.0
             |         ELSE greatest(p, (p + avg_latency_ms / 2.0) / 2.0) END))) AS BIGINT) AS delay_ms,
             |  coalesce(n_obs, 0) AS n_obs,
             |  coalesce(n_ok, 0) AS n_ok,
             |  avg_latency_ms
             |FROM j ORDER BY host""".stripMargin),
      "latency-adaptive politeness update (batch AutoThrottle) == SQL replay"),

    // ------------------------------------------------------------------
    // q102: span-sequence equality audit (SpanDiff) — the north rule's
    // per-row invariant as a distributed diff. Both engines synthesize
    // the q93 span table as the LEFT crawl and a perturbed RIGHT crawl
    // (doc_id%29 dropped -> left_only, doc_id%19 truncated at offset>=3
    // -> prefix mismatch, doc_id%23's offset-1 token edited -> content
    // mismatch, one synthetic -id-1 doc per doc_id%31 -> right_only),
    // then replay verdict + first-diff index. Offsets are renumbered
    // x10 on the right to pin "order matters, offset values don't".
    // ------------------------------------------------------------------
    "q102_span_diff" -> Q(
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("offset", "tok")))
          .select(col("doc_id"), col("offset").cast("long").as("offset"),
            when((col("offset") + col("doc_id")) % 7 < 2, lit("media"))
              .otherwise(lit("text")).as("kind"),
            col("tok").as("text"),
            when((col("offset") + col("doc_id")) % 7 < 2,
              concat(lit("m"), col("doc_id"), lit("_"), col("offset"))).as("media_ref"))
        val extra = t(s, d, "documents").filter(col("doc_id") % 31 === 0)
          .select((-col("doc_id") - 1).as("doc_id"), lit(0L).as("offset"),
            lit("text").as("kind"), lit("extra").as("text"),
            lit(null).cast("string").as("media_ref"))
        val rightRows = base
          .filter(col("doc_id") % 29 =!= 0)
          .filter(!(col("doc_id") % 19 === 0 && col("offset") >= 3))
          .withColumn("text",
            when(col("doc_id") % 23 === 0 && col("offset") === 1,
              concat(col("text"), lit("X"))).otherwise(col("text")))
          .withColumn("offset", col("offset") * 10) // order-isomorphic renumbering
          .unionByName(extra)
        def toTable(rows: org.apache.spark.sql.DataFrame) =
          rows.groupBy(col("doc_id")).agg(collect_list(
            struct(col("kind"), col("text"), col("media_ref"), col("offset"))).as("spans"))
        graft.ops.SpanDiff.audit(toTable(base), toTable(rightRows), "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS o, tok,
             |    CASE WHEN ((pos - 1) + doc_id) % 7 < 2 THEN 'media' ELSE 'text' END AS kind,
             |    CASE WHEN ((pos - 1) + doc_id) % 7 < 2
             |         THEN 'm' || doc_id || '_' || (pos - 1) END AS media_ref
             |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
             |               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
             |        FROM documents)),
             |rsp AS (
             |  SELECT doc_id, o * 10 AS o, kind, media_ref,
             |    CASE WHEN doc_id % 23 = 0 AND o = 1 THEN tok || 'X' ELSE tok END AS tok
             |  FROM sp WHERE doc_id % 29 <> 0 AND NOT (doc_id % 19 = 0 AND o >= 3)
             |  UNION ALL
             |  SELECT -doc_id - 1, CAST(0 AS BIGINT), 'text', NULL, 'extra'
             |  FROM documents WHERE doc_id % 31 = 0),
             |lft AS (
             |  SELECT doc_id,
             |    list(struct_pack(kind := kind, text := tok, media_ref := media_ref)
             |         ORDER BY o) AS l
             |  FROM sp GROUP BY doc_id),
             |rgt AS (
             |  SELECT doc_id,
             |    list(struct_pack(kind := kind, text := tok, media_ref := media_ref)
             |         ORDER BY o) AS r
             |  FROM rsp GROUP BY doc_id),
             |j AS (
             |  SELECT coalesce(lft.doc_id, rgt.doc_id) AS doc_id, l, r
             |  FROM lft FULL OUTER JOIN rgt ON lft.doc_id = rgt.doc_id),
             |v AS (
             |  SELECT doc_id, l, r,
             |    CASE WHEN l IS NULL OR r IS NULL THEN NULL ELSE
             |      coalesce(list_position(
             |        list_transform(range(1, greatest(len(l), len(r)) + 1),
             |          i -> l[i] IS NOT DISTINCT FROM r[i]), false), 0) END AS fd
             |  FROM j)
             |SELECT doc_id,
             |  CASE WHEN l IS NULL THEN 'right_only'
             |       WHEN r IS NULL THEN 'left_only'
             |       WHEN len(l) = len(r) AND fd = 0 THEN 'match'
             |       ELSE 'mismatch' END AS verdict,
             |  CASE WHEN l IS NULL THEN NULL ELSE CAST(len(l) AS BIGINT) END AS n_left,
             |  CASE WHEN r IS NULL THEN NULL ELSE CAST(len(r) AS BIGINT) END AS n_right,
             |  CAST(fd AS BIGINT) AS first_diff
             |FROM v ORDER BY doc_id""".stripMargin),
      "span-sequence equality audit (north-rule per-row invariant as a distributed diff) == SQL replay"),

    // ------------------------------------------------------------------
    // q103: corpus drift report (Mix.drift) — per-language share deltas
    // between two snapshot halves (prev = even doc_ids, curr = odd with
    // 'fr' dropped, so a vanished stratum is exercised); sum(tv_contrib)
    // is the total-variation distance a drift monitor alarms on. Corpus
    // text never moves: two O(strata) aggregates + an O(strata) join.
    // ------------------------------------------------------------------
    "q103_corpus_drift" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.ops.Mix.drift(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1 && col("lang") =!= "fr"),
            "lang", "text")
          .orderBy(col("lang"))
      },
      Some("""WITH rep_p AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
             |  FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
             |p AS (
             |  SELECT lang, n_docs, n_tokens,
             |    round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS ts,
             |    round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS ds
             |  FROM rep_p),
             |rep_c AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
             |  FROM documents WHERE doc_id % 2 = 1 AND lang <> 'fr' GROUP BY lang),
             |c AS (
             |  SELECT lang, n_docs, n_tokens,
             |    round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS ts,
             |    round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS ds
             |  FROM rep_c),
             |j AS (
             |  SELECT coalesce(p.lang, c.lang) AS lang,
             |    coalesce(p.n_docs, 0) AS n_docs_prev, coalesce(c.n_docs, 0) AS n_docs_curr,
             |    coalesce(p.n_tokens, 0) AS n_tokens_prev, coalesce(c.n_tokens, 0) AS n_tokens_curr,
             |    coalesce(p.ts, 0.0) AS token_share_prev, coalesce(c.ts, 0.0) AS token_share_curr,
             |    round(coalesce(c.ts, 0.0) - coalesce(p.ts, 0.0), 6) AS token_share_delta
             |  FROM p FULL OUTER JOIN c ON p.lang = c.lang)
             |SELECT lang, n_docs_prev, n_docs_curr, n_tokens_prev, n_tokens_curr,
             |  token_share_prev, token_share_curr, token_share_delta,
             |  round(abs(token_share_delta) / 2.0, 6) AS tv_contrib
             |FROM j ORDER BY lang""".stripMargin),
      "corpus drift report (per-stratum share deltas + TV contributions) == SQL replay"),

    // ------------------------------------------------------------------
    // q104: budgeted corpus assembly (Budget.selectByBudget) — rank by a
    // deterministic score (doc_id*37 % 101, ties broken by id), keep the
    // largest prefix whose inclusive token sum fits the budget. The op
    // runs the two-level distributed scan (range exchange of fixed-width
    // rows + partition-local windows, never a global window); the oracle
    // is DuckDB's straight cumulative window. Budget = 40% of the corpus
    // tokens at any sf, so the cut lands mid-corpus scale-robustly.
    // ------------------------------------------------------------------
    "q104_budget_select" -> Q(
      (s, d) => {
        // fraction form: budget = 2/5 of the corpus's total tokens,
        // computed from the prefix scan's own per-partition sums — the
        // old standalone sum(tokenCount) aggregate + collect cost one
        // full extra pass over `documents` for the same number
        val docs = t(s, d, "documents")
        graft.ops.Budget.selectByBudgetFraction(
            docs.withColumn("score", (col("doc_id") * 37 % 101).cast("long")),
            "doc_id", "score", "text", 2, 5)
          .orderBy(col("doc_id"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id, (doc_id * 37) % 101 AS score,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |b AS (SELECT (CAST(sum(n_tokens) AS BIGINT) * 2) // 5 AS budget FROM scored),
             |c AS (
             |  SELECT doc_id, score, n_tokens,
             |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
             |  FROM scored)
             |SELECT doc_id, score, n_tokens, cum_tokens,
             |  cum_tokens <= (SELECT budget FROM b) AS kept
             |FROM c ORDER BY doc_id""".stripMargin),
      "budgeted corpus assembly (ranked prefix under a token budget) == SQL cumulative window"),

    // ------------------------------------------------------------------
    // q105: per-host crawl health rollup (Throttle.hostHealth) over the
    // q101 fetched-plane synthesis — counts, ok/cache rates, and the
    // service-latency distribution with EXACT interpolated percentiles
    // (Spark `percentile` and DuckDB `quantile_cont` compute the same
    // interpolation; cache hits excluded from latency on both engines).
    // ------------------------------------------------------------------
    "q105_crawl_health" -> Q(
      (s, d) => {
        val f = t(s, d, "documents").select(
          concat(lit("h"), (col("doc_id") % 19).cast("string")).as("host"),
          when(col("doc_id") % 19 === 3, 503).otherwise(200).as("status"),
          (col("doc_id") % 17 === 0).as("from_cache"),
          (col("doc_id") * 10).as("fetched_at_ms"),
          (col("doc_id") * 10 + (col("doc_id") % 7) * 25 + 5).as("stored_at_ms"))
        graft.ops.Throttle.hostHealth(f).orderBy(col("host"))
      },
      Some("""WITH f AS (
             |  SELECT 'h' || CAST(doc_id % 19 AS VARCHAR) AS host,
             |    CASE WHEN doc_id % 19 = 3 THEN 503 ELSE 200 END AS status,
             |    doc_id % 17 = 0 AS from_cache,
             |    CAST((doc_id % 7) * 25 + 5 AS DOUBLE) AS lat
             |  FROM documents)
             |SELECT host,
             |  CAST(count(*) AS BIGINT) AS n_fetches,
             |  CAST(sum(CASE WHEN status >= 200 AND status < 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
             |  round(CAST(sum(CASE WHEN status >= 200 AND status < 300 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*), 6) AS ok_rate,
             |  CAST(sum(CASE WHEN from_cache THEN 1 ELSE 0 END) AS BIGINT) AS n_cache,
             |  round(avg(CASE WHEN NOT from_cache THEN lat END), 6) AS avg_latency_ms,
             |  round(quantile_cont(CASE WHEN NOT from_cache THEN lat END, 0.5), 6) AS p50_latency_ms,
             |  round(quantile_cont(CASE WHEN NOT from_cache THEN lat END, 0.95), 6) AS p95_latency_ms,
             |  max(CASE WHEN NOT from_cache THEN lat END) AS max_latency_ms
             |FROM f GROUP BY host ORDER BY host""".stripMargin),
      "per-host crawl health (counts, rates, exact latency percentiles) == SQL replay"),

    // ------------------------------------------------------------------
    // q106: frontier drain forecast (Throttle.drainForecast) — the north
    // star's skew clause as data: per-host sequential politeness makes
    // drain time n_pending·delay/1000 the one quantity more executors
    // cannot improve. Synthesis plants a hot host (every doc_id%3==0 row
    // lands on h0) and a partial delay table (h0–h11 at 200+k·50 ms,
    // rest default 1000 ms); budget 16/wave, straggler threshold 30 s.
    // ------------------------------------------------------------------
    "q106_drain_forecast" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val pending = docs.select(
          when(col("doc_id") % 3 === 0, lit("h0"))
            .otherwise(concat(lit("h"), (col("doc_id") % 19).cast("string"))).as("host"))
        val delays = docs.select((col("doc_id") % 19).as("k")).distinct()
          .filter(col("k") < 12)
          .select(concat(lit("h"), col("k").cast("string")).as("host"),
            (lit(200L) + col("k") * 50).as("delay_ms"))
        graft.ops.Throttle.drainForecast(pending, delays,
            budgetPerWave = 16L, stragglerSec = 30.0)
          .orderBy(col("host"))
      },
      Some("""WITH pending AS (
             |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'h0'
             |              ELSE 'h' || CAST(doc_id % 19 AS VARCHAR) END AS host
             |  FROM documents),
             |counts AS (SELECT host, CAST(count(*) AS BIGINT) AS n_pending
             |           FROM pending GROUP BY host),
             |delays AS (
             |  SELECT 'h' || CAST(k AS VARCHAR) AS host, 200 + k * 50 AS delay_ms
             |  FROM (SELECT DISTINCT doc_id % 19 AS k FROM documents WHERE doc_id % 19 < 12))
             |SELECT c.host, c.n_pending,
             |  CAST(coalesce(d.delay_ms, 1000) AS BIGINT) AS delay_ms,
             |  round(c.n_pending * coalesce(d.delay_ms, 1000) / 1000.0, 6) AS drain_sec,
             |  CAST(floor((c.n_pending + 15) / CAST(16 AS DOUBLE)) AS BIGINT) AS waves_to_drain,
             |  round(c.n_pending * coalesce(d.delay_ms, 1000) / 1000.0, 6) > 30.0 AS straggler
             |FROM counts c LEFT JOIN delays d ON c.host = d.host
             |ORDER BY c.host""".stripMargin),
      "frontier drain forecast (per-host politeness-bounded drain + straggler flags) == SQL replay"),

    // ------------------------------------------------------------------
    // q107: ANN recall@k evaluation plane (Ann.recallAtK) — grade a
    // synthetic approximate index against the exact result: neighbor
    // sets from modular arithmetic, the approx side perturbed on
    // doc_id%4==0 rows, queries missing from approx score 0 (doc_id%50
    // == 47 is withheld from the approx side entirely).
    // ------------------------------------------------------------------
    "q107_ann_recall" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val exact = docs.select((col("doc_id") % 50).as("qid"),
          ((col("doc_id") * 13) % 500).as("nid"))
        val approx = docs.filter(col("doc_id") % 50 =!= 47)
          .select((col("doc_id") % 50).as("qid"),
            when(col("doc_id") % 4 === 0, (col("doc_id") * 13 + 1) % 500)
              .otherwise((col("doc_id") * 13) % 500).as("nid"))
        graft.ops.Ann.recallAtK(approx, exact, "qid", "nid", k = 10)
          .orderBy(col("qid"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT doc_id % 50 AS qid, (doc_id * 13) % 500 AS nid FROM documents),
             |a AS (
             |  SELECT DISTINCT doc_id % 50 AS qid,
             |    CASE WHEN doc_id % 4 = 0 THEN (doc_id * 13 + 1) % 500
             |         ELSE (doc_id * 13) % 500 END AS nid
             |  FROM documents WHERE doc_id % 50 <> 47),
             |hits AS (
             |  SELECT e.qid, CAST(count(*) AS BIGINT) AS n_hits
             |  FROM e JOIN a ON e.qid = a.qid AND e.nid = a.nid
             |  GROUP BY e.qid)
             |SELECT q.qid, coalesce(h.n_hits, 0) AS n_hits,
             |  round(coalesce(h.n_hits, 0) / least(10, q.n_exact), 6) AS recall
             |FROM (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM e GROUP BY qid) q
             |LEFT JOIN hits h ON q.qid = h.qid
             |ORDER BY q.qid""".stripMargin),
      "ANN recall@k evaluation (set overlap vs exact, absent queries score 0) == SQL replay"),

    // ------------------------------------------------------------------
    // q108: overlapping chunk intervals (Packing.chunkIntervals) — the
    // RAG/embedding prep cut: chunk 32 tokens, stride 24 (8-token
    // overlap). Pure row-local arithmetic (sequence + posexplode, no
    // exchange); the oracle replays the k_max = ceil((n-chunk)/stride)
    // window enumeration with generate_series.
    // ------------------------------------------------------------------
    "q108_chunk_intervals" -> Q(
      (s, d) => graft.ops.Packing.chunkIntervals(
          t(s, d, "documents"), "doc_id", "text",
          chunkTokens = 32L, strideTokens = 24L)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents),
             |k AS (
             |  SELECT doc_id, n,
             |    CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT) AS k_max
             |  FROM tok WHERE n > 0)
             |SELECT doc_id,
             |  CAST(kk AS BIGINT) AS chunk_idx,
             |  CAST(kk * 24 AS BIGINT) AS start_tok,
             |  CAST(least(kk * 24 + 32, n) AS BIGINT) AS end_tok
             |FROM (SELECT doc_id, n, unnest(generate_series(0, k_max)) AS kk FROM k)
             |ORDER BY doc_id, chunk_idx""".stripMargin),
      "overlapping chunk intervals (RAG cut: coverage, overlap, tail rule) == SQL replay"),

    // ------------------------------------------------------------------
    // q109: UniMax mixture allocation (Mix.unimaxQuotas, Chung et al.
    // 2023) — budget = 3.2× corpus tokens at maxEpochs 4, so the four
    // small languages hit their epoch caps and en takes the pooled
    // remainder (waterline) — every branch live at any sf. The oracle
    // replays the closed-form waterline (rank by cap, candidate τ per
    // rank, τ* = max over ranks whose cap reaches their candidate).
    // ------------------------------------------------------------------
    "q109_unimax_quotas" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val total = docs
          .select(sum(graft.ops.TextStats.tokenCount(col("text"))).as("t"))
          .collect()(0).getAs[Long]("t")
        graft.ops.Mix.unimaxQuotas(docs, "lang", "text",
            budgetTokens = total * 16 / 5, maxEpochs = 4.0)
          .orderBy(col("lang"))
      },
      Some("""WITH caps AS (
             |  SELECT lang,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS DOUBLE) * 4.0 AS cap
             |  FROM documents GROUP BY lang),
             |b AS (SELECT (CAST(sum(n_tokens) AS BIGINT) * 16) // 5 AS bt FROM caps),
             |r AS (
             |  SELECT lang, n_tokens, cap,
             |    row_number() OVER (ORDER BY cap, lang) AS rk,
             |    count(*) OVER () AS n,
             |    coalesce(sum(cap) OVER (ORDER BY cap, lang
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS below
             |  FROM caps),
             |t AS (
             |  SELECT lang, n_tokens, cap,
             |    (CAST((SELECT bt FROM b) AS DOUBLE) - below) / (n - rk + 1) AS tau
             |  FROM r),
             |ts AS (SELECT max(CASE WHEN cap >= tau THEN tau END) AS tstar FROM t),
             |a AS (
             |  SELECT lang, n_tokens, cap,
             |    round(CASE WHEN (SELECT tstar FROM ts) IS NULL THEN cap
             |               ELSE least(cap, (SELECT tstar FROM ts)) END, 6) AS alloc
             |  FROM t)
             |SELECT lang, n_tokens, round(cap, 6) AS cap, alloc,
             |  round(alloc / greatest(CAST(n_tokens AS DOUBLE), 1e-9), 6) AS epochs
             |FROM a ORDER BY lang""".stripMargin),
      "UniMax epoch-capped mixture allocation (closed-form waterline) == SQL replay"))
}
