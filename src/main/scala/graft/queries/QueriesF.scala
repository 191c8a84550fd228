package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Queries.Q

/**
 * Query batch F: round-4 closing ops. Inputs are synthesized
 * deterministically from `documents` with arithmetic both engines
 * express identically (BASELINE.json: no external data).
 */
object QueriesF {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // q83: main-content extraction (MainContent.extract; Boilerpipe
    // Kohlschütter et al. WSDM 2010 / jusText Pomikálek 2011) — both
    // engines synthesize the same span table from `documents` (token =
    // span, kind = link iff (offset+doc_id)%7 < 2, block = offset/8),
    // classify each block from link-char density / length / stopword
    // density, run the one-hop neighbor-promotion window, and rebuild
    // per-document content from the good+promoted blocks' TEXT spans.
    // At sf0.01 all four verdict branches fire (804 bad / 926 good /
    // 797 promoted / 1082 short-demoted blocks).
    // ------------------------------------------------------------------
    "q83_main_content" -> Q(
      (s, d) => {
        val spans = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("offset", "tok")))
          .select(col("doc_id"), col("offset").cast("long").as("offset"),
            when((col("offset") + col("doc_id")) % 7 < 2, lit("link"))
              .otherwise(lit("text")).as("kind"),
            col("tok").as("text"))
        graft.ops.MainContent.extract(spans, "doc_id",
          blockSize = 8, maxLinkPct = 35, minGoodChars = 30, minStopPct = 8,
          stopwords = Seq("a", "the"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, (pos - 1) AS o, tok,
             |    CASE WHEN ((pos - 1) + doc_id) % 7 < 2 THEN 'link' ELSE 'text' END AS kind
             |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
             |               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
             |        FROM documents)),
             |b AS (
             |  SELECT doc_id, o // 8 AS blk,
             |    sum(len(tok)) AS n_chars,
             |    sum(CASE WHEN kind = 'link' THEN len(tok) ELSE 0 END) AS link_chars,
             |    count(*) AS n_words,
             |    sum(CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END) AS stop_words,
             |    string_agg(CASE WHEN kind = 'text' THEN tok END, ' ' ORDER BY o) AS block_text
             |  FROM sp GROUP BY 1, 2),
             |v AS (
             |  SELECT doc_id, blk, block_text,
             |    CASE WHEN 100 * link_chars > 35 * n_chars THEN 'bad'
             |         WHEN n_chars >= 30 AND 100 * stop_words >= 8 * n_words THEN 'good'
             |         ELSE 'short' END AS v0
             |  FROM b),
             |j AS (
             |  SELECT doc_id, blk, block_text,
             |    CASE WHEN v0 <> 'short' THEN v0
             |         WHEN lag(v0) OVER w = 'good' OR lead(v0) OVER w = 'good'
             |           THEN 'promoted'
             |         ELSE 'bad' END AS v
             |  FROM v WINDOW w AS (PARTITION BY doc_id ORDER BY blk))
             |SELECT doc_id,
             |  coalesce(string_agg(CASE WHEN v IN ('good', 'promoted')
             |    THEN coalesce(block_text, '') END, ' ' ORDER BY blk), '') AS content_text,
             |  CAST(count(*) AS BIGINT) AS n_blocks,
             |  CAST(sum(CASE WHEN v = 'good' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             |  CAST(sum(CASE WHEN v = 'promoted' THEN 1 ELSE 0 END) AS BIGINT) AS n_promoted,
             |  CAST(sum(CASE WHEN v = 'bad' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "jusText/Boilerpipe block-classifier main-content extraction (MainContent.extract)"),

    // ------------------------------------------------------------------
    // q84: BFF Bloom-filter paragraph dedup (BloomDedup, Dolma Soldaini
    // et al. 2024 §4.1) — both engines synthesize 4 paragraphs per doc
    // (3 drawn from 41 shared bodies + 1 unique solo), batch A (even
    // doc_ids) seeds the position-set filter (m=4096, k=3, KM double
    // hashing over the portable poly hash), batch B (odd) gates against
    // it. The oracle replays positions → membership → verdicts exactly,
    // INCLUDING the Bloom false positive (at sf0.01 one solo paragraph
    // FPs into dup_bloom: 709 dup_batch / 42 dup_bloom / 249 kept
    // witnesses). Output = batch B's per-doc rebuild.
    // ------------------------------------------------------------------
    "q84_bloom_dedup" -> Q(
      (s, d) => {
        import org.apache.spark.sql.Column
        val cfg = graft.ops.BloomDedup.Config(m = 4096, k = 3)
        val h1: Column => Column = c => graft.functions.HashFns.polyHash(c)
        val h2: Column => Column =
          c => graft.functions.HashFns.polyHash(concat(lit("x"), c))
        def textOf(df: DataFrame) = df.select(col("doc_id"),
          array_join(array(
            (0 to 2).map(j => concat(lit("para "),
              pmod(col("doc_id") * 3 + lit(j * 5), lit(41)).cast("string"),
              lit(" body"))) :+
            concat(lit("solo "), col("doc_id").cast("string")): _*),
            "\n").as("text"))
        val docs = t(s, d, "documents")
        val root = Queries.scratchDir("q84_bloom")
        graft.ops.BloomDedup.bloomParagraphDedup(s,
          textOf(docs.filter(col("doc_id") % 2 === 0)),
          "doc_id", "text", root, cfg, h1, h2)
        graft.ops.BloomDedup.bloomParagraphDedup(s,
          textOf(docs.filter(col("doc_id") % 2 === 1)),
          "doc_id", "text", root, cfg, h1, h2)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH p AS (
             |  SELECT doc_id, CAST(j AS BIGINT) AS par_idx,
             |    CASE WHEN j = 3 THEN 'solo ' || doc_id
             |         ELSE 'para ' || ((doc_id * 3 + j * 5) % 41) || ' body' END AS par
             |  FROM documents, (SELECT unnest(range(0, 4)) AS j)),
             |ph AS (SELECT doc_id, par_idx, par,
             |    ${QueriesB.polyHashSql("par")} AS h1,
             |    ${QueriesB.polyHashSql("'x' || par")} AS h2 FROM p),
             |pd AS (SELECT DISTINCT h1, h2 FROM ph WHERE doc_id % 2 = 0),
             |apos AS (SELECT DISTINCT ((h1 % 4096) + i * (2 * (h2 % 4096) + 1)) % 4096 AS pos
             |         FROM pd, (SELECT unnest(range(0, 3)) AS i)),
             |b AS (SELECT *, row_number() OVER (PARTITION BY h1, h2 ORDER BY doc_id, par_idx) AS rn
             |      FROM ph WHERE doc_id % 2 = 1),
             |bd AS (SELECT DISTINCT h1, h2 FROM b),
             |bpos AS (SELECT DISTINCT h1, h2, ((h1 % 4096) + i * (2 * (h2 % 4096) + 1)) % 4096 AS pos
             |         FROM bd, (SELECT unnest(range(0, 3)) AS i)),
             |bh AS (SELECT h1, h2, count(*) AS npos,
             |         sum(CASE WHEN a.pos IS NOT NULL THEN 1 ELSE 0 END) AS nhit
             |       FROM bpos LEFT JOIN apos a USING (pos) GROUP BY h1, h2),
             |verd AS (SELECT b.doc_id, b.par_idx, b.par,
             |    CASE WHEN b.rn > 1 THEN 'dup_batch'
             |         WHEN h.nhit = h.npos THEN 'dup_bloom'
             |         ELSE 'kept' END AS verdict
             |  FROM b JOIN bh h USING (h1, h2))
             |SELECT doc_id,
             |  coalesce(string_agg(CASE WHEN verdict = 'kept' THEN par END,
             |    chr(10) ORDER BY par_idx), '') AS kept_text,
             |  CAST(count(*) AS BIGINT) AS n_pars,
             |  CAST(sum(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN verdict = 'dup_batch' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_batch,
             |  CAST(sum(CASE WHEN verdict = 'dup_bloom' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_bloom
             |FROM verd GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "Bloom-filter incremental paragraph dedup, FPs replayed exactly (BloomDedup)"),

    // ------------------------------------------------------------------
    // q85: W-bounded suffix array by distributed prefix doubling
    // (SuffixArray.ofDocs; Manber–Myers 1993, the ExactSubstr index of
    // Lee et al. 2022 §4.1) on a 1-in-5 doc subset. The oracle replays
    // the definition literally: concatenate text||chr(1) in id order,
    // sort all positions by (first 32 chars, position) — memcmp order
    // equals the engine's codepoint order on the ASCII corpus, and
    // DuckDB's shorter-prefix-first matches the engine's
    // end-of-corpus-sorts-below-every-rank.
    // ------------------------------------------------------------------
    "q85_suffix_array" -> Q(
      (s, d) => graft.ops.SuffixArray
        .ofDocs(t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          "doc_id", "text", window = 32)
        .select(col("sa_rank").cast("long").as("sa_rank"),
          col("gpos").cast("long").as("gpos"))
        .orderBy(col("sa_rank")),
      Some("""WITH c AS (
             |  SELECT string_agg(text || chr(1), '' ORDER BY doc_id) AS s
             |  FROM documents WHERE doc_id % 5 = 0),
             |p AS (SELECT s, unnest(range(1, len(s) + 1)) AS p FROM c)
             |SELECT CAST(row_number() OVER (ORDER BY substr(s, p, 32), p) - 1
             |         AS BIGINT) AS sa_rank,
             |       CAST(p - 1 AS BIGINT) AS gpos
             |FROM p ORDER BY sa_rank""".stripMargin),
      "W-bounded distributed suffix array vs literal sort-all-suffixes replay (SuffixArray)"),

    // ------------------------------------------------------------------
    // q86: ExactSubstr dedup spans (SuffixArray.duplicatedSpans; Lee et
    // al. 2022 §4.1) at L=16 over the whole corpus — every maximal
    // per-doc span covered by 16-grams occurring ≥2 times anywhere
    // (cross-doc AND self-repeats). The oracle enumerates every in-doc
    // 16-gram, keeps positions whose gram is globally non-unique, and
    // merges overlapping/adjacent [p, p+16) intervals per doc.
    // ------------------------------------------------------------------
    "q86_exact_substr" -> Q(
      (s, d) => graft.ops.SuffixArray
        .duplicatedSpans(t(s, d, "documents"), "doc_id", "text", minLen = 16)
        .orderBy(col("doc_id"), col("span_start")),
      Some("""WITH pos AS (
             |  SELECT doc_id, text, unnest(range(1, len(text) - 14)) AS p
             |  FROM documents WHERE len(text) >= 16),
             |g AS (SELECT doc_id, text, p, substr(text, p, 16) AS gram FROM pos),
             |c AS (SELECT doc_id, text, p FROM
             |        (SELECT *, count(*) OVER (PARTITION BY gram) AS n FROM g)
             |      WHERE n > 1),
             |m AS (SELECT doc_id, text, p,
             |    CASE WHEN p > coalesce(max(p + 16) OVER
             |        (PARTITION BY doc_id ORDER BY p
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             |      THEN 1 ELSE 0 END AS ns
             |  FROM c),
             |sp AS (SELECT doc_id, text, p,
             |         sum(ns) OVER (PARTITION BY doc_id ORDER BY p) AS sid
             |       FROM m)
             |SELECT doc_id,
             |  CAST(min(p) - 1 AS BIGINT) AS span_start,
             |  CAST(max(p) - 1 + 16 AS BIGINT) AS span_end,
             |  substr(any_value(text), min(p), max(p) + 16 - min(p)) AS span_text
             |FROM sp GROUP BY doc_id, sid ORDER BY doc_id, span_start""".stripMargin),
      "ExactSubstr dup-span dedup at L=16 via the bounded suffix ranks (SuffixArray.duplicatedSpans)"),

    // ------------------------------------------------------------------
    // q87: the LCP array of the W-bounded suffix array (SuffixArray
    // .adjacentLcp; Lee et al. 2022 §4.1's repeat-mining primitive) on
    // the q85 subset at W=32. The oracle rebuilds q85's literal SA, then
    // for each adjacent pair walks the two 32-char windows one character
    // at a time: lcp = first differing offset, or — when neither window
    // differs inside W — the shorter suffix's length capped at W (the
    // engine's 0-padded packs encode exactly that exhaustion rule).
    // ------------------------------------------------------------------
    "q87_lcp_array" -> Q(
      (s, d) => graft.ops.SuffixArray
        .adjacentLcp(t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          "doc_id", "text", window = 32)
        .select(col("sa_rank").cast("long").as("sa_rank"),
          col("gpos").cast("long").as("gpos"),
          col("next_gpos").cast("long").as("next_gpos"),
          col("lcp").cast("long").as("lcp"))
        .orderBy(col("sa_rank")),
      Some("""WITH c AS (
             |  SELECT string_agg(text || chr(1), '' ORDER BY doc_id) AS s
             |  FROM documents WHERE doc_id % 5 = 0),
             |p AS (SELECT s, unnest(range(1, len(s) + 1)) AS p FROM c),
             |sa AS (
             |  SELECT s, CAST(row_number() OVER (ORDER BY substr(s, p, 32), p) - 1
             |           AS BIGINT) AS sa_rank, p
             |  FROM p),
             |pr AS (
             |  SELECT a.s AS s, a.sa_rank, a.p AS pa, b.p AS pb,
             |    least(len(a.s) - a.p + 1, len(a.s) - b.p + 1, 32) AS cap
             |  FROM sa a JOIN sa b ON b.sa_rank = a.sa_rank + 1),
             |x AS (
             |  SELECT sa_rank, pa, pb,
             |    coalesce(min(CASE WHEN substr(s, pa + i - 1, 1) <> substr(s, pb + i - 1, 1)
             |                      THEN i - 1 END),
             |             cap) AS lcp
             |  FROM pr, (SELECT unnest(range(1, 33)) AS i)
             |  GROUP BY sa_rank, pa, pb, cap)
             |SELECT sa_rank, CAST(pa - 1 AS BIGINT) AS gpos,
             |       CAST(pb - 1 AS BIGINT) AS next_gpos, CAST(lcp AS BIGINT) AS lcp
             |FROM x ORDER BY sa_rank""".stripMargin),
      "LCP array over the bounded SA vs per-char window replay (SuffixArray.adjacentLcp)"),

    // ------------------------------------------------------------------
    // q88: exact heavy hitters via a mergeable Misra–Gries sketch +
    // exact verify pass (HeavyHitters; Misra & Gries 1982, mergeability
    // Agarwal et al. PODS 2012). Both engines synthesize a skewed token
    // stream from `documents`: every 3rd position keeps the real word
    // (31 distinct, each ~900×), the rest become a 4001-token synthetic
    // long tail — far beyond the sketch's k = 2·200 = 400 counters, so
    // decrements and merge prunes genuinely fire. The oracle is the
    // brute-force GROUP BY ... HAVING count ≥ ceil(n/200); the MG
    // superset guarantee makes the engine's two-pass result EXACTLY
    // equal — any sketch bug that drops a true heavy hitter diverges.
    // ------------------------------------------------------------------
    "q88_heavy_hitters" -> Q(
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
          .select(
            when((col("doc_id") + col("pos")) % 3 === 0, col("w"))
              .otherwise(concat(lit("rare_"),
                pmod(col("doc_id") * 13 + col("pos") * 7, lit(4001)).cast("string")))
              .as("tok"))
        graft.ops.HeavyHitters.heavyHitters(toks, "tok", q = 200)
          .select(col("token"), col("cnt").cast("long").as("cnt"))
          .orderBy(col("cnt").desc, col("token"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, (pos - 1) AS p, w FROM (
             |    SELECT doc_id,
             |      unnest(string_split_regex(trim(text), '\s+')) AS w,
             |      generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
             |    FROM documents)),
             |toks AS (
             |  SELECT CASE WHEN (doc_id + p) % 3 = 0 THEN w
             |              ELSE 'rare_' || ((doc_id * 13 + p * 7) % 4001) END AS tok
             |  FROM sp),
             |n AS (SELECT count(*) AS n FROM toks)
             |SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
             |FROM toks, n GROUP BY tok, n.n
             |HAVING count(*) >= (n.n + 199) // 200
             |ORDER BY cnt DESC, token""".stripMargin),
      "two-pass exact heavy hitters over a mergeable Misra-Gries sketch (HeavyHitters)"),

    // ------------------------------------------------------------------
    // q89: product quantization + asymmetric-distance top-k (Pq; Jégou
    // et al. TPAMI 2011 — FAISS PQ8x4 on the 64-dim embeddings: m=8
    // subspaces, ksub=16 codes). FULL replay, no property shortcut: the
    // oracle re-derives the hash-seeded codebook (portable poly hash,
    // iters=0 — the pluggable-hash posture of q84), re-encodes every
    // vector by per-subspace argmin, recomputes every ADC distance with
    // the same index-ordered left folds, and re-ranks — codes, raw
    // distances, and ranks must all match bit-for-bit.
    // ------------------------------------------------------------------
    "q89_pq_adc" -> Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val book = graft.ops.Pq.train(emb, "vec_id", "embedding",
          m = 8, ksub = 16, iters = 0,
          hash = c => graft.functions.HashFns.polyHash(c))
        val codes = graft.ops.Pq.encode(emb, "vec_id", "embedding", book)
        graft.ops.Pq.adcTopK(emb.filter(col("vec_id") % 50 === 0), codes,
          "vec_id", "embedding", book, k = 5)
          .select(col("query_id"), col("rank").cast("long").as("rank"),
            col("neighbor_id"), col("dist2"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH emb AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |seeds AS (
             |  SELECT v, CAST(row_number() OVER (
             |      ORDER BY ${QueriesB.polyHashSql("CAST(vec_id AS VARCHAR)")}, vec_id)
             |    - 1 AS INT) AS code
             |  FROM emb QUALIFY code < 16),
             |cb AS (
             |  SELECT CAST(s AS INT) AS s, code, list_slice(v, s * 8 + 1, s * 8 + 8) AS cv
             |  FROM seeds, (SELECT unnest(range(0, 8)) AS s)),
             |enc AS (
             |  SELECT vec_id, s, code FROM (
             |    SELECT e.vec_id, c.s, c.code,
             |      row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY
             |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(list_zip(list_slice(e.v, c.s * 8 + 1, c.s * 8 + 8), c.cv),
             |            p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b) ASC,
             |        c.code ASC) AS rn
             |    FROM emb e, cb c) WHERE rn = 1),
             |nc AS (
             |  SELECT en.vec_id AS neighbor_id, en.s, c.cv
             |  FROM enc en JOIN cb c ON c.s = en.s AND c.code = en.code),
             |parts AS (
             |  SELECT q.vec_id AS query_id, nc.neighbor_id, nc.s,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(list_zip(list_slice(q.v, nc.s * 8 + 1, nc.s * 8 + 8), nc.cv),
             |        p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b) AS pd
             |  FROM emb q, nc
             |  WHERE q.vec_id % 50 = 0 AND q.vec_id <> nc.neighbor_id),
             |d AS (
             |  SELECT query_id, neighbor_id,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(pd ORDER BY s)),
             |      (a, b) -> a + b) AS dist2
             |  FROM parts GROUP BY query_id, neighbor_id)
             |SELECT query_id, rank, neighbor_id, dist2 FROM (
             |  SELECT query_id, neighbor_id, dist2,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY dist2, neighbor_id) AS BIGINT) AS rank
             |  FROM d) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      "product-quantization ADC top-k, codebook/codes/distances replayed exactly (Pq)"),

    // ------------------------------------------------------------------
    // q90: IVF-PQ — the composed corpus-scale ANN path (Pq.ivfPqTopK;
    // FAISS IVF16,PQ8 posture, by_residual=false). Property oracle in
    // the q43 style: with nprobe = nlist every inverted list is probed,
    // so the result equals flat ADC over all codes REGARDLESS of where
    // the (xxhash64-seeded, Lloyd-refined) coarse centroids land — the
    // oracle replays the flat-ADC ranking and pins the probe/route/scan
    // machinery while the IVF side runs for real (distinct clusters,
    // one Lloyd pass, per-list code scans).
    // ------------------------------------------------------------------
    "q90_ivf_pq" -> Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val book = graft.ops.Pq.train(emb, "vec_id", "embedding",
          m = 8, ksub = 16, iters = 0,
          hash = c => graft.functions.HashFns.polyHash(c))
        graft.ops.Pq.ivfPqTopK(emb.filter(col("vec_id") % 100 === 0), emb,
          "vec_id", "embedding", book, k = 3, nlist = 16, nprobe = 16,
          kmeansIters = 1)
          .select(col("query_id"), col("rank").cast("long").as("rank"),
            col("neighbor_id"), col("dist2"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH emb AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |seeds AS (
             |  SELECT v, CAST(row_number() OVER (
             |      ORDER BY ${QueriesB.polyHashSql("CAST(vec_id AS VARCHAR)")}, vec_id)
             |    - 1 AS INT) AS code
             |  FROM emb QUALIFY code < 16),
             |cb AS (
             |  SELECT CAST(s AS INT) AS s, code, list_slice(v, s * 8 + 1, s * 8 + 8) AS cv
             |  FROM seeds, (SELECT unnest(range(0, 8)) AS s)),
             |enc AS (
             |  SELECT vec_id, s, code FROM (
             |    SELECT e.vec_id, c.s, c.code,
             |      row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY
             |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(list_zip(list_slice(e.v, c.s * 8 + 1, c.s * 8 + 8), c.cv),
             |            p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b) ASC,
             |        c.code ASC) AS rn
             |    FROM emb e, cb c) WHERE rn = 1),
             |nc AS (
             |  SELECT en.vec_id AS neighbor_id, en.s, c.cv
             |  FROM enc en JOIN cb c ON c.s = en.s AND c.code = en.code),
             |parts AS (
             |  SELECT q.vec_id AS query_id, nc.neighbor_id, nc.s,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(list_zip(list_slice(q.v, nc.s * 8 + 1, nc.s * 8 + 8), nc.cv),
             |        p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b) AS pd
             |  FROM emb q, nc
             |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> nc.neighbor_id),
             |d AS (
             |  SELECT query_id, neighbor_id,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(pd ORDER BY s)),
             |      (a, b) -> a + b) AS dist2
             |  FROM parts GROUP BY query_id, neighbor_id)
             |SELECT query_id, rank, neighbor_id, dist2 FROM (
             |  SELECT query_id, neighbor_id, dist2,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY dist2, neighbor_id) AS BIGINT) AS rank
             |  FROM d) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin),
      "IVF-PQ composed ANN: exhaustive probe == flat ADC regardless of centroids (property oracle)"),

    // ------------------------------------------------------------------
    // q91: bounded top-k-per-group aggregate (TopK.topKPerGroup) — the
    // scale path for R18-style ranking: a k-bounded mergeable buffer
    // with map-side partial aggregation replaces the row_number window's
    // full per-group shuffle-and-sort (the exchange carries ≤ k rows per
    // group per map partition, nothing is globally sorted). The oracle
    // IS the definitional window replay, same (score desc, id asc)
    // tie-break — any heap/merge bug that reorders or drops a contender
    // diverges.
    // ------------------------------------------------------------------
    "q91_topk_agg" -> Q(
      (s, d) => graft.ops.TopK.topKPerGroup(
          t(s, d, "orders"), "o_orderpriority", "o_totalprice", "o_orderkey", k = 5)
        .select(col("o_orderpriority"), col("rank"),
          col("o_orderkey").cast("long").as("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rank")),
      Some("""SELECT o_orderpriority, rank, o_orderkey,
             |  round(total, 2) AS o_totalprice FROM (
             |  SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS o_orderkey,
             |    CAST(o_totalprice AS DOUBLE) AS total,
             |    CAST(row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS BIGINT) AS rank
             |  FROM orders)
             |WHERE rank <= 5 ORDER BY o_orderpriority, rank""".stripMargin),
      "k-bounded mergeable top-k aggregate == the row_number window replay (TopK)"),

    // ------------------------------------------------------------------
    // q92: perceptual-hash image near-dup (Multimodal.dhash64 +
    // phashPairs; dHash, Krawetz 2013). Both engines synthesize the same
    // 8x9 grayscale grids from `documents` arithmetic: docs in the same
    // doc_id%50 family share a base grid, each doc perturbs ONE byte
    // (≤ 2 dHash bits → pairwise hamming ≤ 4). The Spark side runs the
    // REAL pipeline — partition-batched dhash64 over decoded grids, then
    // the pigeonhole-complete banded pair join — while the oracle is the
    // definitional brute force: per-bit replay of the same comparisons
    // and an all-pairs hamming count. Exact match IS the completeness
    // property (banding with maxHamming+2 blocks misses nothing ≤ 4 bits).
    // ------------------------------------------------------------------
    "q92_phash_neardup" -> Q(
      (s, d) => {
        import s.implicits._
        val grids = t(s, d, "documents").select(col("doc_id")).as[Long].map { id =>
          val noisePos = (id / 50 * 17 + id) % 72
          val bytes = Array.tabulate(72) { i =>
            val base = ((id % 50) * 31 + (id % 50) * i * 5 + i.toLong * i * 7 + i * 11) % 251
            val v = if (i == noisePos) (base + 128) % 251 else base
            v.toByte
          }
          graft.ops.Multimodal.GridRow(id, s"m$id", bytes)
        }
        val hashes = graft.ops.Multimodal.dhash64(s, grids)
        graft.ops.Multimodal.phashPairs(hashes, maxHamming = 4)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH g AS (
             |  SELECT d.doc_id, t.i,
             |    CASE WHEN t.i = ((d.doc_id // 50) * 17 + d.doc_id) % 72
             |      THEN (((d.doc_id % 50) * 31 + (d.doc_id % 50) * t.i * 5 + t.i*t.i*7 + t.i*11) % 251 + 128) % 251
             |      ELSE ((d.doc_id % 50) * 31 + (d.doc_id % 50) * t.i * 5 + t.i*t.i*7 + t.i*11) % 251 END AS b
             |  FROM documents d, (SELECT unnest(range(0, 72)) AS i) t),
             |bits AS (
             |  SELECT l.doc_id, (l.i // 9) * 8 + (l.i % 9) AS k,
             |    CASE WHEN l.b < r.b THEN 1 ELSE 0 END AS bit
             |  FROM g l JOIN g r ON r.doc_id = l.doc_id AND r.i = l.i + 1
             |  WHERE l.i % 9 < 8),
             |pairs AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
             |  FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, hamming FROM pairs
             |WHERE hamming <= 4 ORDER BY 1, 2""".stripMargin),
      "dHash near-dup pairs: banded index == brute-force hamming replay (Multimodal.phashPairs)"),

    // ------------------------------------------------------------------
    // q93: interleaved image-text caption mining (Multimodal.captionPairs)
    // — both engines synthesize the same interleaved span table from
    // `documents` (token = span, kind = media iff (offset+doc_id)%7 < 2),
    // then pair every media span with the nearest text span within 3
    // positions (earlier wins ties). The oracle replays the two
    // ignore-nulls running window scans definitionally; any frame,
    // tie-break, or window-cutoff bug diverges.
    // ------------------------------------------------------------------
    "q93_caption_pairs" -> Q(
      (s, d) => {
        val spans = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("offset", "tok")))
          .select(col("doc_id"), col("offset").cast("long").as("offset"),
            when((col("offset") + col("doc_id")) % 7 < 2, lit("media"))
              .otherwise(lit("text")).as("kind"),
            col("tok").as("text"),
            when((col("offset") + col("doc_id")) % 7 < 2,
              concat(lit("m"), col("doc_id"), lit("_"), col("offset"))).as("media_ref"))
        graft.ops.Multimodal.captionPairs(spans, "doc_id", window = 3)
          .orderBy(col("doc_id"), col("media_offset"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS o, tok,
             |    CASE WHEN ((pos - 1) + doc_id) % 7 < 2 THEN 'media' ELSE 'text' END AS kind
             |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
             |               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
             |        FROM documents)),
             |a AS (
             |  SELECT doc_id, o, kind,
             |    'm' || doc_id || '_' || o AS media_ref,
             |    last_value(CASE WHEN kind = 'text' THEN o END IGNORE NULLS) OVER
             |      (PARTITION BY doc_id ORDER BY o
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_off,
             |    last_value(CASE WHEN kind = 'text' THEN tok END IGNORE NULLS) OVER
             |      (PARTITION BY doc_id ORDER BY o
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_txt,
             |    first_value(CASE WHEN kind = 'text' THEN o END IGNORE NULLS) OVER
             |      (PARTITION BY doc_id ORDER BY o
             |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_off,
             |    first_value(CASE WHEN kind = 'text' THEN tok END IGNORE NULLS) OVER
             |      (PARTITION BY doc_id ORDER BY o
             |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_txt
             |  FROM sp)
             |SELECT doc_id, media_ref, o AS media_offset,
             |  CASE WHEN use_prev THEN prev_txt ELSE next_txt END AS caption,
             |  CASE WHEN use_prev THEN prev_off ELSE next_off END AS caption_offset,
             |  CASE WHEN use_prev THEN o - prev_off ELSE next_off - o END AS delta
             |FROM (SELECT *,
             |    (prev_off IS NOT NULL AND o - prev_off <= 3
             |     AND (next_off IS NULL OR o - prev_off <= next_off - o)) AS use_prev
             |  FROM a)
             |WHERE kind = 'media'
             |  AND (use_prev OR (next_off IS NOT NULL AND next_off - o <= 3))
             |ORDER BY doc_id, media_offset""".stripMargin),
      "nearest-text caption mining over interleaved spans == window replay (Multimodal.captionPairs)"),

    // ------------------------------------------------------------------
    // q94: video near-dup by frame-fingerprint set overlap
    // (Multimodal.videoNearDupPairs over dhash64 per sampled frame).
    // Both engines synthesize the same per-(video, frame) grids from
    // `documents` arithmetic: doc_id%50 families share frame content,
    // frame count varies 4-6 by variant, and each variant perturbs ONE
    // frame — so within-family Jaccard lands on both sides of the 0.3
    // threshold (kept and dropped pairs both occur). Frames match by
    // exact hash equality, so the posting join IS complete; the oracle
    // replays hashes as 64-char bit strings (dodges BIGINT<<63) and the
    // brute-force set overlap.
    // ------------------------------------------------------------------
    "q94_video_neardup" -> Q(
      (s, d) => {
        import s.implicits._
        val grids = t(s, d, "documents").select(col("doc_id")).as[Long].flatMap { v =>
          val fam = v % 50
          val w = v / 50
          val pPos = (v * 13) % 72
          (0L until (4 + w % 3)).map { f =>
            val bytes = Array.tabulate(72) { i =>
              val base = (fam * 31 + f * 53 + fam * i * 5 + i.toLong * i * 7 + i * 11) % 251
              val vb = if (f == w % 4 && i == pPos) (base + 128) % 251 else base
              vb.toByte
            }
            graft.ops.Multimodal.GridRow(v * 8 + f, s"v${v}_f$f", bytes)
          }
        }
        val hashes = graft.ops.Multimodal.dhash64(s, grids).toDF
          .select(floor(col("id") / 8).cast("long").as("vid"), col("phash"))
        graft.ops.Multimodal.videoNearDupPairs(hashes, "vid", "phash", threshold = 0.3)
          .orderBy(col("video_a"), col("video_b"))
      },
      Some("""WITH fr AS (
             |  SELECT d.doc_id AS v, t.f
             |  FROM documents d, (SELECT unnest(range(0, 6)) AS f) t
             |  WHERE t.f < 4 + ((d.doc_id // 50) % 3)),
             |g AS (
             |  SELECT fr.v, fr.f, t.i,
             |    CASE WHEN fr.f = (fr.v // 50) % 4 AND t.i = (fr.v * 13) % 72
             |      THEN (((fr.v % 50) * 31 + fr.f * 53 + (fr.v % 50) * t.i * 5 + t.i*t.i*7 + t.i*11) % 251 + 128) % 251
             |      ELSE ((fr.v % 50) * 31 + fr.f * 53 + (fr.v % 50) * t.i * 5 + t.i*t.i*7 + t.i*11) % 251 END AS b
             |  FROM fr, (SELECT unnest(range(0, 72)) AS i) t),
             |h AS (
             |  SELECT l.v, l.f,
             |    string_agg(CASE WHEN l.b < r.b THEN '1' ELSE '0' END, ''
             |      ORDER BY (l.i // 9) * 8 + (l.i % 9)) AS ph
             |  FROM g l JOIN g r ON r.v = l.v AND r.f = l.f AND r.i = l.i + 1
             |  WHERE l.i % 9 < 8
             |  GROUP BY 1, 2),
             |fd AS (SELECT DISTINCT v, ph FROM h),
             |fs AS (SELECT v, ph FROM (
             |  SELECT v, ph, count(*) OVER (PARTITION BY ph) AS df FROM fd)
             |  WHERE df <= 10000),
             |sz AS (SELECT v, count(*) AS n FROM fs GROUP BY 1),
             |pr AS (
             |  SELECT a.v AS video_a, b.v AS video_b, CAST(count(*) AS BIGINT) AS shared
             |  FROM fs a JOIN fs b ON a.ph = b.ph AND a.v < b.v
             |  GROUP BY 1, 2)
             |SELECT video_a, video_b, shared, jaccard FROM (
             |  SELECT video_a, video_b, shared,
             |    round(CAST(shared AS DOUBLE) / CAST(sa.n + sb.n - shared AS DOUBLE), 4) AS jaccard
             |  FROM pr JOIN sz sa ON sa.v = pr.video_a JOIN sz sb ON sb.v = pr.video_b)
             |WHERE jaccard >= 0.3
             |ORDER BY 1, 2""".stripMargin),
      "frame-fingerprint video near-dup: posting join == brute-force set Jaccard (Multimodal.videoNearDupPairs)"),

    // ------------------------------------------------------------------
    // q95: interleaved multimodal packing layout (Packing
    // .interleavedLayout) — q57's concat-then-chunk layout over the
    // interleaved span plane, where a media span costs a fixed 64-token
    // vision budget and a text span its word count. Spark runs the
    // span-collapse + two-level distributed scan; the oracle is the
    // definitional conditional-cost cumulative window over the same
    // order. seqLen = 512 so docs genuinely straddle sequence boundaries.
    // ------------------------------------------------------------------
    "q95_interleaved_packing" -> Q(
      (s, d) => {
        val spans = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("offset", "tok")))
          .select(col("doc_id"),
            when((col("offset") + col("doc_id")) % 7 < 2, lit("media"))
              .otherwise(lit("text")).as("kind"),
            col("tok").as("text"))
        graft.ops.Packing.interleavedLayout(spans, "doc_id",
          seqLen = 512L, mediaTokens = 64L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id,
             |    CASE WHEN ((pos - 1) + doc_id) % 7 < 2 THEN 'media' ELSE 'text' END AS kind
             |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok,
             |               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
             |        FROM documents)),
             |nt AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN kind = 'media' THEN 64 ELSE 1 END) AS BIGINT) AS n_tokens
             |  FROM sp GROUP BY 1),
             |s AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
             |  FROM nt)
             |SELECT doc_id, n_tokens, start_tok,
             |  start_tok + n_tokens AS end_tok,
             |  start_tok // 512 AS first_seq,
             |  (start_tok + n_tokens - 1) // 512 AS last_seq,
             |  (start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1 AS n_seqs
             |FROM s ORDER BY doc_id""".stripMargin),
      "interleaved multimodal packing: span-collapse + two-level scan == conditional-cost cumulative window (Packing.interleavedLayout)"),

    // ------------------------------------------------------------------
    // q96: token counting, whitespace + BPE-ish pre-tokenizer
    // (TextStats.tokenCount / bpeishTokenCount) — the two corpus-report
    // counters side by side per document. The GPT-2-style pattern is
    // lookahead-free so java.util.regex (Spark codegen) and RE2 (DuckDB)
    // tokenize identically; on this mixed-script corpus the two counters
    // genuinely diverge (CJK runs, punctuation splits), so a regex
    // drift on either engine shows up as a count mismatch.
    // ------------------------------------------------------------------
    "q96_token_counts" -> Q(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.TextStats.tokenCount(col("text")).as("ws_tokens"),
          graft.ops.TextStats.bpeishTokenCount(col("text")).as("bpeish_tokens"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text,
             |    '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
             |    AS BIGINT) AS bpeish_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      "whitespace + GPT-2-style pre-tokenizer counts == RE2 replay (TextStats.bpeishTokenCount)"),

    // ------------------------------------------------------------------
    // q97: seeded global shuffle + shard layout (Shard.globalShuffleLayout)
    // — the reproducible epoch-order stage between packing and the data
    // loader. Order key = the affine permutation (48271·id + 11) mod
    // 1000003 (MINSTD multiplier; p prime just above the id domain so
    // the map wraps and genuinely shuffles): a bijection on Z_p, so the
    // layout is a pure function of the seed. Spark runs the two-level
    // range-exchange scan (no global window); the oracle is the
    // definitional row_number replay.
    // ------------------------------------------------------------------
    "q97_global_shuffle" -> Q(
      (s, d) => graft.ops.Shard.globalShuffleLayout(
          t(s, d, "documents"), "doc_id", a = 48271L, b = 11L,
          p = 1000003L, shardSize = 64L)
        .orderBy(col("doc_id")),
      Some("""WITH k AS (
             |  SELECT doc_id, (48271 * doc_id + 11) % 1000003 AS perm_key
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, perm_key,
             |    CAST(row_number() OVER (ORDER BY perm_key) - 1 AS BIGINT) AS ordinal
             |  FROM k)
             |SELECT doc_id, perm_key, ordinal,
             |  ordinal // 64 AS shard, ordinal % 64 AS pos_in_shard
             |FROM o ORDER BY doc_id""".stripMargin),
      "seeded affine global shuffle + shard layout == window replay (Shard.globalShuffleLayout)"),

    // ------------------------------------------------------------------
    // q98: per-shard manifest over the q97 layout — (docs, weight,
    // key range) per shard; contiguous ordinals make the key ranges
    // non-overlapping, which is the loader's shard-audit invariant.
    // ------------------------------------------------------------------
    "q98_shard_manifest" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val layout = graft.ops.Shard.globalShuffleLayout(
          docs, "doc_id", a = 48271L, b = 11L,
          p = 1000003L, shardSize = 64L)
        graft.ops.Shard.manifest(layout, "doc_id", docs, "n_chars")
          .orderBy(col("shard"))
      },
      Some("""WITH k AS (
             |  SELECT doc_id, n_chars,
             |    (48271 * doc_id + 11) % 1000003 AS perm_key
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, n_chars, perm_key,
             |    CAST(row_number() OVER (ORDER BY perm_key) - 1 AS BIGINT) AS ordinal
             |  FROM k)
             |SELECT ordinal // 64 AS shard,
             |  count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS weight,
             |  min(perm_key) AS min_key,
             |  max(perm_key) AS max_key
             |FROM o GROUP BY 1 ORDER BY shard""".stripMargin),
      "shard manifest: counts + weight + contiguous key ranges (Shard.manifest)"))
}
