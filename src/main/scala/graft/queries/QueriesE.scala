package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Queries.Q

/**
 * Query batch E: round-4 continuation ops. Inputs are synthesized
 * deterministically from `documents` / `embeddings` with arithmetic
 * both engines express identically (BASELINE.json: no external data).
 */
object QueriesE {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Shared DuckDB CTE chain for the BPE oracles: word counts over the
    * training split (doc_id % 5 ≠ 0), then `k` unrolled merge stages —
    * stage i = pair counts over w{i-1}, the (count desc, l, r) argmax as
    * a one-row CTE b{i}, and w{i} = the same literal `replace` the Spark
    * side runs. `S` below is [[graft.ops.Bpe.Sep]] (U+001F), embedded as
    * the raw char (Verify's JSON escape round-trips control chars). */
  private def bpeCtes(k: Int): String = {
    val S = graft.ops.Bpe.Sep
    val stages = (1 to k).map { i =>
      s"""p$i AS (SELECT l, r, sum(cnt) AS c FROM (
         |  SELECT cnt, unnest(ss[1:len(ss)-1]) AS l, unnest(ss[2:len(ss)]) AS r
         |  FROM (SELECT cnt, string_split(substr(s, 2, len(s)-2), '$S$S') AS ss
         |        FROM w${i - 1})) GROUP BY 1, 2),
         |b$i AS (SELECT ${i - 1} AS rank, l, r FROM p$i ORDER BY c DESC, l, r LIMIT 1),
         |w$i AS (SELECT word, cnt,
         |  coalesce(replace(s, '$S' || b.l || '$S$S' || b.r || '$S', '$S' || b.l || b.r || '$S'),
         |           s) AS s
         |  FROM w${i - 1} LEFT JOIN b$i b ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""wc AS (
       |  SELECT w AS word, count(*) AS cnt FROM (
       |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |    FROM documents WHERE doc_id % 5 <> 0)
       |  WHERE len(w) > 0 GROUP BY 1),
       |w0 AS (SELECT word, cnt,
       |  '$S' || substr(regexp_replace(word, '(.)', '\\1$S$S', 'g'), 1, 3 * len(word) - 1) AS s
       |  FROM wc),
       |$stages""".stripMargin
  }

  /** Shared DuckDB CTE chain for the perceptron oracles (q81/q82):
    * hashed unigram features over `documents` (the q75 tokenization),
    * labels +1 for doc_id ≡ 0 (mod 7) / -1 otherwise, then `k` unrolled
    * batch-perceptron iterations — stage i = margins under w{i-1}/b{i-1}
    * (LEFT JOIN so unseen buckets weigh 0), misclassified set (y·margin
    * ≤ 0), bucket deltas + bias delta, and the merged w{i}/b{i}. All
    * BIGINT — bit-exact vs [[graft.ops.QualityClassifier.train]]. Sums
    * are CAST back from DuckDB's HUGEINT at every update so the carried
    * types stay BIGINT. */
  private def clfCtes(k: Int, nBuckets: Int): String = {
    val stages = (1 to k).map { i =>
      s"""s$i AS (SELECT f.id, CAST(sum(coalesce(w.w, 0) * f.cnt) AS BIGINT)
         |    + (SELECT bias FROM b${i - 1}) AS score
         |  FROM feat f LEFT JOIN w${i - 1} w ON w.bucket = f.bucket
         |  GROUP BY f.id),
         |m$i AS (SELECT l.id, l.y FROM lab l JOIN s$i s ON s.id = l.id
         |        WHERE l.y * s.score <= 0),
         |u$i AS (SELECT bucket, CAST(sum(d) AS BIGINT) AS d FROM (
         |    SELECT f.bucket, CAST(m.y AS BIGINT) * f.cnt AS d
         |    FROM feat f JOIN m$i m ON m.id = f.id
         |    UNION ALL SELECT CAST(-1 AS BIGINT), CAST(y AS BIGINT) FROM m$i)
         |  GROUP BY 1),
         |w$i AS (SELECT coalesce(w.bucket, u.bucket) AS bucket,
         |    coalesce(w.w, 0) + coalesce(u.d, 0) AS w
         |  FROM w${i - 1} w FULL OUTER JOIN
         |    (SELECT * FROM u$i WHERE bucket >= 0) u ON w.bucket = u.bucket),
         |b$i AS (SELECT (SELECT bias FROM b${i - 1})
         |    + coalesce((SELECT d FROM u$i WHERE bucket = -1), 0) AS bias)""".stripMargin
    }.mkString(",\n")
    s"""tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
       |       FROM documents),
       |feat AS (SELECT doc_id AS id, ${QueriesB.polyHashSql("t")} % $nBuckets AS bucket,
       |           count(*) AS cnt
       |         FROM tok GROUP BY 1, 2),
       |lab AS (SELECT doc_id AS id,
       |          CASE WHEN doc_id % 7 = 0 THEN 1 ELSE -1 END AS y
       |        FROM documents),
       |w0 AS (SELECT CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS w
       |       WHERE 1 = 0),
       |b0 AS (SELECT CAST(0 AS BIGINT) AS bias),
       |$stages""".stripMargin
  }

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // q75: CCNet-style perplexity scoring (Perplexity.scoreNll, Wenzek
    // et al. 2020) — reference corpus = docs with doc_id ≡ 0 (mod 7),
    // scored corpus = the rest; hashed bucket-bigram LM over 256 buckets
    // (portable poly hash), Laplace α = 1. The oracle recomputes the
    // WHOLE pipeline — tokenize, hash, count, smooth, ordered fold — so
    // the per-doc mean NLL doubles are bit-identical, not approximate.
    // ------------------------------------------------------------------
    "q75_ccnet_perplexity" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val nB = 256
        val model = graft.ops.Perplexity.bigramModel(
          graft.ops.Perplexity.bigramFeatures(
            docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", nB))
        graft.ops.Perplexity.scoreNll(
            graft.ops.Perplexity.bigramFeatures(
              docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text", nB),
            model, nB)
          .select(col("id"), col("n_scored"),
            round(col("nll"), 6).as("nll"), round(col("ppl"), 6).as("ppl"))
          .orderBy(col("id"))
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, list_transform(
             |    string_split_regex(trim(text), '\\s+'),
             |    t -> ${QueriesB.polyHashSql("t")} % 256) AS bk
             |  FROM documents),
             |pairs AS (
             |  SELECT doc_id,
             |    unnest(bk[1:len(bk)-1]) AS pb,
             |    unnest(bk[2:len(bk)]) AS cb
             |  FROM tok WHERE len(bk) >= 2),
             |fC AS (SELECT doc_id, pb, cb, count(*) AS cnt
             |       FROM pairs WHERE doc_id % 7 <> 0 GROUP BY 1, 2, 3),
             |big AS (SELECT pb, cb, count(*) AS c2
             |        FROM pairs WHERE doc_id % 7 = 0 GROUP BY 1, 2),
             |ctx AS (SELECT pb, sum(c2) AS c1 FROM big GROUP BY 1),
             |contrib AS (
             |  SELECT f.doc_id, f.pb, f.cb, f.cnt,
             |    f.cnt * (ln(coalesce(c.c1, 0) + 256.0)
             |           - ln(coalesce(b.c2, 0) + 1.0)) AS c
             |  FROM fC f LEFT JOIN big b USING (pb, cb)
             |            LEFT JOIN ctx c USING (pb)),
             |agg AS (
             |  SELECT doc_id AS id, CAST(sum(cnt) AS BIGINT) AS n_scored,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(c ORDER BY pb, cb)), (a, b) -> a + b) AS s
             |  FROM contrib GROUP BY doc_id)
             |SELECT id, n_scored, round(s / n_scored, 6) AS nll,
             |  round(exp(s / n_scored), 6) AS ppl
             |FROM agg ORDER BY id""".stripMargin),
      "CCNet-style hashed-bigram LM perplexity scoring (Perplexity.scoreNll)"),

    // ------------------------------------------------------------------
    // q76: deterministic split + cross-split near-dup leakage guard
    // (Splits, GPT-3/Pile decontamination direction) — 70/30 hash split
    // of `documents`, portable MinHash banding (q26's 8-perm/4-band
    // construction), and a `leaked` verdict on every train doc that
    // shares a band bucket with an eval doc. The oracle recomputes the
    // split hash, the banding, and the cross-split join.
    // ------------------------------------------------------------------
    "q76_split_leakage" -> Q(
      (s, d) => {
        val assigned = graft.ops.Splits.assignSplit(
          t(s, d, "documents").select(col("doc_id")),
          "doc_id", Seq("train" -> 0.7, "eval" -> 0.3))
        // native one-pass signatures + banding (QueriesB.minhashBandsOf)
        val bands = QueriesB.minhashBandsOf(t(s, d, "documents"))
        def side(name: String) = bands.join(
          assigned.filter(col("split") === name).select(col("doc_id")), "doc_id")
        val leaks = graft.ops.Splits.leakPairsBanded(
            side("train"), side("eval"), "doc_id", Int.MaxValue)
          .select(col("a_id").as("train_id")).distinct()
        assigned.join(leaks, assigned("doc_id") === leaks("train_id"), "left")
          .select(col("doc_id"), col("split"),
            (col("split") === "train" && col("train_id").isNotNull).as("leaked"))
          .orderBy(col("doc_id"))
      },
      Some {
        val sels = QueriesB.MinhashPerms.zipWithIndex
          .map { case ((a, b), i) => s"min((h * $a + $b) % 1000000007) AS m$i" }
          .mkString(", ")
        val bandRows = (0 until 4)
          .map(b => s"SELECT doc_id, $b AS band, m${2 * b} * 1000000007 + m${2 * b + 1} AS bv FROM sig")
          .mkString(" UNION ALL ")
        s"""WITH assigned AS (
           |  SELECT doc_id, CASE WHEN
           |    ((${QueriesB.polyHashSql("CAST(doc_id AS VARCHAR)")} * 2654435761)
           |      % 1000000007 + 0.5) / 1000000007.0 < 0.7
           |    THEN 'train' ELSE 'eval' END AS split
           |  FROM documents),
           |sh AS (${QueriesB.shinglesSql}),
           |hashed AS (SELECT doc_id, ${QueriesB.polyHashSql("sh")} AS h FROM sh),
           |sig AS (SELECT doc_id, $sels FROM hashed GROUP BY doc_id),
           |bands AS ($bandRows),
           |bt AS (SELECT b.* FROM bands b JOIN assigned a USING (doc_id)
           |       WHERE a.split = 'train'),
           |be AS (SELECT b.* FROM bands b JOIN assigned a USING (doc_id)
           |       WHERE a.split = 'eval'),
           |leaks AS (SELECT DISTINCT bt.doc_id AS train_id
           |          FROM bt JOIN be ON bt.band = be.band AND bt.bv = be.bv)
           |SELECT a.doc_id, a.split,
           |  (a.split = 'train' AND l.train_id IS NOT NULL) AS leaked
           |FROM assigned a LEFT JOIN leaks l ON l.train_id = a.doc_id
           |ORDER BY a.doc_id""".stripMargin
      },
      "hash split + cross-split LSH leakage guard (Splits.assignSplit/leakPairsBanded)"),

    // ------------------------------------------------------------------
    // q77: BPE tokenizer training (Bpe.train, Sennrich et al. 2016) —
    // 6 merges learned from the doc_id % 5 ≠ 0 split of `documents`.
    // The oracle unrolls every merge as a CTE stage (pair counts →
    // deterministic argmax → the same literal replace), so the learned
    // merge TABLE itself is the compared result: any divergence in any
    // iteration's counts, tie-break, or greedy replace semantics shows.
    // ------------------------------------------------------------------
    "q77_bpe_train" -> Q(
      (s, d) => {
        import s.implicits._
        val (merges, _) = graft.ops.Bpe.train(
          graft.ops.Bpe.wordCounts(
            t(s, d, "documents").filter(col("doc_id") % 5 =!= 0), "text"), 6)
        merges.map(m => (m.rank, m.left, m.right)).toDF("rank", "l", "r")
          .orderBy(col("rank"))
      },
      Some(s"""WITH ${bpeCtes(6)}
             |SELECT rank, l, r FROM (
             |  ${(1 to 6).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")})
             |ORDER BY rank""".stripMargin),
      "distributed BPE merge training, argmax unrolled per iteration (Bpe.train)"),

    // ------------------------------------------------------------------
    // q78: BPE encoding via the trained segmentation plane (Bpe.encode)
    // — the held-out split (doc_id % 5 = 0), each doc salted with a
    // guaranteed-OOV word 'zz<doc_id>' (training text has no digits), is
    // encoded against q77's 6-merge training; output = per-doc subword
    // token counts. Known words take the broadcast segmentation join,
    // OOV words the character fallback — the oracle recomputes both.
    // ------------------------------------------------------------------
    "q78_bpe_encode" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpus = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"),
            concat(trim(col("text")), lit(" zz"), col("doc_id")).as("text"))
        graft.ops.Bpe.tokenCounts(
            docs.filter(col("doc_id") % 5 =!= 0), corpus, "doc_id", "text", 6)
          .orderBy(col("id"))
      },
      Some(s"""WITH ${bpeCtes(6)},
             |seg AS (SELECT word,
             |  len(string_split(substr(s, 2, len(s)-2),
             |      '${graft.ops.Bpe.Sep}${graft.ops.Bpe.Sep}')) AS n_sub
             |  FROM w6),
             |corpus AS (
             |  SELECT doc_id, trim(text) || ' zz' || doc_id AS text
             |  FROM documents WHERE doc_id % 5 = 0),
             |words AS (
             |  SELECT doc_id, w AS word FROM (
             |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
             |    FROM corpus) WHERE len(w) > 0)
             |SELECT doc_id AS id,
             |  CAST(sum(coalesce(n_sub, len(word))) AS BIGINT) AS n_tokens
             |FROM words LEFT JOIN seg USING (word)
             |GROUP BY 1 ORDER BY id""".stripMargin),
      "BPE encode through the broadcast segmentation plane + OOV char fallback (Bpe.encode)"),

    // ------------------------------------------------------------------
    // q79: temperature-flattened mixture resampling (Temperature, XLM-R
    // α-sampling / GPT-3 mixture weights) — α = 0.5 over `lang`,
    // totalDocs = 458 (chosen so every rounded target sits ≥ 0.2 from a
    // .5 tie at sf0.01 AND sf0.1 — pow() last-ulp divergence can't flip
    // a quota — and so four strata hit the without-replacement cap at
    // sf0.01 while en does not). The oracle recomputes the α-plane with
    // the same ordered denominator fold and windows the full table; the
    // Spark side runs the prefiltered kMax plan — equality pins both the
    // quota math and the prefilter's losslessness under variable cutoffs.
    // ------------------------------------------------------------------
    "q79_temperature_mix" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.ops.Temperature.resample(docs, "lang",
            graft.functions.HashFns.polyHash(col("doc_id").cast("string")),
            col("doc_id"), alpha = 0.5, totalDocs = 458)
          .select(col("lang"), col("doc_id"),
            col("sample_rank").cast("long").as("sample_rank"))
          .orderBy(col("lang"), col("sample_rank"))
      },
      Some(s"""WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
             |denom AS (
             |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |    list(pow(n_docs, 0.5) ORDER BY lang)), (a, b) -> a + b) AS W
             |  FROM counts),
             |q AS (SELECT lang,
             |        least(n_docs,
             |          CAST(round(458.0 * pow(n_docs, 0.5) / W) AS BIGINT)) AS quota
             |      FROM counts CROSS JOIN denom),
             |ranked AS (
             |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
             |    ORDER BY ${QueriesB.polyHashSql("CAST(doc_id AS VARCHAR)")} % 1000000, doc_id) AS sample_rank
             |  FROM documents)
             |SELECT r.lang, r.doc_id, CAST(r.sample_rank AS BIGINT) AS sample_rank
             |FROM ranked r JOIN q USING (lang) WHERE r.sample_rank <= q.quota
             |ORDER BY lang, sample_rank""".stripMargin),
      "temperature-flattened per-stratum resampling quotas (Temperature.resample)"),

    // ------------------------------------------------------------------
    // q80: RefinedWeb-style URL filtering (UrlFilter, Penedo et al. 2023
    // §3.1) — both engines synthesize the same URL per doc_id (host with
    // an occasionally-banned suffix, arithmetic path depth, spam words,
    // digit runs, param bursts), then the oracle recomputes host/path/
    // query extraction (same Java∩RE2 regexes), the sorted-order word
    // score, and the full verdict CASE chain with identical thresholds.
    // ------------------------------------------------------------------
    "q80_url_filter" -> Q(
      (s, d) => {
        val cfg = graft.ops.UrlFilter.Config(
          blockedHosts = Set("h7.example"),
          blockedSuffixes = Seq(".bad.example"),
          wordWeights = Map("casino" -> 0.6, "poker" -> 0.5, "free" -> 0.2),
          softThreshold = 1.0,
          maxUrlLength = 64,
          maxDigitRatio = 0.5,
          maxQueryParams = 4,
          maxPathDepth = 5)
        val urls = t(s, d, "documents").select(col("doc_id"),
          concat(
            lit("https://h"), col("doc_id") % 37,
            when(col("doc_id") % 11 === 0, lit(".bad.example"))
              .otherwise(lit(".example")),
            lit("/s"), expr("repeat('/d', CAST(doc_id % 7 AS INT))"),
            when(col("doc_id") % 13 === 0, lit("/free-casino-poker"))
              .otherwise(lit("")),
            when(col("doc_id") % 17 === 0, lit("/n999999999999"))
              .otherwise(lit("")),
            when(col("doc_id") % 19 === 0, lit("?k=1&k=1&k=1&k=1&k=1&k=1"))
              .otherwise(lit(""))).as("url"))
        graft.ops.UrlFilter.audit(urls, "url", cfg)
          .select(col("doc_id"), col("url"), col("url_host"),
            round(col("word_score"), 6).as("word_score"), col("url_verdict"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH urls AS (
             |  SELECT doc_id,
             |    'https://h' || (doc_id % 37) ||
             |    (CASE WHEN doc_id % 11 = 0 THEN '.bad.example' ELSE '.example' END) ||
             |    '/s' || repeat('/d', CAST(doc_id % 7 AS INT)) ||
             |    (CASE WHEN doc_id % 13 = 0 THEN '/free-casino-poker' ELSE '' END) ||
             |    (CASE WHEN doc_id % 17 = 0 THEN '/n999999999999' ELSE '' END) ||
             |    (CASE WHEN doc_id % 19 = 0 THEN '?k=1&k=1&k=1&k=1&k=1&k=1' ELSE '' END) AS url
             |  FROM documents),
             |parts AS (
             |  SELECT doc_id, url,
             |    regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS url_host,
             |    regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
             |    regexp_extract(lower(url), '\?([^#]*)', 1) AS query,
             |    (CASE WHEN contains(lower(url), 'casino') THEN 0.6 ELSE 0.0 END)
             |      + (CASE WHEN contains(lower(url), 'free') THEN 0.2 ELSE 0.0 END)
             |      + (CASE WHEN contains(lower(url), 'poker') THEN 0.5 ELSE 0.0 END) AS word_score
             |  FROM urls)
             |SELECT doc_id, url, url_host, round(word_score, 6) AS word_score,
             |  CASE
             |    WHEN url_host = 'h7.example' OR url_host LIKE '%.bad.example'
             |      THEN 'blocked_host'
             |    WHEN word_score >= 1.0 THEN 'word_score'
             |    WHEN len(url) > 64 THEN 'too_long'
             |    WHEN (CASE WHEN len(path) = 0 THEN 0.0
             |          ELSE CAST(len(regexp_replace(path, '[^0-9]', '', 'g')) AS DOUBLE)
             |               / len(path) END) > 0.5 THEN 'digit_ratio'
             |    WHEN (CASE WHEN len(query) = 0 THEN 0
             |          ELSE len(string_split(query, '&')) END) > 4 THEN 'query_params'
             |    WHEN len(list_filter(string_split(path, '/'), x -> len(x) > 0)) > 5
             |      THEN 'path_depth'
             |    ELSE 'ok' END AS url_verdict
             |FROM parts ORDER BY doc_id""".stripMargin),
      "RefinedWeb URL-quality audit: blocklist + word score + structural heuristics (UrlFilter.audit)"),

    // ------------------------------------------------------------------
    // q81: classifier-based quality filtering, TRAINING (GPT-3 Appendix
    // A / LLaMA fastText direction; QualityClassifier) — a batch
    // perceptron over 64-bucket hashed unigram counts, labels +1 for the
    // doc_id % 7 = 0 "reference" slice (q75's posture) vs -1 for the
    // rest, 4 iterations. All-integer training means the learned model
    // is bit-exact across engines — the oracle unrolls every iteration
    // (margins → misclassified set → updates) as CTE stages, so the
    // compared result is the weight TABLE itself plus the bias (the
    // bucket = -1 row): any divergence in margin, tie (y·margin ≤ 0), or
    // update arithmetic in any iteration shows.
    // ------------------------------------------------------------------
    "q81_quality_clf_train" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = graft.ops.QualityClassifier.trainOnDocs(
          docs, "doc_id", "text",
          docs.select(col("doc_id").as("id"),
            when(col("doc_id") % 7 === 0, lit(1)).otherwise(lit(-1)).as("y")),
          nBuckets = 64, maxIters = 4)
        graft.ops.QualityClassifier.weightTable(s, model)
          .orderBy(col("bucket"))
      },
      Some(s"""WITH ${clfCtes(4, 64)}
             |SELECT bucket, w FROM w4 WHERE w <> 0
             |UNION ALL SELECT CAST(-1 AS BIGINT), (SELECT bias FROM b4)
             |ORDER BY bucket""".stripMargin),
      "batch-perceptron quality classifier training, iterations unrolled (QualityClassifier.train)"),

    // ------------------------------------------------------------------
    // q82: classifier-based quality filtering, SCORING + GATE — q81's
    // trained model applied to the whole corpus: per-doc BIGINT margin
    // w·x + bias as a PURE MAP (Σ_tokens w[bucket(token)] folded inside
    // the scan — zero joins, zero exchanges, PlanSpec-pinned), keep =
    // margin > 0. The oracle extends the q81 chain with the histogram
    // formulation of the same scoring pass (identical by linearity).
    // ------------------------------------------------------------------
    "q82_quality_clf_gate" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = graft.ops.QualityClassifier.trainOnDocs(
          docs, "doc_id", "text",
          docs.select(col("doc_id").as("id"),
            when(col("doc_id") % 7 === 0, lit(1)).otherwise(lit(-1)).as("y")),
          nBuckets = 64, maxIters = 4)
        graft.ops.QualityClassifier.scoreMarginOnDocs(docs, "doc_id", "text", model)
          .select(col("id").as("doc_id"), col("margin"),
            (col("margin") > 0).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${clfCtes(4, 64)},
             |sc AS (SELECT f.id, CAST(sum(coalesce(w.w, 0) * f.cnt) AS BIGINT)
             |    + (SELECT bias FROM b4) AS margin
             |  FROM feat f LEFT JOIN w4 w ON w.bucket = f.bucket
             |  GROUP BY f.id)
             |SELECT id AS doc_id, margin, margin > 0 AS keep
             |FROM sc ORDER BY doc_id""".stripMargin),
      "perceptron margin scoring + keep gate over the corpus (QualityClassifier.scoreMargin)"))
}
