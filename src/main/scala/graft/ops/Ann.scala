package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline;
 *    queries × corpus crossJoin, so only for small query sets or as the
 *    per-bucket kernel below.
 *  - `lshTopK`: the scale path — random-hyperplane LSH (sign sketch):
 *    each vector gets a `planes`-bit signature from deterministic
 *    hash-derived hyperplanes; candidates share a signature bucket (with
 *    multi-probe via `tables` independent sign sets), then the exact
 *    kernel reranks within buckets. At 100 TB this is the IVF-style
 *    bucket-join: shuffle keys are (table, signature), never vectors
 *    crossed against everything.
 */
object Ann {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Native index-order dot product (graft.functions.DotF64) — same fold
    * order as aggregate(zip_with(...)), one JVM loop per pair. */
  def dot(a: Column, b: Column): Column = graft.functions.HashFns.dotF64(a, b)

  def l2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Exact cosine top-k neighbors for the `queries` rows within `corpus`. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nv"))
      .withColumn("nn", l2(col("nv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** `planes`-bit sign signature of a vector under table `t`: hyperplane
    * components are hash-derived ((xxhash64(table, plane, dim) pmod
    * 2000001 - 10^6)/10^6) — one native loop per vector
    * (graft.functions.SignSignatureExpr; bit-identical to the round-1
    * interpreted zip_with fold, pinned in HashExprsSpec). */
  def signSignature(vec: Column, planes: Int, table: Int): Column =
    graft.functions.HashFns.signSignature(asDouble(vec), planes, table)

  /** LSH-bucketed approximate top-k: bucket-join + exact rerank.
    *
    * Shuffle discipline (the 100 TB shape): the bucket join and the
    * candidate-pair `distinct` carry ONLY (id, table, signature) — never
    * the vectors; vectors are re-attached per side just for the exact
    * rerank of the deduplicated candidates. (Round 1 shipped both full
    * vectors through the join and ran distinct() over array columns.) */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 6, tables: Int = 8): DataFrame = {
    def signed(df: DataFrame, idAs: String): DataFrame = {
      val v = asDouble(col(vecCol))
      df.select(col(idCol).as(idAs),
          explode(array((0 until tables).map(t =>
            struct(lit(t).as("tbl"), signSignature(v, planes, t).as("sig"))): _*)).as("x"))
        .select(col(idAs), col("x.tbl"), col("x.sig"))
    }
    val cand = signed(queries, "query_id").join(signed(corpus, "neighbor_id"), Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val qv = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val nv = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(qv, Seq("query_id"))
      .join(nv, Seq("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF-flat approximate top-k: the classic inverted-file ANN
    * (Sivic & Zisserman 2003 / FAISS IVF) as the second scale path next
    * to [[lshTopK]].
    *
    *  - coarse quantizer: `nlist` centroids picked deterministically
    *    (corpus rows with the smallest xxhash64(id) — a hash-random
    *    sample), optionally refined by `kmeansIters` distributed
    *    spherical-k-means passes ([[ivfCentroids]]) — better-balanced
    *    inverted lists and higher recall at the same nprobe, with
    *    nothing structural changed;
    *  - every corpus vector is assigned to its nearest centroid by a
    *    per-row argmax over the centroid LITERAL ([[ivfAssign]]) — an
    *    O(N·nlist) pure map inside the scan stage; the assignment subplan
    *    contains no join and no Exchange at all (pinned in PlanSpec);
    *  - each query probes its `nprobe` nearest centroids and reranks
    *    exactly within those inverted lists only.
    *
    * At 100 TB the inverted lists are the partition layout: corpus
    * repartitioned by `cluster`, queries shuffled only to their probed
    * clusters — cost O(N·nprobe/nlist) per query instead of O(N). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 0): DataFrame = {
    val cents = centroidLiteralOf(ivfCentroidSeq(corpus, idCol, vecCol, nlist, kmeansIters))
    val lists = ivfAssign(corpus, idCol, vecCol, cents, keep = 1)
      .withColumnRenamed(idCol, "neighbor_id")
      .withColumnRenamed("dv", "nv").withColumnRenamed("dn", "nn")
    val probes = ivfAssign(queries, idCol, vecCol, cents, keep = nprobe)
      .withColumnRenamed(idCol, "query_id")
      .withColumnRenamed("dv", "qv").withColumnRenamed("dn", "qn")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(lists, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** One coarse-quantizer centroid (driver-resident: the whole set is
    * O(nlist·dim) doubles — 2^4..2^12 rows, never data-scale). */
  private[graft] final case class Centroid(cluster: Int, cv: Seq[Double], cn: Double)

  /** The centroid set as ONE literal `array<struct<cluster,cv,cn>>`
    * column — the same materialization `broadcast(centroids)` performs
    * internally, but as a literal the scoring becomes a per-row
    * expression: no join operator, no Exchange anywhere in the
    * assignment subplan. */
  private def centroidLiteralOf(cents: Seq[Centroid]): Column =
    array(cents.sortBy(_.cluster).map { c =>
      struct(lit(c.cluster).as("cluster"),
        typedLit(c.cv).as("cv"),
        lit(c.cn).as("cn"))
    }: _*)

  /** DataFrame adapter of [[centroidLiteralOf]] (collects nlist rows). */
  private[graft] def centroidLiteral(centroids: DataFrame): Column =
    centroidLiteralOf(centroids.select(col("cluster"), col("cv"), col("cn"))
      .collect()
      .map(r => Centroid(r.getInt(0), r.getSeq[Double](1), r.getDouble(2))).toSeq)

  /** Nearest-centroid assignment as a PURE MAP: per row, score every
    * centroid of the literal with the native dot kernel and keep the top
    * `keep` by (cosine desc, cluster asc) — a transform + array_sort over
    * an nlist-length array, fully inside the stage that scans the
    * vectors. Replaces the round-3 crossJoin(broadcast) + row_number
    * window, whose per-id window Exchange shuffled N·nlist candidate rows
    * EACH carrying the full vector (an nlist-fold duplication of the
    * corpus through the exchange — the very thing the doc comment
    * promised not to do). Output: (idCol, cluster, dv, dn); `keep > 1`
    * explodes to one row per probed cluster. */
  private[graft] def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      cents: Column, keep: Int): DataFrame = {
    if (keep == 1) assignBest(df, idCol, vecCol, cents).drop("ccos")
    else {
      val v = asDouble(col(vecCol))
      // struct order (ccos, negc, cluster): lexicographic max = highest
      // cosine, ties to the LOWEST cluster id (negc), matching the old
      // window's (ccos desc, cluster asc). try_divide for the same
      // zero-norm tolerance assignBest documents: a 0-vector probes the
      // lowest-id clusters instead of killing the job under ANSI mode.
      df.select(col(idCol), v.as("dv"))
        .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
        .withColumn("scored", transform(cents, c =>
          struct(try_divide(dot(col("dv"), c.getField("cv")),
            col("dn") * c.getField("cn")).as("ccos"),
            (-c.getField("cluster")).as("negc"),
            c.getField("cluster").as("cluster"))))
        .select(col(idCol),
          explode(slice(sort_array(col("scored"), asc = false), 1, keep)).as("s"),
          col("dv"), col("dn"))
        .select(col(idCol), col("s.cluster").as("cluster"), col("dv"), col("dn"))
    }
  }

  /** The keep-one assignment with the winning centroid-cosine kept in the
    * output — (idCol, cluster, ccos, dv, dn). [[ivfAssign]]'s keep==1
    * branch and [[SemDedup]]'s keep rule both run on this single
    * implementation so the argmax/tie-break semantics cannot drift.
    *
    * try_divide, not `/`: a zero-norm vector (empty doc, failed embed)
    * makes the cosine 0/0, which under ANSI mode (Spark 4 default) is a
    * job-killing DIVIDE_BY_ZERO — one bad row must not take down a
    * corpus-scale build. Its ccos comes back NULL (cosine to anything is
    * undefined), which sorts below every real cosine in the argmax, so
    * the row deterministically lands in the lowest cluster id. */
  private[graft] def assignBest(df: DataFrame, idCol: String, vecCol: String,
      cents: Column): DataFrame = {
    val v = asDouble(col(vecCol))
    df.select(col(idCol), v.as("dv"))
      .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
      .withColumn("best", array_max(transform(cents, c =>
        struct(
          try_divide(dot(col("dv"), c.getField("cv")),
            col("dn") * c.getField("cn")).as("ccos"),
          (-c.getField("cluster")).as("negc"),
          c.getField("cluster").as("cluster")))))
      .select(col(idCol), col("best.cluster").as("cluster"),
        col("best.ccos").as("ccos"), col("dv"), col("dn"))
  }

  /** Coarse-quantizer centroids for [[ivfTopK]]: a deterministic
    * hash-random seed (nlist corpus rows with the smallest xxhash64(id))
    * optionally refined by `iters` spherical-k-means (Lloyd) passes.
    *
    * Each pass is fully distributed where it matters — the per-VECTOR
    * work: assignment is the same zero-shuffle per-row argmax the index
    * build uses (vectors never shuffle, no Exchange in the subplan), and
    * the new centroid means are computed by posexploding assigned
    * vectors and aggregating per (cluster, dim) — partial aggregation
    * collapses map-side to O(nlist·dim) rows per partition before the
    * shuffle, never whole vectors. Only the O(nlist·dim) centroid set
    * itself lives on the driver between passes (the FAISS coarse-quantizer
    * training layout), which makes each Lloyd pass exactly ONE Spark job
    * ending in an nlist-row collect — the round-3 DataFrame-resident loop
    * spent more time dispatching its per-pass localCheckpoint/broadcast
    * jobs than computing. A cluster that loses all members keeps its
    * previous centroid (the standard empty-cluster fallback). */
  private[graft] def ivfCentroidSeq(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 0): Seq[Centroid] = {
    val v = asDouble(col(vecCol))
    // deterministic hash-random seed: nlist corpus rows with the smallest
    // xxhash64(id); TakeOrderedAndProject returns them already in (hk, id)
    // order, which defines the cluster numbering
    val seedRows = corpus
      .select(col(idCol).as("c_id"), v.as("cv"))
      .withColumn("hk", xxhash64(col("c_id")))
      .orderBy(col("hk"), col("c_id"))
      .limit(nlist)
      .select(col("cv"))
      .collect()
    var cents: Seq[Centroid] = seedRows.zipWithIndex.map { case (r, i) =>
      val cv = r.getSeq[Double](0)
      Centroid(i, cv, math.sqrt(cv.iterator.map(x => x * x).sum))
    }.toSeq
    if (iters > 0 && cents.nonEmpty) {
      // loop-invariant: cache the corpus vectors once — every Lloyd pass
      // re-reads them for assignment
      val vecs = corpus.select(col(idCol).as("vid"), v.as("dv")).cache()
      var it = 0
      while (it < iters) {
        val assigned = ivfAssign(vecs, "vid", "dv", centroidLiteralOf(cents), keep = 1)
          .select(col("cluster"), col("dv"))
        val meanRows = assigned
          .select(col("cluster"), posexplode(col("dv")).as(Seq("dim", "x")))
          .groupBy(col("cluster"), col("dim")).agg(avg(col("x")).as("m"))
          .groupBy(col("cluster"))
          .agg(transform(sort_array(collect_list(struct(col("dim"), col("m")))),
            e => e.getField("m")).as("mv"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
        cents = cents.map { c =>
          meanRows.get(c.cluster) match {
            case Some(mv) => Centroid(c.cluster, mv, math.sqrt(mv.iterator.map(x => x * x).sum))
            case None => c // empty cluster keeps its previous centroid
          }
        }
        it += 1
      }
      vecs.unpersist(blocking = false)
    }
    cents
  }

  /** [[ivfCentroidSeq]] as a DataFrame (cluster, cv, cn) — the public
    * centroid-table surface. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    ivfCentroidSeq(corpus, idCol, vecCol, nlist, iters)
      .map(c => (c.cluster, c.cv, c.cn)).toDF("cluster", "cv", "cn")
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    * `threshold`): sign-LSH bucket join for candidates, exact cosine
    * verify. Same shuffle discipline as [[lshTopK]] — the bucket join and
    * `distinct` carry only (id, table, signature); vectors re-attach for
    * the verify of deduplicated candidates only. At near-dup thresholds
    * (≥ 0.9, angle ≤ 26°) per-table bucket-collision probability is
    * (1 - θ/π)^planes, so a handful of independent tables reaches
    * recall ≈ 1 while random pairs (θ ≈ π/2) almost never collide.
    *
    * `maxBucketSize` caps degenerate buckets BEFORE the b² pair expansion
    * — a corpus with many near-identical embeddings (exactly the near-dup
    * input) or all-zero vectors puts b docs into one (table, signature)
    * bucket and would emit b² join rows; pairs inside a dropped bucket
    * are sacrificed knowingly (same documented skew-guard semantics as
    * [[graft.ops.Dedup.minhashLshPairs]] / `simhashPairsFor`), never
    * silently exploded. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      planes: Int = 8, tables: Int = 4, maxBucketSize: Int = 10000): DataFrame = {
    val v = asDouble(col(vecCol))
    val bucketed = df.select(col(idCol).as("id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), signSignature(v, planes, t).as("sig"))): _*)).as("x"))
      .select(col("id"), col("x.tbl"), col("x.sig"))
    val signed = bucketed.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("tbl"), col("sig"))))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    val cand = signed.as("a").join(signed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val va = df.select(col(idCol).as("id_a"), v.as("va"))
    val vb = df.select(col(idCol).as("id_b"), v.as("vb"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** ANN evaluation plane: recall@k of an approximate top-k result
    * against the exact one — the metric every approximate index
    * ([[lshTopK]], [[ivfTopK]], PQ/ADC) is tuned by, as a distributed
    * op instead of a notebook loop. Inputs are two (queryCol,
    * neighborCol) top-k tables (ranks irrelevant — recall@k is set
    * overlap); duplicates are collapsed, and a query missing from
    * `approx` entirely scores 0 — an index that returns nothing must
    * not be graded only on the queries it answered.
    *
    * Output: one row per query in `exact` — the exact side DEFINES the
    * graded query set (a query only the approx index invented has no
    * ground truth to grade against) — (queryCol, n_hits, recall) with
    * recall = |approx ∩ exact| / min(k, n_exact) rounded to 6: when the
    * ground truth supplies fewer than k neighbors (corpus edge, filtered
    * queries), a perfect index still scores 1.0 instead of being capped
    * at n_exact/k. Mean over queries via [[recallSummary]]. Scale: one
    * equi-join on (query, neighbor) — both sides are O(queries·k)
    * fixed-width rows — and one combinable count. */
  def recallAtK(approx: DataFrame, exact: DataFrame, queryCol: String,
      neighborCol: String, k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val a = approx.select(col(queryCol), col(neighborCol)).distinct()
    val e = exact.select(col(queryCol), col(neighborCol)).distinct()
    val hits = e.join(a, Seq(queryCol, neighborCol), "left_semi")
      .groupBy(col(queryCol)).agg(count(lit(1)).as("n_hits"))
    e.groupBy(col(queryCol)).agg(count(lit(1)).as("__n_exact"))
      .join(hits, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) /
          least(lit(k.toLong), col("__n_exact")).cast("double"), 6).as("recall"))
  }

  /** O(1)-row rollup of [[recallAtK]]: (n_queries, mean_recall). */
  def recallSummary(perQuery: DataFrame): DataFrame =
    perQuery.agg(count(lit(1)).as("n_queries"),
      round(avg(col("recall")), 6).as("mean_recall"))
}
