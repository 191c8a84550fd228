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
    *  - every corpus vector is assigned to its nearest centroid — an
    *    O(N·nlist) broadcast map-side pass, no shuffle of vectors;
    *  - each query probes its `nprobe` nearest centroids and reranks
    *    exactly within those inverted lists only.
    *
    * At 100 TB the inverted lists are the partition layout: corpus
    * repartitioned by `cluster`, queries shuffled only to their probed
    * clusters — cost O(N·nprobe/nlist) per query instead of O(N). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 0): DataFrame = {
    val v = asDouble(col(vecCol))
    val centroids = ivfCentroids(corpus, idCol, vecCol, nlist, kmeansIters)
    def assign(df: DataFrame, idAs: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(idAs))
        .orderBy(col("ccos").desc, col("cluster"))
      df.select(col(idCol).as(idAs), v.as("dv"))
        .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
        .crossJoin(broadcast(centroids))
        .withColumn("ccos", dot(col("dv"), col("cv")) / (col("dn") * col("cn")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .select(col(idAs), col("cluster"), col("dv"), col("dn"))
    }
    val lists = assign(corpus, "neighbor_id", 1)
      .withColumnRenamed("dv", "nv").withColumnRenamed("dn", "nn")
    val probes = assign(queries, "query_id", nprobe)
      .withColumnRenamed("dv", "qv").withColumnRenamed("dn", "qn")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(lists, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Coarse-quantizer centroids for [[ivfTopK]]: a deterministic
    * hash-random seed (nlist corpus rows with the smallest xxhash64(id))
    * optionally refined by `iters` spherical-k-means (Lloyd) passes.
    *
    * Each pass is fully distributed: assignment is the same broadcast
    * O(N·nlist) map-side pass the index build uses (vectors never
    * shuffle), and the new centroid means are computed by posexploding
    * assigned vectors and aggregating per (cluster, dim) — shuffle rows
    * are (cluster, dim, partial sum), dimension-wise, never whole
    * vectors. A cluster that loses all members keeps its seed centroid
    * (the standard empty-cluster fallback). Output schema matches the
    * seed: (cluster, cv, cn). */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 0): DataFrame = {
    val v = asDouble(col(vecCol))
    var cents = corpus
      .select(col(idCol).as("c_id"), v.as("cv"))
      .withColumn("hk", xxhash64(col("c_id")))
      .orderBy(col("hk"), col("c_id"))
      .limit(nlist)
      .withColumn("cluster", (row_number().over(
        Window.orderBy(col("hk"), col("c_id"))) - 1).cast("int"))
      .select(col("cluster"), col("cv"), sqrt(dot(col("cv"), col("cv"))).as("cn"))
    if (iters > 0) {
      // loop-invariant: cache the normed corpus once — every Lloyd pass
      // re-reads it for assignment, and without the cache each pass would
      // rescan the source and recompute every norm
      val vecs = corpus.select(col(idCol).as("vid"), v.as("dv"))
        .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
        .cache()
      var it = 0
      while (it < iters) {
        val w = Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cluster"))
        val assigned = vecs
          .crossJoin(broadcast(cents))
          .withColumn("ccos", dot(col("dv"), col("cv")) / (col("dn") * col("cn")))
          .withColumn("crank", row_number().over(w))
          .filter(col("crank") === 1)
          .select(col("cluster"), col("dv"))
        val means = assigned
          .select(col("cluster"), posexplode(col("dv")).as(Seq("dim", "x")))
          .groupBy(col("cluster"), col("dim")).agg(avg(col("x")).as("m"))
          .groupBy(col("cluster"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
            e => e.getField("m")).as("mv"))
        cents = cents.select(col("cluster"), col("cv").as("seed_cv"))
          .join(means, Seq("cluster"), "left_outer")
          .select(col("cluster"), coalesce(col("mv"), col("seed_cv")).as("cv"))
          .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
          // small (nlist rows): materialize per pass so the lineage does
          // not stack iters crossJoins into one plan
          .localCheckpoint(eager = true)
        it += 1
      }
      vecs.unpersist(blocking = false)
    }
    cents
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    * `threshold`): sign-LSH bucket join for candidates, exact cosine
    * verify. Same shuffle discipline as [[lshTopK]] — the bucket join and
    * `distinct` carry only (id, table, signature); vectors re-attach for
    * the verify of deduplicated candidates only. At near-dup thresholds
    * (≥ 0.9, angle ≤ 26°) per-table bucket-collision probability is
    * (1 - θ/π)^planes, so a handful of independent tables reaches
    * recall ≈ 1 while random pairs (θ ≈ π/2) almost never collide. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      planes: Int = 8, tables: Int = 4): DataFrame = {
    val v = asDouble(col(vecCol))
    val signed = df.select(col(idCol).as("id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), signSignature(v, planes, t).as("sig"))): _*)).as("x"))
      .select(col("id"), col("x.tbl"), col("x.sig"))
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
}
