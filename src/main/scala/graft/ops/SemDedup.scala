package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SemDeDup — semantic deduplication of an embedded corpus (Abbas et al.
 * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
 * deduplication", arXiv:2303.09540). Near-duplicate SEMANTICS (same
 * content re-rendered, templated, paraphrased) survive lexical dedup
 * ([[Dedup]]) and even embedding near-dup pair mining at corpus scale; the
 * paper's recipe makes the quadratic step tractable by pre-clustering:
 *
 *  1. k-means-cluster the embeddings (coarse quantizer — the same
 *     centroid machinery as [[Ann.ivfTopK]]);
 *  2. ONLY within each cluster, find pairs with cosine ≥ threshold;
 *  3. group the pairs transitively; from each duplicate group keep the
 *     example with the LOWEST cosine to its cluster centroid (the
 *     "keep the outlier" rule — retains the group's most atypical,
 *     i.e. most informative, member) and drop the rest.
 *
 * Scale shape: assignment is the zero-shuffle per-row argmax over the
 * centroid literal ([[Ann]]'s pattern — no join, no Exchange, vectors
 * never leave their scan); the within-cluster pair join carries only
 * (cluster, id) rows, with vectors re-attached by id for the exact
 * verify of candidates only; `maxClusterSize` caps a degenerate cluster
 * BEFORE its b² pair expansion (overflow rows are KEPT undeduped —
 * conservative, the same documented skew-guard posture as
 * [[Ann.nearDupPairs]] / [[Dedup.minhashLshPairs]]); grouping is
 * [[Cluster.connectedComponents]] (pair lists aren't transitive even when
 * the relation is); the keep rule is one window over O(corpus) fixed-width
 * rows partitioned by component.
 */
object SemDedup {

  /** Per-id verdict: (id, cluster, ccos, component, keep) — `cluster` the
    * assigned k-means cluster, `ccos` cosine to its centroid, `component`
    * the duplicate group (= the group's min id; singleton ⇒ own id),
    * `keep` the SemDeDup survivor flag. `centroids` is a
    * (cluster, cv: array<double>, cn: double) table, e.g. from
    * [[Ann.ivfCentroids]] (O(nlist·dim) — literal-sized, never data-scale). */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    val cents = Ann.centroidLiteral(centroids)

    // assignment + centroid cosine: Ann.assignBest — the same pure-map
    // literal-centroid argmax the IVF index build uses (one
    // implementation, one tie-break rule)
    val base = Ann.assignBest(
      emb.select(col(idCol).as("id"), col(vecCol).as("v")), "id", "v", cents)

    // within-cluster candidate pairs — (cluster, id) rows only through the
    // join; the skew cap drops pair GENERATION for rows beyond
    // maxClusterSize in id order (they stay in the corpus as keepers).
    // Zero-norm vectors (empty doc, failed embed) are excluded here:
    // their pair cosine is 0/0 — a job-killing DIVIDE_BY_ZERO under ANSI
    // mode (Spark 4 default), and a cluster-chaining wildcard under
    // non-ANSI NaN semantics (NaN compares greater than every double, so
    // it passes any >= threshold test). They stay in the corpus as
    // keep=true singletons with ccos NULL.
    val keys = base
      .filter(col("dn") > 0.0)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster")).orderBy(col("id"))))
      .filter(col("rn") <= maxClusterSize)
      .select(col("cluster"), col("id"))
    val cand = keys.as("a").join(keys.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))

    // exact verify: vectors re-attach per side by id
    val va = base.select(col("id").as("id_a"), col("dv").as("va"), col("dn").as("na"))
    val vb = base.select(col("id").as("id_b"), col("dv").as("vb"), col("dn").as("nb"))
    val edges = cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cos", Ann.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))

    // duplicate groups + the paper's keep rule: per component keep the
    // member FARTHEST from its centroid (min ccos; ties → min id)
    val assigned = Cluster.assignComponents(
      base.select(col("id")), "id", edges, "id_a", "id_b")
    val w = Window.partitionBy(col("component")).orderBy(col("ccos").asc, col("id"))
    assigned.join(base.select(col("id"), col("cluster"), col("ccos")), Seq("id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("id"), col("cluster"), col("ccos"), col("component"), col("keep"))
  }

  /** The surviving corpus rows (the op most pipelines want). */
  def survivors(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      maxClusterSize: Int = 10000): DataFrame =
    emb.join(
      semDedup(emb, idCol, vecCol, centroids, threshold, maxClusterSize)
        .filter(col("keep")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
}
