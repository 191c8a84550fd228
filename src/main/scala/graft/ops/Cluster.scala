package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/**
 * Dedup clustering: near-dup PAIRS (from [[Dedup.minhashLshPairs]] /
 * [[Dedup.simhashPairsFor]] / [[graft.ops.Ann.nearDupPairs]]) →
 * connected COMPONENTS → one SURVIVOR per component. This is the step a
 * production training-data pipeline runs after LSH: pair lists overlap
 * transitively (A~B, B~C), so "drop one of each pair" both over- and
 * under-deletes — the deletion unit is the component.
 *
 * Connected components are computed with the alternating
 * large-star / small-star algorithm (Kiveris et al., "Connected
 * Components in MapReduce and Beyond", SoCC'14): each round is two
 * equi-join + aggregate passes over the CURRENT edge set, edges only
 * ever point "downward" toward smaller ids, and the edge count never
 * exceeds the input edge count — unlike label propagation
 * (O(diameter) rounds) or hash-to-min (cluster lists concentrate at the
 * min node), this converges in O(log² n) rounds with per-round state
 * O(|E|), which is what survives a 100 TB corpus whose largest
 * boilerplate cluster is millions of documents.
 *
 * Scale notes:
 *  - every shuffle in a round carries (id, id) pairs only — never text;
 *  - per-round lineage is truncated with localCheckpoint (an iterative
 *    plan otherwise grows by two joins per round and Catalyst re-analysis
 *    dominates);
 *  - convergence is detected from a count + order-independent hash
 *    aggregate of the edge set (one cheap action per round), capped by
 *    `maxIter` as a defense against adversarial inputs.
 */
object Cluster {

  /** Strict less-than matching Spark's natural column ordering for the
    * id types the local fast path accepts (strings compare as UTF8
    * binary — Spark's UTF8String order, NOT java.lang.String order,
    * which differs for supplementary code points). */
  private def sparkLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case (x: java.lang.Integer, y: java.lang.Integer) => x < y
    case (x: java.lang.Short, y: java.lang.Short) => x < y
    case (x: java.lang.Byte, y: java.lang.Byte) => x < y
    case (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
    case _ => throw new IllegalArgumentException(
      s"unsupported local-CC id values: ${a.getClass} / ${b.getClass}")
  }

  private def localFastPathType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | StringType => true
      case _ => false
    }
  }

  /** Driver union-find (union by min root, path compression) over a
    * collected edge list: (node → min id of its component) for every
    * node present. O(E α(E)) — the whole component problem in one pass
    * once the edge set fits the driver. */
  private def localComponents(edges: Array[(Any, Any)]): Map[Any, Any] = {
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != null && parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != null && parent.get(c) != r) {
        val nxt = parent.get(c); parent.put(c, r); c = nxt
      }
      r
    }
    edges.foreach { case (u, v) =>
      if (parent.get(u) == null) parent.put(u, u)
      if (parent.get(v) == null) parent.put(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) {
        if (sparkLt(ru, rv)) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    import scala.jdk.CollectionConverters._
    parent.keySet().asScala.iterator.map(k => k -> find(k)).toMap
  }

  /** Connected components of the undirected graph given as a pair list.
    * Returns (`id`, `component`) for every node that appears in `pairs`,
    * where `component` is the MINIMUM node id in the node's component
    * (ids compare with Spark's natural column ordering — lexicographic
    * for strings). Self-pairs and duplicate pairs are tolerated.
    *
    * Size-gated local fast path: the deduped edge count is known before
    * the first round (the convergence fingerprint needs it anyway), and
    * when it is at most `maxLocalEdges` the whole problem collapses to
    * ONE collect + a driver union-find — strictly cheaper than even a
    * single large-star/small-star round (~4 exchanges + 2 actions), the
    * same cost philosophy as a broadcast join's size gate. The cap
    * bounds driver memory (16 bytes/edge for long ids — the 2^21
    * default is ~32 MB, broadcast-sized); web-scale dup graphs beyond it
    * take the unchanged O(log² n) distributed loop, so the 100 TB shape
    * is intact. Results are identical on either path (component = min
    * id, order-independent).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 64, maxLocalEdges: Long = 1L << 21): DataFrame = {
    // canonical orientation (hi → lo), self-loops dropped
    var edges = pairs
      .select(
        greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    // order-independent edge-set fingerprint: (count, xor-ish sum of row
    // hashes). Equal fingerprints on consecutive rounds = converged (a
    // collision would stop one round early with probability ~2^-64; the
    // result is still a fixed point of small-star — see the invariant
    // check in ClusterSpec).
    def fingerprint(df: DataFrame): (Long, Long) = {
      // hashes reduced mod a 30-bit prime before the sum: ANSI mode makes
      // a raw 64-bit hash sum an overflow error, and 2^33 rows x 2^30
      // stays far from Long.MaxValue
      val r = df.select(
        count(lit(1)).as("n"),
        coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L))), lit(0L)).as("h"))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = fingerprint(edges)

    val idType = edges.schema("u").dataType
    if (prev._1 <= maxLocalEdges && localFastPathType(idType)) {
      import org.apache.spark.sql.types.{StructField, StructType}
      val comp = localComponents(
        edges.collect().map(r => (r.get(0), r.get(1))))
      val schema = StructType(Seq(
        StructField("id", idType, nullable = true),
        StructField("component", idType, nullable = true)))
      val rows: java.util.List[org.apache.spark.sql.Row] =
        comp.iterator
          .map { case (k, v) => org.apache.spark.sql.Row(k, v) }
          .toSeq.asJava
      return pairs.sparkSession.createDataFrame(rows, schema)
    }

    var iter = 0
    var done = prev._1 == 0L
    while (!done && iter < maxIter) {
      // ---- large-star: for each node u, link every STRICTLY LARGER
      // neighbor to m(u) = min(Γ(u) ∪ {u}). Emitted edges are (v, m)
      // with v > u ≥ m, so the hi→lo orientation is preserved without
      // re-sorting.
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val afterLarge = sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

      // ---- small-star: edges already point hi→lo; for each node u,
      // re-link its smaller neighbors (and u itself) to the minimum.
      val mins2 = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      val relinked = afterLarge.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
      val selfLink = mins2.select(col("u"), col("m").as("v"))
      val afterSmall = relinked.union(selfLink)
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)

      val cur = fingerprint(afterSmall)
      done = cur == prev
      prev = cur
      edges = afterSmall
      iter += 1
    }

    // fixed point = stars rooted at each component's min: (u, root) rows
    // plus the roots themselves
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Component assignment for EVERY document: nodes in `pairs` get their
    * component min; untouched documents are their own singleton
    * component. The broadcast decision is LEFT TO AQE deliberately: when
    * near-dup membership is small the component table broadcasts and the
    * corpus never shuffles, but in web corpora dup membership routinely
    * reaches 30-80% of all documents — O(corpus)-sized, beyond any
    * broadcast limit — and a hard `broadcast()` hint would OOM the very
    * pipeline this operator exists for. At that scale a shuffled equi-join
    * on the id key is the correct (and only) plan. */
  def assignComponents(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
    docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
  }

  /** One survivor per component: the row with the highest `scoreCol`
    * (ties → smallest id — deterministic). Returns
    * (component, survivor id, n_docs, survivor score). The window
    * partitions by component, so the shuffle is one hash exchange on the
    * component key; with `assignComponents` output, non-dup documents
    * are singleton partitions (no skew beyond the largest dup cluster,
    * which the upstream pair generators already cap). */
  def survivors(assigned: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col("component"))
      .orderBy(col(scoreCol).desc, col(idCol))
    assigned
      .withColumn("rn", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("component"))))
      .filter(col("rn") === 1)
      .select(col("component"), col(idCol).as("survivor"),
        col("n_docs"), col(scoreCol).as("survivor_score"))
  }
}
