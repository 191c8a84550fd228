package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization for embedding compression + asymmetric-distance
 * search (Jégou, Douze & Schmid 2011, "Product Quantization for Nearest
 * Neighbor Search", IEEE TPAMI 33(1) — the FAISS `PQ{m}x{nbits}` codec).
 *
 * Why this matters at 100 TB: a corpus of float32 embeddings is
 * 4·D bytes/vector; PQ stores m sub-codes (one byte each at ksub ≤ 256)
 * — a 32× compression at D=64, m=8 — so the *entire* code table of a
 * 10^10-vector corpus fits in cluster memory while the raw vectors
 * stay in cold parquet. Search never touches raw neighbor vectors:
 * the asymmetric distance (ADC) between a query and a code is a sum of
 * m table lookups into per-query subspace distance tables.
 *
 * Spark-first shapes (mirrors [[Ann]]'s IVF layout):
 *  - the codebook is O(ksub·D) doubles — driver-resident, embedded as a
 *    LITERAL `array<array<array<double>>>` column (sub-major), so both
 *    [[encode]] and the ADC scoring are pure per-row expressions: no
 *    join, no Exchange in the subplan (the [[Ann.ivfAssign]] pattern);
 *  - codebook training is the per-subspace Lloyd loop of
 *    [[Ann.ivfCentroidSeq]]: assignment is the zero-shuffle argmin map,
 *    mean updates aggregate per (sub, code, dim) with map-side partial
 *    aggregation — vectors never shuffle;
 *  - all floating-point folds are index-ordered left folds, bit-identical
 *    to DuckDB's `list_reduce`, so the q89 oracle replays every distance
 *    — and therefore every code and every rank — exactly, with no
 *    tolerance. The hot path runs native codegen'd kernels
 *    ([[graft.functions.PqImpl]]); the definitional zip_with + aggregate
 *    forms remain as [[encodeHof]]/[[adcDistHof]], and PqSpec pins
 *    native ≡ HOF at doubleToLongBits granularity.
 *
 * Determinism: seeds are the `ksub` corpus rows with the smallest
 * `hash(id)` (hash pluggable like [[BloomDedup]]: production xxhash64,
 * oracle the portable polynomial hash), ordered by (hash, id); ties and
 * argmins always break toward the lower code.
 */
object Pq {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Index-ordered squared L2 distance between two array<double> columns:
    * left fold of (x-y)² from index 0 — the exact add order DuckDB's
    * `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b),...)))`
    * performs, so distances are bit-identical cross-engine. */
  private[graft] def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** One trained codebook: `cb(s)(c)` = centroid (length D/m) of code `c`
    * in subspace `s`. Driver-resident by design (ksub·D doubles). */
  final case class Codebook(m: Int, ksub: Int, dim: Int, cb: Seq[Seq[Seq[Double]]]) {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    def dsub: Int = dim / m
    /** The codebook as one literal column (sub-major, code inner) — the
      * broadcast-as-expression that keeps encode/ADC join-free. */
    private[graft] def literal: Column =
      typedLit(cb.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)
    /** The codebook as the nested primitive array the native kernels
      * ([[graft.functions.PqImpl]]) embed via the codegen reference
      * table. */
    private[graft] def nativeArray: Array[Array[Array[Double]]] =
      cb.map(_.map(_.toArray).toArray).toArray
  }

  /** Train a PQ codebook: deterministic hash-random seeds (the `ksub`
    * corpus rows with the smallest `hash(id)`, each sliced into its m
    * subvectors) refined by `iters` per-subspace Lloyd passes.
    *
    * Every pass is ONE Spark job: the assignment argmin is a pure map
    * over the codebook literal (no Exchange), the mean update aggregates
    * (sub, code, dim) cells — partial aggregation collapses map-side to
    * O(m·ksub·dsub) rows per partition. A code that loses all members
    * keeps its previous centroid (standard empty-cell fallback). */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 0,
      hash: Column => Column = c => xxhash64(c)): Codebook = {
    val v = asDouble(col(vecCol))
    val seedRows = corpus
      .select(col(idCol).as("sid"), v.as("sv"))
      .withColumn("hk", hash(col("sid").cast("string")))
      .orderBy(col("hk"), col("sid"))
      .limit(ksub)
      .select(col("sv"))
      .collect()
    require(seedRows.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = seedRows.head.getSeq[Double](0).length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    var cb: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      seedRows.toSeq.map(_.getSeq[Double](0).slice(s * dsub, (s + 1) * dsub))
    }
    if (iters > 0) {
      val book = Codebook(m, seedRows.length, dim, cb)
      // loop-invariant: the vectors are re-read every pass
      val vecs = corpus.select(col(idCol).as("vid"), v.as("dv")).cache()
      var it = 0
      var cur = book
      while (it < iters) {
        val means = encode(vecs, "vid", "dv", cur)
          .join(vecs, Seq("vid"))
          .select(posexplode(col("codes")).as(Seq("s", "code")), col("dv"))
          .select(col("s"), col("code"),
            posexplode(slice(col("dv"), col("s") * dsub + 1, lit(dsub))).as(Seq("dim", "x")))
          .groupBy(col("s"), col("code"), col("dim"))
          .agg(avg(col("x")).as("mu"))
          .groupBy(col("s"), col("code"))
          .agg(transform(sort_array(collect_list(struct(col("dim"), col("mu")))),
            e => e.getField("mu")).as("mv"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
        cur = Codebook(m, cur.ksub, dim, cur.cb.zipWithIndex.map { case (codes, s) =>
          codes.zipWithIndex.map { case (old, c) => means.getOrElse((s, c), old) }
        })
        it += 1
      }
      vecs.unpersist(blocking = false)
      cur
    } else Codebook(m, seedRows.length, dim, cb)
  }

  /** Encode every vector into its m sub-codes — a pure map running the
    * native codegen'd argmin kernel ([[graft.functions.PqImpl.encode]];
    * per subspace: argmin_{code} ‖v_sub − cb[s][code]‖², ties to the
    * lower code), bit-identical to [[encodeHof]] (pinned in PqSpec).
    * Output: (idCol, codes array<int>) — the m-byte row that replaces
    * the 4·D-byte vector downstream. */
  def encode(df: DataFrame, idCol: String, vecCol: String, book: Codebook): DataFrame =
    df.select(col(idCol),
      graft.functions.PqFns.pqEncode(asDouble(col(vecCol)), book.nativeArray).as("codes"))

  /** The higher-order-function twin of [[encode]] — the definitional
    * form the native kernel must match fold-for-fold. Kept (not dead
    * code) as the equivalence witness PqSpec executes. */
  private[graft] def encodeHof(df: DataFrame, idCol: String, vecCol: String,
      book: Codebook): DataFrame = {
    val cbl = book.literal
    val dsub = book.dsub
    df.select(col(idCol), asDouble(col(vecCol)).as("dv"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(book.m - 1)), s => {
          val sub = slice(col("dv"), s * dsub + 1, lit(dsub))
          array_min(zip_with(element_at(cbl, s + 1),
            sequence(lit(0), lit(book.ksub - 1)),
            (cv, code) => struct(sqDist(sub, cv).as("d2"), code.as("code"))))
            .getField("code")
        }).as("codes"))
  }

  /** Reconstruct the quantized vector of a code row (concatenated
    * subspace centroids) — the decoder side of the codec, used by the
    * lossless-roundtrip property test. */
  def decode(codes: DataFrame, book: Codebook): DataFrame = {
    val cbl = book.literal
    codes.withColumn("decoded",
      flatten(zip_with(col("codes"), sequence(lit(0), lit(book.m - 1)),
        (code, s) => element_at(element_at(cbl, s + 1), code + 1))))
  }

  /** Asymmetric-distance top-k: exact query subvectors against quantized
    * neighbors. dist²(q, code) = Σ_s ‖q_sub(s) − cb[s][code_s]‖², folded
    * in subspace order (bit-identical to the oracle's ordered list fold).
    *
    * The scan side carries ONLY (id, m codes) — never neighbor vectors;
    * the per-pair cost is m·dsub = D multiply-adds against the literal
    * (the expression form of FAISS's per-query LUT: Catalyst evaluates
    * the same subspace lookups without materializing the table). At
    * corpus scale this composes with [[Ann.ivfTopK]]'s inverted lists
    * (IVF-PQ): probe clusters first, ADC-scan only their code lists. */
  def adcTopK(queries: DataFrame, codes: DataFrame, idCol: String, vecCol: String,
      book: Codebook, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = codes.select(col(idCol).as("neighbor_id"), col("codes"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist2"), col("neighbor_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist2", adcDist(col("qv"), col("codes"), book))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dist2"))
  }

  /** The ADC distance expression: Σ_s ‖q_sub(s) − cb[s][code_s]‖², folded
    * in subspace order — the native codegen'd kernel
    * ([[graft.functions.PqImpl.adcDist]]), bit-identical to
    * [[adcDistHof]] (pinned in PqSpec). Shared by [[adcTopK]] and
    * [[ivfPqTopK]] so the two search paths cannot drift. */
  private def adcDist(qv: Column, codes: Column, book: Codebook): Column =
    graft.functions.PqFns.pqAdcDist(qv, codes, book.nativeArray)

  /** The higher-order-function twin of [[adcDist]] — the definitional
    * fold the native kernel must match; PqSpec executes both over the
    * same pairs and asserts raw-double equality. */
  private[graft] def adcDistHof(qv: Column, codes: Column, book: Codebook): Column = {
    val cbl = book.literal
    val dsub = book.dsub
    aggregate(sequence(lit(0), lit(book.m - 1)), lit(0.0), (acc, s) =>
      acc + sqDist(
        slice(qv, s * dsub + 1, lit(dsub)),
        element_at(element_at(cbl, s + 1), element_at(codes, s + 1) + 1)))
  }

  /** IVF-PQ: the composition that actually runs at corpus scale (FAISS
    * `IVF{nlist},PQ{m}` with by_residual=false — codes quantize the raw
    * vectors, so the same codebook serves every list and the flat-ADC
    * oracle): [[Ann]]'s coarse quantizer routes each query to its
    * `nprobe` nearest inverted lists, and ADC scans ONLY those lists'
    * code rows.
    *
    * Plan shape: the corpus-scale side is (neighbor_id, cluster, m codes)
    * — assignment and encoding are both zero-shuffle literal argmins, so
    * raw neighbor vectors never leave their scan; the probe join is an
    * equi-join on `cluster` whose query side is nprobe rows per query.
    * Per-query cost O(N·nprobe/nlist) code scans instead of O(N), on top
    * of PQ's 32× memory reduction — at nprobe = nlist this degrades to
    * exactly [[adcTopK]] (the q90 property oracle). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      book: Codebook, k: Int, nlist: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 0): DataFrame = {
    val cents = Ann.centroidLiteral(
      Ann.ivfCentroids(corpus, idCol, vecCol, nlist, kmeansIters))
    val lists = Ann.ivfAssign(corpus, idCol, vecCol, cents, keep = 1)
      .select(col(idCol), col("cluster"))
      .join(encode(corpus, idCol, vecCol, book), Seq(idCol))
      .withColumnRenamed(idCol, "neighbor_id")
    val probes = Ann.ivfAssign(queries, idCol, vecCol, cents, keep = nprobe)
      .select(col(idCol).as("query_id"), col("cluster"), col("dv").as("qv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist2"), col("neighbor_id"))
    probes.join(lists, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist2", adcDist(col("qv"), col("codes"), book))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dist2"))
  }
}
