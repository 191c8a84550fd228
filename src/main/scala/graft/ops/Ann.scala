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

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): a hash folded to [-1, 1]. Pure column math — codegen'd, no UDF. */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table), lit(plane), dim), lit(2000001L)) - 1000000L).cast("double") / 1000000.0

  /** `planes`-bit sign signature of a vector under table `t`. */
  def signSignature(vec: Column, planes: Int, table: Int): Column = {
    val v = asDouble(vec)
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(table, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: bucket-join + exact rerank. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 6, tables: Int = 8): DataFrame = {
    def signed(df: DataFrame, idAs: String, vAs: String): DataFrame = {
      val base = df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vAs))
      base.select(col(idAs), col(vAs),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), signSignature(col(vAs), planes, t).as("sig"))): _*)).as("x"))
        .select(col(idAs), col(vAs), col("x.tbl"), col("x.sig"))
    }
    val q = signed(queries, "query_id", "qv")
    val c = signed(corpus, "neighbor_id", "nv")
    val cand = q.join(c, Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("nv"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
