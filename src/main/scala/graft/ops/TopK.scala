package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Bounded top-k per group as a mergeable aggregate — the scale path for
 * every "rank ≤ k inside a group" query (SURVEY R18). The definitional
 * form, `row_number().over(Window.partitionBy(g).orderBy(...))`, must
 * shuffle and SORT every row of every group to keep the k survivors; at
 * 100 TB that is the dominant exchange of the whole query. This
 * aggregator keeps a k-bounded, sorted buffer per (partition, group) —
 * map-side partial aggregation discards non-contenders before the
 * shuffle, so the exchange carries at most k rows per group per map
 * partition and nothing is ever globally sorted. Same output, same
 * tie-breaks, a shuffle that scales with k·groups instead of rows
 * (the classic bounded-priority-queue aggregation — e.g. Spark's own
 * RDD takeOrdered / Algebird TopK monoid — surfaced as a DataFrame
 * aggregate with deterministic total order).
 *
 * Ordering is (score DESC, id ASC) — the exact order of the window
 * replay both the q91 oracle and TopKSpec pin, so ties are stable
 * across engines, partitionings, and merge orders.
 */
object TopK {

  /** One scored row: the aggregator's input/output element. */
  final case class Scored(score: Double, id: Long)

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  /** k-bounded merge of two (score desc, id asc)-sorted sequences. */
  private def mergeK(a: Seq[Scored], b: Seq[Scored], k: Int): Seq[Scored] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Scored]
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && ord.lteq(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  /** The bounded-buffer aggregator: reduce inserts only contenders
    * (constant-time reject once the buffer is full and the element sorts
    * below the current k-th), merge is a k-bounded sorted-merge —
    * associative and commutative, so Spark may combine partials in any
    * tree order. */
  def topKAggregator(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      override def zero: Seq[Scored] = Vector.empty
      override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
        if (buf.length >= k && ord.gteq(in, buf.last)) buf
        else mergeK(buf, Vector(in), k)
      override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = mergeK(a, b, k)
      override def finish(r: Seq[Scored]): Seq[Scored] = r
      override def bufferEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
    }
  }

  /** Top `k` rows per `groupCol` by (`scoreCol` DESC, `idCol` ASC), as
    * (groupCol, rank, idCol, scoreCol) with rank 1-based — identical to
    * the row_number window replay, computed with a k-bounded partial
    * aggregate instead of a full per-group sort. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(topKAggregator(k), Encoders.product[Scored])
    df.groupBy(col(groupCol))
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long")).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col(groupCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as(idCol),
        col("r.score").as(scoreCol))
  }
}
