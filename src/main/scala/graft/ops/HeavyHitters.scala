package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Distributed heavy-hitter detection: a mergeable Misra–Gries sketch
 * (Misra & Gries 1982, "Finding repeated elements", Sci. Comput.
 * Program. 2; mergeability per Agarwal, Cormode, Huang, Phillips, Wei &
 * Yi 2012, "Mergeable Summaries", PODS) feeding an exact second pass —
 * the standard two-pass exact-heavy-hitters layout.
 *
 * Why two passes: a single `groupBy(token).count()` shuffles one row
 * per DISTINCT token — at 100 TB the token universe (URLs, n-grams,
 * hosts) is itself data-scale. The MG sketch reduces the first pass to
 * O(k) state per partition: Spark's typed Aggregator gives map-side
 * partial aggregation, so the shuffle carries one k-entry sketch per
 * partition, merged treewise — communication O(partitions · k), never
 * O(distinct). The sketch's ONE-SIDED guarantee (estimate undercounts
 * by at most n/(k+1); any item with true count > n/(k+1) survives every
 * decrement and merge) means its key set is a SUPERSET of the true
 * heavy hitters, so the exact pass — counting ONLY the ≤ k candidate
 * keys via a broadcast-able semi-filter — returns exactly what a full
 * groupBy would: provably no false negatives, and the verify pass
 * removes the false positives. That exactness is what the q88 oracle
 * pins: a buggy sketch that ever drops a true heavy hitter diverges
 * from the brute-force SQL.
 *
 * Threshold discipline: callers pass the share denominator `q` (flag
 * tokens with count ≥ ceil(n/q), integer arithmetic — portable to the
 * oracle bit-for-bit, no float share). The sketch is sized k = 2q, so
 * n/(k+1) = n/(2q+1) < ceil(n/q) always — the guarantee covers the
 * threshold with margin at every n, with no runtime coupling between
 * data size and configuration.
 */
object HeavyHitters {

  /** Misra–Gries summary: at most k counters + the processed-element
    * count n (carrying n makes the final threshold ceil(n/q) computable
    * from the sketch alone — no extra count() job). */
  final case class MgSketch(k: Int, n: Long, counters: Map[String, Long]) {

    /** Observe one element: increment if tracked, insert if a slot is
      * free, else decrement ALL counters by 1 and drop zeros (the
      * classic MG step — paying one unit of undercount to every
      * tracked item instead of tracking the newcomer). */
    def add(tok: String): MgSketch = {
      val next = counters.get(tok) match {
        case Some(c) => counters.updated(tok, c + 1)
        case None if counters.size < k => counters.updated(tok, 1L)
        case None =>
          counters.iterator
            .map { case (t, c) => (t, c - 1) }
            .filter(_._2 > 0L)
            .toMap
      }
      MgSketch(k, n + 1, next)
    }

    /** Mergeable-summaries combine (Agarwal et al. 2012 §3): sum the
      * counters pointwise, then if more than k survive, subtract the
      * (k+1)-th largest count from every counter and drop non-positives
      * — the total undercount stays ≤ (n₁+n₂)/(k+1). */
    def merge(o: MgSketch): MgSketch = {
      require(k == o.k, s"cannot merge MG sketches of different k: $k vs ${o.k}")
      val summed = o.counters.foldLeft(counters) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      val pruned =
        if (summed.size <= k) summed
        else {
          // (k+1)-th largest count (values sorted descending)
          val cut = summed.valuesIterator.toArray.sortBy(-_).apply(k)
          summed.iterator
            .map { case (t, c) => (t, c - cut) }
            .filter(_._2 > 0L)
            .toMap
        }
      MgSketch(k, n + o.n, pruned)
    }
  }

  object MgSketch {
    def empty(k: Int): MgSketch = MgSketch(k, 0L, Map.empty)
  }

  /** The sketch as a typed Aggregator over a token column — map-side
    * partial aggregation builds one partition-local sketch, the shuffle
    * merges O(partitions) k-entry states. */
  def mgAggregator(k: Int): Aggregator[String, MgSketch, MgSketch] =
    new Aggregator[String, MgSketch, MgSketch] {
      override def zero: MgSketch = MgSketch.empty(k)
      override def reduce(b: MgSketch, tok: String): MgSketch = b.add(tok)
      override def merge(a: MgSketch, b: MgSketch): MgSketch = a.merge(b)
      override def finish(r: MgSketch): MgSketch = r
      override def bufferEncoder: Encoder[MgSketch] = Encoders.product[MgSketch]
      override def outputEncoder: Encoder[MgSketch] = Encoders.product[MgSketch]
    }

  /** Sketch the whole column into one merged MG summary (one job). */
  def sketch(tokens: DataFrame, tokenCol: String, k: Int): MgSketch = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(tokenCol).cast("string")).as[String]
      .select(mgAggregator(k).toColumn)
      .head()
  }

  /** Exact heavy hitters of `tokenCol`: every token whose exact count is
    * ≥ ceil(n/q), with its exact count — equal to brute-force
    * `GROUP BY HAVING count ≥ ceil(n/q)` by the MG superset guarantee.
    * Pass 1 sketches (k = 2q); pass 2 counts only the ≤ k candidate
    * keys (the candidate set is a literal `isin` filter — pushed into
    * the scan, and the surviving groupBy keys are ≤ k, so the exact
    * pass's shuffle is O(partitions · k) too). Output:
    * (token, cnt) ordered by (cnt desc, token). */
  def heavyHitters(tokens: DataFrame, tokenCol: String, q: Int): DataFrame = {
    require(q >= 1, s"share denominator must be >= 1, got $q")
    val mg = sketch(tokens, tokenCol, k = 2 * q)
    val threshold = (mg.n + q - 1) / q // ceil(n/q), integer-exact
    val candidates = mg.counters.keys.toSeq
    val spark = tokens.sparkSession
    if (candidates.isEmpty || mg.n == 0L) {
      import spark.implicits._
      spark.emptyDataset[(String, Long)].toDF("token", "cnt")
    } else {
      tokens.select(col(tokenCol).cast("string").as("token"))
        .filter(col("token").isin(candidates: _*))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= threshold)
        .orderBy(col("cnt").desc, col("token"))
    }
  }
}
