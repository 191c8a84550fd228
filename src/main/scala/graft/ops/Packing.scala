package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence-packing layout (training-data op): the "concatenate the corpus,
 * then cut fixed-length windows" batching layout LLM training uses
 * (GPT-style packing — documents are laid end-to-end in a deterministic
 * order and the token stream is sliced into `seqLen`-token training
 * sequences; a document may straddle a slice boundary). The op computes
 * each document's interval in that stream and the sequences it spans —
 * the metadata a data loader needs to materialize packed batches without
 * ever re-scanning text.
 *
 * Output per doc: (id, n_tokens, start_tok, end_tok, first_seq, last_seq,
 * n_seqs) with end_tok exclusive and seq indices 0-based.
 *
 * Scale shape: this is a corpus-wide prefix sum over a total order — the
 * one genuinely order-coupled op in the pipeline. It runs as the textbook
 * two-level distributed scan:
 *   1. (id, n_tokens) rows — tokens counted by the codegen'd counter at
 *      the scan; TEXT never leaves the scan projection — are
 *      range-partitioned by the order key (one range exchange of 16-byte
 *      rows);
 *   2. per-partition token totals (one row per partition) come to the
 *      driver and turn into a broadcast offset map;
 *   3. each partition computes its local running sum + its offset — a
 *      partition-local window, no further exchange.
 * A global `Window.orderBy` (no partition) would instead drag the whole
 * corpus through ONE task — the plan this op exists to avoid.
 */
object Packing {

  /** Doc-count gate for the driver prefix-sum fast path: (id, n_tokens)
    * pairs are 16 bytes, so 2^20 docs is ~16 MB of driver rows — the
    * same bounded-driver-plane posture as Cluster's union-find gate. At
    * corpus scale the gate never fires and the two-level distributed
    * scan below is the path. */
  private val MaxDriverDocs = 1 << 20

  /** `ord` must be a total order on rows (ties break nothing — equal keys
    * get an arbitrary but range-contiguous placement); default orders by
    * the id column. */
  def layout(docs: DataFrame, idCol: String, textCol: String, seqLen: Long,
      nParts: Int = 32, tokenCount: Column => Column = TextStats.tokenCount,
      maxDriverDocs: Int = MaxDriverDocs): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // SIZE-GATED driver fast path: the layout's output is one SMALL
    // fixed-width row per document (the text dies at the scan either
    // way), so when the doc plane fits the driver comfortably AND the
    // id is integral (driver sort order == Spark's), one limit-collect
    // + an in-memory prefix sum replaces the range-sample job, the
    // checkpoint materialization and the per-partition-totals collect —
    // three driver barriers per call on a path q57/q85/q87/q95 all
    // take. Over the gate (or a non-integral id) nothing changes.
    val integralId = docs.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    // n_tokens keeps the tokenCount expression's OWN type (charTable
    // passes length+1 = int): the output schema must not change with
    // corpus size, so the gate also requires an integral count type and
    // the fast path re-emits the collected value and field verbatim
    lazy val proj = docs
      .select(col(idCol), tokenCount(col(textCol)).as("n_tokens"))
    lazy val integralCount = proj.schema("n_tokens").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    if (integralId && maxDriverDocs > 0 && integralCount) {
      val head = proj.limit(maxDriverDocs + 1).collect()
      // null ids/token counts take the distributed path (its null
      // propagation semantics are not worth re-implementing here)
      if (head.length <= maxDriverDocs &&
          !head.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
        val spark = docs.sparkSession
        val sorted = head.sortBy(r => r.getAs[Number](0).longValue())
        val out = new Array[org.apache.spark.sql.Row](sorted.length)
        var start = 0L
        var i = 0
        while (i < sorted.length) {
          val r = sorted(i)
          val n = r.getAs[Number](1).longValue()
          val end = start + n
          val firstSeq = start / seqLen
          // Scala Long division truncates toward zero — the same as SQL
          // DIV, so the n = 0, start % seqLen == 0 corner ((end-1) DIV
          // seqLen) matches the distributed expression exactly
          val lastSeq = (end - 1) / seqLen
          out(i) = org.apache.spark.sql.Row(
            r.get(0), r.get(1), start, end, firstSeq, lastSeq, lastSeq - firstSeq + 1L)
          start = end
          i += 1
        }
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          proj.schema(idCol),
          proj.schema("n_tokens"),
          StructField("start_tok", LongType, nullable = false),
          StructField("end_tok", LongType, nullable = false),
          StructField("first_seq", LongType, nullable = false),
          StructField("last_seq", LongType, nullable = false),
          StructField("n_seqs", LongType, nullable = false)))
        return spark.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(out: _*)), schema)
      }
      // over the gate: fall through to the distributed scan (the probe
      // cost one bounded collect; corpus-scale callers pay it once)
    }
    // 1. slim to (id, n_tokens), range-partition by the order key.
    // localCheckpoint (eager), NOT cache: the offsets below are computed
    // from ONE materialization of this range shuffle, and the returned
    // (lazy) frame must read the very same partitioning — a cache could
    // be evicted (or unpersisted before the caller executes) and the
    // re-run RangePartitioner may sample different bounds, silently
    // pairing local sums with offsets from a different partitioning.
    val slim = docs
      .select(col(idCol), tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(nParts, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // 2. per-partition totals -> driver (nParts rows) -> offset literal
    // range partitioner numbers partitions in key order: pid order IS
    // the global order
    val partials = slim.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("s"))
      .collect()
      .sortBy(_.getAs[Int]("__pid"))
    // empty corpus: map() would be map<string,string> and poison the
    // arithmetic types downstream; any typed single-entry map works
    // because no row will look anything up
    val offsetMap =
      if (partials.isEmpty) map(lit(0), lit(0L))
      else map(partials.map(_.getAs[Int]("__pid"))
        .zip(partials.scanLeft(0L)(_ + _.getAs[Long]("s")).init)
        .flatMap { case (pid, off) => Seq(lit(pid), lit(off)) }: _*)
    // 3. partition-local running sum + broadcast offset
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    slim
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) +
          element_at(offsetMap, col("__pid")))
      .withColumn("end_tok", col("start_tok") + col("n_tokens"))
      .withColumn("first_seq", expr(s"start_tok DIV $seqLen"))
      .withColumn("last_seq", expr(s"(end_tok - 1) DIV $seqLen"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
      .drop("__pid")
  }

  /** Interleaved multimodal packing layout (the Flamingo/MM1-style batch
    * layout for image-text training): the same concat-then-chunk layout
    * over an interleaved span table — columns (idCol, kind, text) per the
    * input_hint shape — where each media span costs a FIXED `mediaTokens`
    * budget (the vision encoder emits a constant patch-token count per
    * image) and each text span costs its word count.
    *
    * Per-document costs collapse map-side out of the span table (one
    * combinable groupBy of (id, long) rows — span text dies at its scan),
    * then ride [[layout]]'s two-level distributed scan unchanged: the
    * cost table IS the (id, n_tokens) input, tokenCount = identity. */
  def interleavedLayout(spans: DataFrame, idCol: String, seqLen: Long,
      mediaTokens: Long, nParts: Int = 32,
      tokenCount: Column => Column = TextStats.tokenCount): DataFrame = {
    require(mediaTokens >= 0, "mediaTokens must be non-negative")
    val costs = spans
      .select(col(idCol),
        when(col("kind") === "media", lit(mediaTokens))
          .otherwise(tokenCount(col("text"))).as("c"))
      .groupBy(col(idCol)).agg(sum(col("c")).as("cost"))
    layout(costs, idCol, "cost", seqLen, nParts, identity)
  }

  /** Per-document overlapping chunk intervals — the RAG/embedding prep
    * shape next to [[layout]]'s corpus-wide packing: each document is
    * cut into windows of `chunkTokens` advancing by `strideTokens`
    * (overlap = chunk − stride), with full coverage and no chunk past
    * the text. A document with `n ≤ chunkTokens` yields exactly one
    * chunk (0, n); a null text yields none (an empty string still counts
    * one empty token under [[TextStats.tokenCount]]'s whitespace-split
    * definition, so it chunks as n = 1). The last chunk starts
    * at `ceil((n − chunk)/stride)·stride` — the first window whose end
    * reaches `n` — so tails are covered without emitting windows that
    * add no new tokens.
    *
    * Scale shape: pure row-local arithmetic — one codegen'd `sequence` +
    * `posexplode` per doc, no exchange at all; output is O(total
    * chunks) fixed-width rows. Token counting shares [[TextStats
    * .tokenCount]]'s definition so chunk indices line up with every
    * other token-counting op. */
  def chunkIntervals(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Long, strideTokens: Long,
      tokenCount: Column => Column = TextStats.tokenCount): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens=$chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"strideTokens=$strideTokens must be in [1, chunkTokens]")
    val n = tokenCount(col(textCol))
    val kMax = ceil(greatest(n - chunkTokens, lit(0L)) / strideTokens.toDouble)
      .cast("long")
    docs
      .select(col(idCol), n.as("__n"), kMax.as("__k"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__n"),
        posexplode(sequence(lit(0L), col("__k"))).as(Seq("chunk_idx", "__kk")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("__kk") * strideTokens).as("start_tok"),
        least(col("__kk") * strideTokens + chunkTokens, col("__n")).as("end_tok"))
  }
}
