package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured-Streaming operators over the `events` stream shape
 * (event_id, ts, user_id, event_type, value, props).
 *
 * The reference itself is batch-with-cursor (SURVEY.md §1.3 — the wave
 * loop covers its incremental semantics), so these are the engine's
 * *additional* streaming capabilities: watermarked windowed aggregation
 * and stateful sessionization, the standard continuous-ingest path a
 * production crawl feeds (fetch events → metrics / sessions).
 */
object Streams {

  /** Tumbling-window event aggregation with late-data watermark. Works on
    * both a streaming and a batch DataFrame (identical semantics — tested
    * batch-vs-stream). */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    // parquet timestamps may load as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    val tz = events.withColumn("ts", col("ts").cast("timestamp"))
    val src = if (tz.isStreaming) tz.withWatermark("ts", watermark) else tz
    src
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming exact dedup on a key column: first occurrence wins, with a
    * watermark bounding the dedup state (the streaming twin of the batch
    * q12/q22 paths — at 100 TB-ingest the watermark is what keeps the
    * state store from growing without bound). Batch DataFrames get plain
    * dropDuplicates — identical first-wins semantics, tested batch≡stream. */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame = {
    val tz = events.withColumn("ts", col("ts").cast("timestamp"))
    if (tz.isStreaming)
      tz.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keyCols)
    else tz.dropDuplicates(keyCols)
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  /** Stateful sessionization via flatMapGroupsWithState: a session closes
    * after `gapMs` of inactivity (processing-time timeout in streaming;
    * in tests driven by processAllAvailable + final timeout flush). */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // batch-friendly sessionizer: scan this trigger's rows in ts order,
          // closing sessions at gaps; keep the trailing open session in state
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer[Session]()
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                closed += Session(userId, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** True streaming sessionization: event-time timeout + watermark, so an
    * open session actually CLOSES once the watermark passes its gap window
    * (round-1 used NoTimeout and open sessions never flushed in a stream).
    * The state timeout is re-armed at (last event time + gapMs); when it
    * fires, the open session is emitted and the state removed. */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event], gapMs: Long,
      watermark: String = "1 minute"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += Session(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Flush helper for tests/batch: emit the still-open sessions from the
    * same event set (a streaming deployment gets these via state timeout). */
  def openSessions(spark: SparkSession, events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, rows) =>
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur: Option[SessionState] = None
      for (e <- sorted) {
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t - s.last <= gapMs => Some(s.copy(last = t, n = s.n + 1))
          case _ => Some(SessionState(t, t, 1))
        }
      }
      cur.map(s => Session(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.last), s.n)).iterator
    }
  }

  /** Continuous-ingest twin of [[graft.ops.Dedup.dedupIncremental]]: each
    * micro-batch of documents is gated against the persisted cross-batch
    * content-hash index inside `foreachBatch`, and the batch's survivors
    * land in `outDir/batch_<id>` as parquet.
    *
    * Exactly-once: Structured Streaming replays an uncommitted micro-batch
    * with the same batchId after a crash; the gate runs REPLAY-STABLE
    * (a row already indexed with itself as witness survives again), so the
    * replay regenerates the identical survivor set and the
    * mode("overwrite") of the batch-id-keyed dir makes the rewrite a
    * no-op — the standard idempotent-foreachBatch layout, here backed by
    * the index's own witness column instead of an external transaction
    * log. Survivors are written BEFORE the index advances (write-ahead,
    * via dedupIncremental's persistSurvivors hook).
    *
    * Scale shape is the batch op's: bucket-pruned index probe, (hash, id)
    * shuffles only, periodic index compaction. */
  def streamingIncrementalDedup(docs: DataFrame, idCol: String, textCol: String,
      indexRoot: String, outDir: String,
      contentHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        org.apache.spark.sql.functions.xxhash64(_))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(docs.isStreaming, "streamingIncrementalDedup needs a streaming DataFrame")
    docs.writeStream
      .outputMode(OutputMode.Update()) // pass-through; foreachBatch sees raw rows
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Dedup.dedupIncremental(
          batch.sparkSession, batch, idCol, textCol, indexRoot, contentHash,
          persistSurvivors = s => s.write.mode("overwrite")
            .parquet(s"$outDir/batch_$batchId"),
          replayStable = true): Unit
      }
      .start()
  }
}
