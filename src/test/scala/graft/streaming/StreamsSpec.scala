package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("windowed event counts: streaming result equals batch result") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val expected = Streams.windowedEventCounts(batch)
      .orderBy("window_start", "event_type").collect().toSeq

    // drive the same events through the streaming path (staged alone —
    // the sf dir mixes table schemas)
    val dir = SparkTestSession.tmpDir("events-stream")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val streaming = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val q = Streams.windowedEventCounts(streaming)
      .writeStream.outputMode("complete")
      .format("memory").queryName("winagg")
      .start()
    q.processAllAvailable()
    val got = spark.table("winagg").orderBy("window_start", "event_type").collect().toSeq
    q.stop()
    assert(got == expected)
  }

  test("streaming dedup: first-wins key set equals batch dropDuplicates") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val keys = Seq("user_id", "event_type")
    val expected = Streams.streamingDedup(batch, keys)
      .select("user_id", "event_type").as[(Long, String)].collect().toSet

    val dir = SparkTestSession.tmpDir("events-dedup")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val streaming = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val q = Streams.streamingDedup(streaming, keys)
      .writeStream.outputMode("append")
      .format("memory").queryName("streamdedup")
      .start()
    q.processAllAvailable()
    val got = spark.table("streamdedup")
      .select("user_id", "event_type").as[(Long, String)].collect().toSeq
    q.stop()
    // exactly one survivor per key, covering the same key set
    assert(got.size == got.toSet.size)
    assert(got.toSet == expected)
  }

  test("streaming incremental dedup: per-micro-batch gate equals the batch op, replay is exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dir = SparkTestSession.tmpDir("stream-incdedup")
    // two micro-batches: file-source with maxFilesPerTrigger=1 over two
    // staged files (even ids, then odd ids)
    docs.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in1")
    val f1 = new java.io.File(s"$dir/in1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    docs.filter($"doc_id" % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in2")
    val f2 = new java.io.File(s"$dir/in2").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    new java.io.File(s"$dir/in").mkdirs()
    java.nio.file.Files.copy(f1.toPath, java.nio.file.Paths.get(s"$dir/in/a.parquet"))

    val streaming = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = Streams.streamingIncrementalDedup(streaming, "doc_id", "text",
      s"$dir/index", s"$dir/out")
    q.processAllAvailable()
    java.nio.file.Files.copy(f2.toPath, java.nio.file.Paths.get(s"$dir/in/b.parquet"))
    q.processAllAvailable()
    q.stop()

    // expected: the batch op over the same two-batch split, fresh index
    val e1 = graft.ops.Dedup.dedupIncremental(spark,
      docs.filter($"doc_id" % 2 === 0), "doc_id", "text", s"$dir/index-ref")
      .select("doc_id").as[Long].collect().toSet
    val e2 = graft.ops.Dedup.dedupIncremental(spark,
      docs.filter($"doc_id" % 2 === 1), "doc_id", "text", s"$dir/index-ref")
      .select("doc_id").as[Long].collect().toSet
    val got = spark.read.parquet(s"$dir/out/batch_*")
      .select("doc_id").as[Long].collect().toSet
    assert(got == (e1 ++ e2))

    // replay-exact: re-running batch 2's data against the ADVANCED index
    // in replayStable mode reproduces its survivors (at-most-once mode
    // would return nothing)
    val replay = graft.ops.Dedup.dedupIncremental(spark,
      docs.filter($"doc_id" % 2 === 1), "doc_id", "text", s"$dir/index-ref",
      replayStable = true)
      .select("doc_id").as[Long].collect().toSet
    assert(replay == e2)
    // and a DIFFERENT doc with already-seen content still dies in the gate
    val probe = docs.filter($"doc_id" % 2 === 1).limit(1)
      .withColumn("doc_id", $"doc_id" + 1000000)
    assert(graft.ops.Dedup.dedupIncremental(spark, probe, "doc_id", "text",
      s"$dir/index-ref", replayStable = true).count() == 0)
  }

  test("streaming sessionization: event-time timeout flushes open sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // offset from epoch 0: a row at exactly the initial watermark (epoch)
    // is dropped as late data
    val ts = (m: Long) => new java.sql.Timestamp((1440 + m) * 60000L)
    val gap = 30 * 60000L
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.sessionizeStream(spark, in.toDS(), gap)
      .writeStream.outputMode("append").format("memory").queryName("sessflush").start()
    // batch 1: two events of one session for user 7
    in.addData(Streams.Event(1, ts(0), 7L, "click", 1.0),
      Streams.Event(2, ts(5), 7L, "view", 1.0))
    q.processAllAvailable()
    assert(spark.table("sessflush").count() == 0) // session still open
    // batch 2: a much later event for ANOTHER user advances the watermark
    // past user 7's gap window → 7's open session must flush via timeout
    in.addData(Streams.Event(3, ts(600), 8L, "click", 1.0))
    q.processAllAvailable()
    // one more empty-ish trigger so the timeout fires after watermark update
    in.addData(Streams.Event(4, ts(601), 8L, "view", 1.0))
    q.processAllAvailable()
    val flushed = spark.table("sessflush").as[Streams.Session].collect()
    q.stop()
    assert(flushed.exists(s => s.user_id == 7L && s.n_events == 2))
  }

  test("sessionization: closed + open sessions partition the event stream") {
    val ts = (m: Long) => new java.sql.Timestamp(m * 60000L)
    val events = spark.createDataset(Seq(
      Streams.Event(1, ts(0), 7L, "click", 1.0),
      Streams.Event(2, ts(5), 7L, "view", 1.0), // same session (gap 5m < 30m)
      Streams.Event(3, ts(120), 7L, "click", 1.0), // new session
      Streams.Event(4, ts(2), 8L, "view", 1.0))) // other user
    val gap = 30 * 60000L
    val closed = Streams.sessionize(spark, events, gap).collect()
    val open = Streams.openSessions(spark, events, gap).collect()
    // user 7: first session closed (2 events), second open (1 event)
    assert(closed.length == 1)
    assert(closed.head.user_id == 7L && closed.head.n_events == 2)
    val openByUser = open.map(s => s.user_id -> s.n_events).toMap
    assert(openByUser == Map(7L -> 1, 8L -> 1))
  }
}
