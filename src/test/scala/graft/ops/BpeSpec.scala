package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def syms(words: (String, Long)*) =
    words.toSeq.toDF("word", "cnt")
      .select(col("word"), col("cnt"), Bpe.symbolize(col("word")).as("s"))

  test("symbolize/symbols roundtrip; applyMerge is greedy left-to-right") {
    val w = Seq(("abab", 1L), ("xxx", 1L), ("abb", 1L), ("a", 1L)).toDF("word", "cnt")
      .select(col("word"), Bpe.symbols(Bpe.symbolize(col("word"))).as("t"))
      .as[(String, Seq[String])].collect().toMap
    assert(w("abab") == Seq("a", "b", "a", "b") && w("a") == Seq("a"))
    def merged(word: String, l: String, r: String): Seq[String] =
      Seq(word).toDF("word")
        .select(Bpe.symbols(
          Bpe.applyMerge(Bpe.symbolize(col("word")), l, r)).as[Seq[String]])
        .head()
    assert(merged("abab", "a", "b") == Seq("ab", "ab")) // both pairs, no overlap loss
    assert(merged("xxx", "x", "x") == Seq("xx", "x"))   // greedy L-to-R, non-overlapping
    assert(merged("abb", "a", "b") == Seq("ab", "b"))   // merged token doesn't re-merge
    assert(merged("bab", "a", "b") == Seq("b", "ab"))
  }

  test("train: Sennrich-style hand-computed merges incl. tie-breaks") {
    // {low:5, lower:2, newest:6, widest:3}, no end-of-word marker:
    //  pair counts -> es=9 st=9 (tie: l asc -> (e,s)), then (es,t)=9,
    //  then lo=7 ow=7 (tie -> (l,o)), then (lo,w)=7.
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val (merges, trained) = Bpe.train(wc, 4)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
    val seg = Bpe.segmentation(trained)
      .as[(String, Seq[String])].collect().toMap
    assert(seg == Map(
      "low" -> Seq("low"),
      "lower" -> Seq("low", "e", "r"),
      "newest" -> Seq("n", "e", "w", "est"),
      "widest" -> Seq("w", "i", "d", "est")))
  }

  test("train: partition-invariant; early stop when no pairs remain") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val (m1, _) = Bpe.train(wc, 3)
    val (m7, _) = Bpe.train(wc.repartition(7), 3)
    assert(m1 == m7)
    // single-char vocab: zero pairs -> zero merges, no crash
    val (m0, t0) = Bpe.train(Seq(("a", 3L), ("b", 1L)).toDF("word", "cnt"), 5)
    assert(m0.isEmpty)
    assert(Bpe.segmentation(t0).as[(String, Seq[String])].collect().toMap ==
      Map("a" -> Seq("a"), "b" -> Seq("b")))
  }

  test("wordCounts: whitespace tokens, empties and SEP-words dropped") {
    val docs = Seq((1L, "  low low  newest "), (2L, "low\tx" + Bpe.Sep + "y"))
      .toDF("id", "text")
    val wc = Bpe.wordCounts(docs, "text").as[(String, Long)].collect().toMap
    assert(wc == Map("low" -> 3L, "newest" -> 1L))
  }

  test("encode: trained words by broadcast join, OOV falls back to chars, order kept") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val (_, trained) = Bpe.train(wc, 4)
    val docs = Seq((1L, "lower zap low")).toDF("id", "text")
    val enc = Bpe.encode(docs, "id", "text", Bpe.segmentation(trained))
      .orderBy(col("word_pos"), col("sub_pos"))
      .select(col("token").as[String]).collect().toSeq
    assert(enc == Seq("low", "e", "r", "z", "a", "p", "low"))
    val counts = Bpe.tokenCounts(
      Seq((9L, "low lower newest widest")).toDF("id", "text"), docs,
      "id", "text", 4).as[(Long, Long)].collect().toMap
    // same text but trained on single-occurrence words: merges differ from
    // the weighted corpus; just pin the fallback-containing count shape
    assert(counts(1L) > 0)
  }

  test("train at vocab scale: 2000 merges on a 50k-word plane, no per-merge jobs") {
    // Deterministic pseudo-corpus plane: 50k distinct words, Zipf-ish
    // counts — the shape of a frequency-floored open-web word plane.
    val plane = (0 until 50000).map { i =>
      val rnd = new scala.util.Random(i * 2654435761L)
      val len = 3 + rnd.nextInt(9)
      val base = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      // distinct-ify with a letter suffix so the (word, cnt) plane is keyed
      val suffix = java.lang.Long.toString(i.toLong, 26).map(c =>
        if (c.isDigit) ('q' + (c - '0')).toChar else c)
      (base + suffix, 1L + 500000L / (i + 1))
    }.toDF("word", "cnt")
    plane.cache().count()

    // Count Spark jobs scheduled by train: must be the one plane collect,
    // INDEPENDENT of numMerges (the r4 shape was ~2 jobs per merge).
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def countJobs(nMerges: Int): (Int, Long, Int) = {
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      val t0 = System.nanoTime()
      val (m, _) = Bpe.train(plane, nMerges)
      val ms = (System.nanoTime() - t0) / 1000000L
      Thread.sleep(1500) // listener bus is async; drain before reading
      spark.sparkContext.removeSparkListener(listener)
      (jobs.get(), ms, m.size)
    }
    val (jobsSmall, _, mSmall) = countJobs(50)
    val (jobsBig, msBig, mBig) = countJobs(2000)
    assert(mSmall == 50 && mBig == 2000)
    assert(jobsBig == jobsSmall, // zero marginal jobs for 40x the merges
      s"jobs must not scale with numMerges: $jobsSmall @50 vs $jobsBig @2000")
    assert(jobsBig <= 2, s"train must cost at most the plane collect, got $jobsBig")
    info(s"2000 merges over 50k words: ${msBig} ms, $jobsBig Spark job(s)")
    assert(msBig < 10000, s"2000 merges took ${msBig} ms")
  }

  test("train: minCount floors the collected plane; floored words encode as OOV") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("rare", 1L)).toDF("word", "cnt")
    val (m1, trained) = Bpe.train(wc, 4, minCount = 2L)
    val (m2, _) = Bpe.train(wc.filter(col("cnt") >= 2), 4)
    assert(m1 == m2) // floor == prefilter
    val seg = Bpe.segmentation(trained).as[(String, Seq[String])].collect().toMap
    assert(!seg.contains("rare")) // floored out of the plane entirely
    val enc = Bpe.encode(Seq((1L, "rare")).toDF("id", "text"), "id", "text",
        Bpe.segmentation(trained))
      .orderBy(col("sub_pos")).select(col("token").as[String]).collect().toSeq
    assert(enc == Seq("r", "a", "r", "e")) // char fallback
  }

  test("vocab: dense lexicographic token ids over the trained plane") {
    val (_, trained) = Bpe.train(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
        .toDF("word", "cnt"), 4)
    val v = Bpe.vocab(trained).as[(String, Int)].collect().toMap
    val toks = Seq("low", "e", "r", "n", "w", "est", "i", "d").distinct.sorted
    assert(v == toks.zipWithIndex.toMap)
  }
}
