package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SuffixArray against literal brute force: sort every suffix of the
  * sentinel-joined corpus by its bounded window (ties by position), and
  * recompute ExactSubstr spans by enumerating every L-gram. */
class SuffixArraySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (sa_rank, gpos) by definition: JVM String order on ASCII+u0001 is
    * codepoint order with shorter-prefix-first, same as the engine. */
  private def bruteSA(texts: Seq[(Long, String)], window: Int): Seq[(Long, Long)] = {
    val s = texts.sortBy(_._1).map(_._2 + "\u0001").mkString
    (0 until s.length)
      .map(p => (s.substring(p, math.min(s.length, p + window)), p))
      .sorted
      .zipWithIndex
      .map { case ((_, p), i) => (i.toLong, p.toLong) }
  }

  private def bruteSpans(texts: Seq[(Long, String)], len: Int): Set[(Long, Long, Long, String)] = {
    val grams = texts.flatMap { case (id, t) =>
      (0 to t.length - len).map(p => (t.substring(p, p + len), id, p)) }
    val counts = grams.groupBy(_._1).view.mapValues(_.size).toMap
    grams.filter(g => counts(g._1) > 1).groupBy(_._2).toSeq.flatMap {
      case (id, ps) =>
        val locs = ps.map(_._3).sorted
        val spans = locs.tail.foldLeft(List((locs.head, locs.head + len))) {
          case ((s0, e0) :: rest, p) =>
            if (p > e0) (p, p + len) :: (s0, e0) :: rest
            else (s0, p + len) :: rest
          case (Nil, p) => List((p, p + len))
        }
        val text = texts.find(_._1 == id).get._2
        spans.map { case (s0, e0) =>
          (id, s0.toLong, e0.toLong, text.substring(s0, e0)) }
    }.toSet
  }

  private val corpus = Seq(
    (1L, "abracadabra abracadabra shared passage here"),
    (2L, "totally different text with the shared passage here too"),
    (3L, "abracadabra abracadabra shared passage here"), // exact dup of 1
    (4L, "short"), // below L=16: never a span source
    (5L, "banana banana banana banana banana banana banana")) // self-repeat

  test("charTable: contiguous gpos in id order, one sentinel row per doc") {
    val docs = corpus.toDF("doc_id", "text")
    val chars = SuffixArray.charTable(docs, "doc_id", "text").orderBy("gpos")
      .as[(Long, Long)].collect()
    val n = corpus.map(_._2.length + 1).sum
    assert(chars.length == n)
    assert(chars.map(_._1).toSeq == (0L until n.toLong))
    assert(chars.count(_._2 == 1L) == corpus.size) // sentinels
    // doc 1's chars then its sentinel
    val t1 = corpus.head._2
    assert(chars.take(t1.length).map(_._2.toChar).mkString == t1)
    assert(chars(t1.length)._2 == 1L)
  }

  test("bounded suffix array equals literal sorted-suffixes (W=32)") {
    val docs = corpus.toDF("doc_id", "text")
    val got = SuffixArray.ofDocs(docs, "doc_id", "text", window = 32)
      .orderBy("sa_rank").as[(Long, Long)].collect().toSeq
    assert(got == bruteSA(corpus, 32))
  }

  test("suffix array is partitioning-invariant: same ranks at any nParts") {
    // denseRankPairs/rowNumberByPairPos derive offsets from per-partition
    // aggregates — the ranks must be a pure function of the corpus, not
    // of the partition count or the input's incoming partitioning
    val docs = corpus.toDF("doc_id", "text")
    def at(n: Int, df: org.apache.spark.sql.DataFrame) =
      SuffixArray.ofDocs(df, "doc_id", "text", window = 32, nParts = n)
        .orderBy("sa_rank").as[(Long, Long)].collect().toSeq
    val ref = at(1, docs)
    assert(at(5, docs) == ref)
    assert(at(8, docs.repartition(13)) == ref)
  }

  test("window ties break by position (W=4 on repetitive text)") {
    val texts = Seq((1L, "aaaaaaaaaa"), (2L, "aaaaa"))
    val docs = texts.toDF("doc_id", "text")
    val got = SuffixArray.ofDocs(docs, "doc_id", "text", window = 4)
      .orderBy("sa_rank").as[(Long, Long)].collect().toSeq
    assert(got == bruteSA(texts, 4))
  }

  test("duplicatedSpans matches brute force at L=16 (power of two)") {
    val docs = corpus.toDF("doc_id", "text")
    val got = SuffixArray.duplicatedSpans(docs, "doc_id", "text", minLen = 16)
      .as[(Long, Long, Long, String)].collect().toSet
    val want = bruteSpans(corpus, 16)
    assert(got == want)
    // the cross-doc shared passage and the self-repeat are both found
    assert(want.exists(s => s._1 == 2L && s._4.contains("shared passage here")))
    assert(want.exists(_._1 == 5L))
    assert(!want.exists(_._1 == 4L))
  }

  test("duplicatedSpans matches brute force at L=12 (overlapping k-window pair)") {
    val docs = corpus.toDF("doc_id", "text")
    val got = SuffixArray.duplicatedSpans(docs, "doc_id", "text", minLen = 12)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == bruteSpans(corpus, 12))
  }

  test("degenerate corpora: single char and empty text still rank densely") {
    // 1 doc, empty text -> corpus = one sentinel -> sa_rank 0 (not the
    // raw packed value: the pre-fix bug returned 1L << 56)
    val one = SuffixArray.ofDocs(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text", window = 32).as[(Long, Long)].collect().toSeq
    assert(one == Seq((0L, 0L)))
    val two = SuffixArray.ofDocs(Seq((1L, "z")).toDF("doc_id", "text"),
      "doc_id", "text", window = 32)
      .orderBy("sa_rank").as[(Long, Long)].collect().toSeq
    assert(two == bruteSA(Seq((1L, "z")), 32))
  }

  /** Adjacent-pair LCP by definition: common prefix of the two W-windows
    * (the W-truncation IS the cap; suffix exhaustion shortens a window). */
  private def bruteLcp(texts: Seq[(Long, String)], window: Int): Seq[(Long, Long, Long, Long)] = {
    val s = texts.sortBy(_._1).map(_._2 + "\u0001").mkString
    def win(p: Long) = s.substring(p.toInt, math.min(s.length, p.toInt + window))
    bruteSA(texts, window).sliding(2).collect {
      case Seq((r1, p1), (_, p2)) =>
        val l = win(p1).zip(win(p2)).takeWhile { case (x, y) => x == y }.size
        (r1, p1, p2, l.toLong)
    }.toSeq
  }

  test("adjacentLcp equals brute-force window LCP (W=32)") {
    val docs = corpus.toDF("doc_id", "text")
    val got = SuffixArray.adjacentLcp(docs, "doc_id", "text", window = 32)
      .orderBy("sa_rank").as[(Long, Long, Long, Long)].collect().toSeq
    val want = bruteLcp(corpus, 32)
    assert(got == want)
    // the shared passage really shows up as a long adjacent match
    assert(want.exists(_._4 >= 20))
    // the exact-dup docs 1/3 hit the W cap
    assert(want.exists(_._4 == 32L))
  }

  test("adjacentLcp at W=8 (single pack) and on repetitive tails") {
    val texts = Seq((1L, "aaaaaaaaaa"), (2L, "aaaaa"), (3L, "ab"))
    val docs = texts.toDF("doc_id", "text")
    for (w <- Seq(8, 16)) {
      val got = SuffixArray.adjacentLcp(docs, "doc_id", "text", window = w)
        .orderBy("sa_rank").as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == bruteLcp(texts, w), s"window $w")
    }
  }

  test("sentinel stops cross-boundary matches") {
    // doc 3 = doc1's tail + doc2's head; without a separator the
    // concatenation of 1 and 2 would fake a 16-gram match
    val texts = Seq(
      (1L, "zqxjkwvfyhzqxjkw"),
      (2L, "mplgbtdnrcmplgbt"),
      (3L, "jkwvfyhzmplgbtdn"))
    val docs = texts.toDF("doc_id", "text")
    val got = SuffixArray.duplicatedSpans(docs, "doc_id", "text", minLen = 16)
      .as[(Long, Long, Long, String)].collect()
    assert(got.isEmpty)
    assert(bruteSpans(texts, 16).isEmpty)
  }
}
