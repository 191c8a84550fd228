package graft.ops

import graft.SparkTestSession
import graft.model.SpanKind
import org.scalatest.funsuite.AnyFunSuite

class MainContentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (doc_id, offset, kind, text) — blockSize=4 below, so block = offset/4.
  private def run(rows: Seq[(String, Long, String, String)]) =
    MainContent.extract(
      rows.toDF("doc_id", "offset", "kind", "text"),
      blockSize = 4, maxLinkPct = 35, minGoodChars = 20, minStopPct = 8,
      stopwords = Seq("the", "a"))
      .as[(String, String, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("verdicts: link-dense nav is bad, prose is good, shorts promote only next to good") {
    val d1 = Seq(
      // block 0: pure nav — 100% link chars -> bad
      ("d1", 0L, SpanKind.Link, "Home"),
      ("d1", 1L, SpanKind.Link, "About"),
      ("d1", 2L, SpanKind.Link, "Contact"),
      // block 1: prose — 24 chars, 1/4 stopwords (25% >= 8%) -> good
      ("d1", 4L, SpanKind.Text, "the"),
      ("d1", 5L, SpanKind.Text, "quick"),
      ("d1", 6L, SpanKind.Text, "brownish"),
      ("d1", 7L, SpanKind.Text, "foxhound"),
      // block 2: short, adjacent to good block 1 -> promoted
      ("d1", 8L, SpanKind.Text, "hi"),
      // block 3: short, neighbors are {short} -> bad
      ("d1", 12L, SpanKind.Text, "yo"))
    val out = run(d1)("d1")
    assert(out._2 == "the quick brownish foxhound hi")
    assert((out._3, out._4, out._5, out._6) == ((4L, 1L, 1L, 2L)))
  }

  test("mixed block over the link-density threshold is bad; all-chrome doc yields empty content") {
    val d2 = Seq(
      // block 0: 2 text chars vs 8 link chars -> 100*8 > 35*10 -> bad
      ("d2", 0L, SpanKind.Text, "ab"),
      ("d2", 1L, SpanKind.Link, "abcdefgh"),
      // block 1: short and only bad neighbors -> bad
      ("d2", 4L, SpanKind.Text, "ok"))
    val out = run(d2)("d2")
    assert(out._2 == "")
    assert((out._3, out._4, out._5, out._6) == ((2L, 0L, 0L, 2L)))
  }

  test("anchor text never reaches content, even inside a good block") {
    val d3 = Seq(
      // 30 text chars + 4 link chars: 100*4 <= 35*34 -> not bad; stopword-rich -> good
      ("d3", 0L, SpanKind.Text, "the"),
      ("d3", 1L, SpanKind.Link, "menu"),
      ("d3", 2L, SpanKind.Text, "parliamentary"),
      ("d3", 3L, SpanKind.Text, "proceedings00"))
    val out = run(d3)("d3")
    assert(out._2 == "the parliamentary proceedings00")
    assert(out._4 == 1L)
  }

  test("promotion is one hop: a short chain next to good promotes only its first block") {
    val d4 = Seq(
      ("d4", 0L, SpanKind.Text, "the"),
      ("d4", 1L, SpanKind.Text, "quick"),
      ("d4", 2L, SpanKind.Text, "brownish"),
      ("d4", 3L, SpanKind.Text, "foxhound"),
      ("d4", 4L, SpanKind.Text, "s1"),
      ("d4", 8L, SpanKind.Text, "s2"))
    val out = run(d4)("d4")
    // block 0 good; block 1 short w/ good neighbor -> promoted; block 2's
    // neighbors are pre-context verdicts {short} -> bad (no flood-fill).
    assert(out._2 == "the quick brownish foxhound s1")
    assert((out._4, out._5, out._6) == ((1L, 1L, 1L)))
  }
}
