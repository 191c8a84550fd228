package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DustSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mine(rows: Seq[(String, Long)], minEvidence: Int = 2) =
    Dust.irrelevantParams(rows.toDF("url", "h"), "url", "h", minEvidence)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("session param judged irrelevant, content param judged relevant") {
    val rows = Seq(
      // two path groups on host a; sid never changes content, page does
      ("http://a.ex/x?page=1&sid=s1", 10L),
      ("http://a.ex/x?page=1&sid=s2", 10L),
      ("http://a.ex/x?page=2&sid=s1", 20L),
      ("http://a.ex/x?page=2&sid=s3", 20L),
      ("http://a.ex/y?page=1&sid=s1", 30L),
      ("http://a.ex/y?page=1&sid=s9", 30L))
    val got = mine(rows)
    // sid: 3 evidence groups (x|page=1, x|page=2, y|page=1), all 1-hash
    assert(got(("a.ex", "sid")) == ((3L, 3L, true)))
    // page: evidence groups x|sid=s1 (h 10 vs 20) — inconsistent
    val pg = got(("a.ex", "page"))
    assert(pg._1 >= 1L && pg._2 == 0L && !pg._3)
  }

  test("single-value groups are not evidence; minEvidence gates the verdict") {
    val rows = Seq(
      ("http://b.ex/p?u=1&t=x", 1L),
      ("http://b.ex/p?u=1&t=y", 1L), // one evidence group for t
      ("http://b.ex/q?u=2&t=z", 2L)) // single t value: not evidence
    assert(mine(rows, minEvidence = 2)(("b.ex", "t")) == ((1L, 1L, false)))
    assert(mine(rows, minEvidence = 1)(("b.ex", "t")) == ((1L, 1L, true)))
    // u never shows 2 values in any group → no row at all
    assert(!mine(rows).contains(("b.ex", "u")))
  }

  test("pair-order insensitivity: reordered query strings share a group") {
    val rows = Seq(
      ("http://c.ex/p?a=1&sid=x", 5L),
      ("http://c.ex/p?sid=y&a=1", 5L),
      ("http://c.ex/r?a=2&sid=x", 6L),
      ("http://c.ex/r?sid=q&a=2", 6L))
    assert(mine(rows)(("c.ex", "sid")) == ((2L, 2L, true)))
  }

  test("canonicalizeUrls drops only irrelevant params on the right host") {
    val verdicts = Seq(
      ("a.ex", "sid", 3L, 3L, true),
      ("a.ex", "page", 2L, 0L, false),
      ("b.ex", "page", 2L, 2L, true))
      .toDF("host", "param", "n_groups", "n_consistent", "irrelevant")
    val urls = Seq(
      "http://a.ex/x?page=2&sid=s7",      // sid dropped, page kept
      "http://a.ex/x?sid=s7",             // query empties → no '?'
      "http://b.ex/x?page=2&sid=s7",      // page dropped (b.ex rule), sid kept
      "http://c.ex/x?page=2&sid=s7",      // no rules for host → untouched
      "http://a.ex/x").toDF("url")        // no query → untouched
    val got = Dust.canonicalizeUrls(urls, "url", verdicts)
      .select("url", "canonical_url").as[(String, String)].collect().toMap
    assert(got("http://a.ex/x?page=2&sid=s7") == "http://a.ex/x?page=2")
    assert(got("http://a.ex/x?sid=s7") == "http://a.ex/x")
    assert(got("http://b.ex/x?page=2&sid=s7") == "http://b.ex/x?sid=s7")
    assert(got("http://c.ex/x?page=2&sid=s7") == "http://c.ex/x?page=2&sid=s7")
    assert(got("http://a.ex/x") == "http://a.ex/x")
  }
}
