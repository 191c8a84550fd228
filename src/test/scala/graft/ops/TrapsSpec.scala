package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TrapsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("digit runs collapse; big low-novelty template flagged, diverse one not") {
    // calendar trap: 6 urls, one content hash. articles: 4 urls, 4 hashes.
    val rows =
      (1 to 6).map(d => (s"http://t.ex/cal/2020/$d", 77L)) ++
      (1 to 4).map(d => (s"http://t.ex/art/$d", 100L + d)) ++
      Seq(("http://t.ex/about", 9L)) // no digits: template = raw path
    val got = Traps.templateStats(rows.toDF("url", "h"), "url", "h",
        minUrls = 5, maxNovelty = 0.2)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got("/cal/{d}/{d}") == ((6L, 1L, 1.0 / 6.0, true)))
    assert(got("/art/{d}") == ((4L, 4L, 1.0, false)))     // below minUrls, novel
    assert(got("/about") == ((1L, 1L, 1.0, false)))
    // the host column is derived from the url, not passed in
    val hosts = Traps.templateStats(rows.toDF("url", "h"), "url", "h")
      .select("host").distinct().as[String].collect()
    assert(hosts.toSeq == Seq("t.ex"))
  }

  test("same template on different hosts stays separate") {
    val rows = Seq(
      ("http://a.ex/p/1", 1L), ("http://a.ex/p/2", 1L),
      ("http://b.ex/p/1", 2L), ("http://b.ex/p/2", 3L))
    val got = Traps.templateStats(rows.toDF("url", "h"), "url", "h",
        minUrls = 2, maxNovelty = 0.5)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(got(("a.ex", "/p/{d}")) == true)   // 2 urls, 1 hash
    assert(got(("b.ex", "/p/{d}")) == false)  // 2 urls, 2 hashes
  }
}
