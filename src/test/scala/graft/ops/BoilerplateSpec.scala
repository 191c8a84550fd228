package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def strip(rows: Seq[(Long, String)], minDocs: Int) =
    Boilerplate.stripFrequentLines(rows.toDF("id", "text"), "id", "text", minDocs)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("frequent lines drop, order survives, all-boilerplate doc comes back empty") {
    val rows = Seq(
      (1L, "NAV\nalpha\nbeta\nFOOTER"),
      (2L, "NAV\ngamma\nFOOTER"),
      (3L, "NAV\ndelta\nFOOTER"),
      (4L, "NAV\nFOOTER")) // nothing but chrome
    val got = strip(rows, minDocs = 3)
    assert(got(1L) == (("alpha\nbeta", 2L)))
    assert(got(2L) == (("gamma", 1L)))
    assert(got(3L) == (("delta", 1L)))
    assert(got(4L) == (("", 0L)))
  }

  test("df counts distinct docs, not occurrences") {
    // 'x' appears 3 times but only in doc 1 → df=1, kept
    val rows = Seq((1L, "x\nx\nx"), (2L, "y"))
    val got = strip(rows, minDocs = 2)
    assert(got(1L) == (("x\nx\nx", 3L)))
    assert(got(2L) == (("y", 1L)))
  }

  test("minDocs boundary is inclusive") {
    val rows = Seq((1L, "b\nu1"), (2L, "b\nu2"))
    assert(strip(rows, minDocs = 2)(1L) == (("u1", 1L)))
    assert(strip(rows, minDocs = 3)(1L) == (("b\nu1", 2L)))
  }
}
