package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SpanDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val spanType = ArrayType(StructType(Seq(
    StructField("kind", StringType), StructField("text", StringType),
    StructField("media_ref", StringType), StructField("offset", LongType))))
  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("spans", spanType)))

  private def tbl(rows: (Long, Seq[(String, String, String, Long)])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, sp) =>
        Row(id, sp.map { case (k, t, m, o) => Row(k, t, m, o) })
      }),
      schema)

  test("audit: offset VALUES don't matter, order does; all four verdicts; first_diff") {
    val left = tbl(
      // doc 1: same sequence, different offset numbering on the right -> match
      1L -> Seq(("text", "a", null, 0L), ("media", "m", "r1", 5L), ("text", "b", null, 9L)),
      // doc 2: text differs at position 2 -> mismatch, first_diff 2
      2L -> Seq(("text", "a", null, 0L), ("text", "b", null, 1L)),
      // doc 3: right is a strict prefix -> mismatch, first_diff 3
      3L -> Seq(("text", "a", null, 0L), ("text", "b", null, 1L), ("text", "c", null, 2L)),
      // doc 4: only on the left
      4L -> Seq(("text", "x", null, 0L)))
    val right = tbl(
      1L -> Seq(("text", "a", null, 100L), ("media", "m", "r1", 200L), ("text", "b", null, 300L)),
      2L -> Seq(("text", "a", null, 0L), ("text", "ZZZ", null, 1L)),
      3L -> Seq(("text", "a", null, 0L), ("text", "b", null, 1L)),
      5L -> Seq(("text", "y", null, 0L)))
    val out = SpanDiff.audit(left, right, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("verdict"), Option(r.getAs[java.lang.Long]("n_left")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("n_right")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("first_diff")).map(_.toLong)))).toMap
    assert(out(1L) == (("match", Some(3L), Some(3L), Some(0L))))
    assert(out(2L) == (("mismatch", Some(2L), Some(2L), Some(2L))))
    assert(out(3L) == (("mismatch", Some(3L), Some(2L), Some(3L))))
    assert(out(4L) == (("left_only", Some(1L), None, None)))
    assert(out(5L) == (("right_only", None, Some(1L), None)))
    val rep = SpanDiff.auditReport(SpanDiff.audit(left, right, "doc_id"))
      .collect().map(r => r.getAs[String]("verdict") -> r.getAs[Long]("n_docs")).toMap
    assert(rep == Map("match" -> 1L, "mismatch" -> 2L, "left_only" -> 1L, "right_only" -> 1L))
  }

  test("audit: an out-of-order emission with the same offset-sorted sequence is a match") {
    val left = tbl(1L -> Seq(("text", "b", null, 1L), ("text", "a", null, 0L)))
    val right = tbl(1L -> Seq(("text", "a", null, 0L), ("text", "b", null, 1L)))
    val v = SpanDiff.audit(left, right, "doc_id").collect().head.getAs[String]("verdict")
    assert(v == "match")
  }

  test("audit: duplicate offsets tie-break on content — verdict is deterministic") {
    // two spans share offset 0; emission order differs between sides.
    // With an offset-only comparator the sorted sequence would depend on
    // array_sort's (unspecified) stability; the content tie-break pins
    // one order, so equal SETS at one offset always verdict `match`.
    val left = tbl(1L -> Seq(("text", "b", null, 0L), ("text", "a", null, 0L),
      ("media", null, "m1", 0L)))
    val right = tbl(1L -> Seq(("media", null, "m1", 0L), ("text", "a", null, 0L),
      ("text", "b", null, 0L)))
    val v = SpanDiff.audit(left, right, "doc_id").collect().head.getAs[String]("verdict")
    assert(v == "match")
    // and genuinely different content at the shared offset still differs
    val right2 = tbl(1L -> Seq(("text", "b", null, 0L), ("text", "c", null, 0L),
      ("media", null, "m1", 0L)))
    val v2 = SpanDiff.audit(left, right2, "doc_id").collect().head.getAs[String]("verdict")
    assert(v2 == "mismatch")
  }

  test("audit: null media_ref equals null media_ref, differs from a value") {
    val left = tbl(1L -> Seq(("media", "t", null, 0L)))
    val right = tbl(1L -> Seq(("media", "t", "ref", 0L)))
    val v = SpanDiff.audit(left, right, "doc_id").collect().head.getAs[String]("verdict")
    assert(v == "mismatch")
    val same = SpanDiff.audit(left, left, "doc_id").collect().head.getAs[String]("verdict")
    assert(same == "match")
  }
}
