package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // doc i has i+1 tokens -> start of doc i = sum of 1..i = i(i+1)/2
  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, (0 to i).map(k => s"t$k").mkString(" ")))
      .toDF("doc_id", "text")

  test("layout: intervals are a gapless partition of the token stream") {
    val rows = Packing.layout(corpus(50), "doc_id", "text", seqLen = 16L)
      .orderBy("doc_id").collect()
    var expectStart = 0L
    for (r <- rows) {
      val i = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_tokens") == i + 1)
      assert(r.getAs[Long]("start_tok") == expectStart, s"doc $i")
      assert(r.getAs[Long]("end_tok") == expectStart + i + 1)
      assert(r.getAs[Long]("first_seq") == expectStart / 16)
      assert(r.getAs[Long]("last_seq") == (expectStart + i) / 16)
      assert(r.getAs[Long]("n_seqs") ==
        (expectStart + i) / 16 - expectStart / 16 + 1)
      expectStart += i + 1
    }
    assert(expectStart == 50L * 51 / 2)
  }

  test("layout is partition-count invariant") {
    val a = Packing.layout(corpus(40), "doc_id", "text", 8L, nParts = 1)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.layout(corpus(40).repartition(13), "doc_id", "text", 8L, nParts = 7)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("empty corpus yields an empty layout, not an analysis error") {
    val out = Packing.layout(corpus(5).filter($"doc_id" > 100), "doc_id", "text", 16L)
    assert(out.count() == 0)
    assert(out.columns.contains("start_tok"))
  }

  test("doc straddling a boundary spans both sequences") {
    // two docs of 10 tokens each, seqLen 16: doc 1 covers [10, 20) ->
    // sequences 0 and 1
    val df = Seq((0L, (1 to 10).map("a" + _).mkString(" ")),
      (1L, (1 to 10).map("b" + _).mkString(" "))).toDF("doc_id", "text")
    val r = Packing.layout(df, "doc_id", "text", 16L)
      .filter($"doc_id" === 1L).head()
    assert(r.getAs[Long]("first_seq") == 0L)
    assert(r.getAs[Long]("last_seq") == 1L)
    assert(r.getAs[Long]("n_seqs") == 2L)
  }
}
