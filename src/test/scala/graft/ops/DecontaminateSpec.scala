package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val benchQ = "what is the capital of France Paris is the capital"
  private def corpus = Seq(
    (1L, s"filler words then $benchQ verbatim leak inside a longer document"),
    (2L, "a completely unrelated document about crawling the Japanese Diet sites"),
    (3L, "what is the capital of France but it diverges before thirteen grams match"),
    (4L, s"$benchQ $benchQ twice leaked but distinct grams counted once each")
  ).toDF("doc_id", "text")
  private def bench = Seq((100L, benchQ)).toDF("bid", "btext")

  test("contaminationHits flags verbatim leaks, counts distinct grams once") {
    val hits = Decontaminate.contaminationHits(corpus, "doc_id", "text",
        bench, "btext", n = 8)
      .orderBy("doc_id").collect()
    val byId = hits.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    // the 10-token benchmark has 3 distinct 8-grams; docs 1 and 4 carry
    // all of them (doc 4's duplication must not double-count)
    assert(byId == Map(1L -> 3L, 4L -> 3L))
  }

  test("clean drops exactly the contaminated docs") {
    val kept = Decontaminate.clean(corpus, "doc_id", "text", bench, "btext", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("n larger than every doc flags nothing") {
    assert(Decontaminate.contaminationHits(corpus, "doc_id", "text",
      bench, "btext", n = 50).count() == 0)
  }
}
