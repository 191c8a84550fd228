package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScrubSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(texts: String*) =
    texts.toSeq.toDF("t").select(
      Scrub.scrub($"t").as("s"),
      Scrub.emailCount($"t").as("e"),
      Scrub.ipv4Count($"t").as("i"),
      Scrub.phoneCount($"t").as("p"))
      .as[(String, Long, Long, Long)].collect()

  test("masks all three kinds, counts on the original text") {
    val Array(r) = run(
      "連絡先 a.b+c@ex-1.co.jp と 10.0.255.3 と 03-1234-5678 まで")
    assert(r._1 == "連絡先 <EMAIL> と <IP> と <PHONE> まで")
    assert((r._2, r._3, r._4) == ((1L, 1L, 1L)))
  }

  test("clean text passes through untouched; lookalikes don't trip") {
    // 2023-12-25 has no leading 0 in the first group; 1.2.3 is not a quad;
    // "user at example.com" has no @
    val Array(r) = run("dated 2023-12-25, version 1.2.3, user at example.com")
    assert(r._1 == "dated 2023-12-25, version 1.2.3, user at example.com")
    assert((r._2, r._3, r._4) == ((0L, 0L, 0L)))
  }

  test("multiple occurrences all masked (global replace)") {
    val Array(r) = run("x@y.jp then z@w.org then 090-1111-2222 and 06-333-4444")
    assert(r._1 == "<EMAIL> then <EMAIL> then <PHONE> and <PHONE>")
    assert((r._2, r._3, r._4) == ((2L, 0L, 2L)))
  }
}
