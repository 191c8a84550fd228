package graft.extract

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KeyphrasesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("extract: kanji/katakana runs, freq x length score, deterministic top-k") {
    val speech = "内閣総理大臣は予算委員会において予算案について答弁した。" +
      "予算委員会は予算案を可決した。デジタル庁の予算案も含まれる。"
    // 予算委員会 freq=2 score=10; 予算案 freq=3 score=9; 内閣総理大臣 freq=1 score=6;
    // デジタル庁 score=5 (katakana+kanji one run); 答弁/可決 score=2; 含 len<2 excluded
    val got = Keyphrases.extract(speech, 3)
    assert(got == Seq("予算委員会", "予算案", "内閣総理大臣"))
  }

  test("extract: hiragana and ascii delimit; ties break by first occurrence then phrase") {
    // both 外交 and 防衛 have freq=1, len=2 -> tie; 外交 occurs first
    assert(Keyphrases.extract("外交と防衛について", 2) == Seq("外交", "防衛"))
    assert(Keyphrases.extract("", 3) == Nil)
    assert(Keyphrases.extract(null, 3) == Nil)
    assert(Keyphrases.extract("ひらがな only and ascii 123", 3) == Nil)
    // single-char runs excluded (length >= 2)
    assert(Keyphrases.extract("法の下", 3) == Nil)
  }

  test("extract matches the reference call shape: top-3 from joined speech") {
    val joined = ("憲法審査会で憲法改正について議論した。" * 3) + "国民投票法も議題となった。"
    val got = Keyphrases.extract(joined, 3)
    assert(got.size == 3)
    assert(got.head == "憲法審査会") // freq 3 x len 5
    assert(got(1) == "憲法改正")     // freq 3 x len 4
  }

  test("phraseTopK: stopword-delimited runs, score = freq x tokens, top-k per id") {
    val df = Seq(
      (1L, "quick fox the quick fox a dog"),
      (2L, "a lone word the lone word the word")
    ).toDF("doc_id", "text")
    val out = Keyphrases.phraseTopK(df, "doc_id", "text", k = 2, Seq("a", "the"))
      .orderBy("doc_id", "rank")
      .as[(Long, Long, String, Long)].collect().toSeq
    // doc 1: "quick fox" freq 2 x 2 tokens = 4 beats "dog" (1)
    assert(out(0) == ((1L, 1L, "quick fox", 4L)))
    assert(out(1) == ((1L, 2L, "dog", 1L)))
    // doc 2: "lone word" 2x2=4 beats "word" 1x1=1
    assert(out(2) == ((2L, 1L, "lone word", 4L)))
    assert(out(3) == ((2L, 2L, "word", 1L)))
  }

  test("phraseTopK: stopwords at edges and back-to-back produce no empty phrases") {
    val df = Seq((1L, "the a the fox a a the")).toDF("doc_id", "text")
    val out = Keyphrases.phraseTopK(df, "doc_id", "text", k = 3, Seq("a", "the"))
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, "fox", 1L)))
  }

  test("extractCol mirrors extract in the DF plane") {
    val df = Seq(("m1", "予算委員会で予算案を可決")).toDF("id", "speech")
    val got = df.select(Keyphrases.extractCol(col("speech"), 3).as("kp"))
      .as[Seq[String]].head()
    assert(got == Keyphrases.extract("予算委員会で予算案を可決", 3))
  }
}
