package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark joins data with data"),
    (2L, "data data data"),
    (3L, "fast scan of tables"),
    (4L, "no relevant terms here at all"))
    .toDF("doc_id", "text")

  test("postings: tf per (term, doc)") {
    val p = Search.postings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(p.contains(("data", 1L, 2L)))
    assert(p.contains(("data", 2L, 3L)))
    assert(p.contains(("spark", 1L, 1L)))
    assert(!p.exists(_._1 == "")) // no empty tokens
    assert(Search.postings(docs, "doc_id", "text", minTf = 2)
      .as[(String, Long, Long)].collect().toSet ==
      Set(("data", 1L, 2L), ("data", 2L, 3L)))
  }

  /** Driver-side BM25 reference with identical semantics. */
  private def refBm25(corpus: Seq[(Long, String)], q: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val qs = q.distinct
    corpus.flatMap { case (id, _) =>
      val tks = toks(id)
      val dl = tks.size
      val ws = qs.flatMap { term =>
        val tf = tks.count(_ == term)
        if (tf == 0) None
        else {
          val df = toks.values.count(_.contains(term))
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          Some(idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1 - b) + b * dl / avgdl)))
        }
      }
      if (ws.isEmpty) None else Some(id -> ws.sum)
    }.toMap
  }

  test("bm25 matches the reference formula; non-matching docs are absent") {
    val q = Seq("data", "spark", "missingterm")
    val got = Search.bm25(docs, "doc_id", "text", q)
      .as[(Long, Double)].collect().toMap
    val want = refBm25(docs.as[(Long, String)].collect().toSeq, q)
    assert(got.keySet == Set(1L, 2L)) // docs 3,4 match nothing
    for ((id, w) <- want) assert(math.abs(got(id) - w) < 1e-12, s"doc $id")
    // tf saturation: doc 2 has tf=3 'data' but is shorter — its score must
    // exceed doc 1's (tf=2, longer), and rarer 'spark' boosts doc 1 less
    // than the margin
    assert(got(2L) > 0 && got(1L) > 0)
  }

  test("tfIdfTopTerms: rarest-weighted terms win, rounded-score ties break on term") {
    val corpus = Seq(
      (1L, "rare common common"),        // 'rare' df=1 outranks 'common' df=3
      (2L, "common zz zz"),
      (3L, "common aa zz"))
      .toDF("doc_id", "text")
    val got = Search.tfIdfTopTerms(corpus, "doc_id", "text", k = 2)
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: rare: 1*ln(3/1)=1.0986; common: 2*ln(3/3)=0
    assert(got(1L)._1 == "rare,common")
    assert(math.abs(got(1L)._2 - 1.098612) < 1e-9)
    // doc 3: aa (df=1) vs zz (df=2): 1.0986 > 0.4055; common last
    assert(got(3L)._1 == "aa,zz")
    // doc 2: zz tf=2 -> 0.8109; common 0
    assert(got(2L)._1 == "zz,common")
  }

  test("bm25 counts duplicate query terms once") {
    val a = Search.bm25(docs, "doc_id", "text", Seq("data", "data"))
      .as[(Long, Double)].collect().toMap
    val b = Search.bm25(docs, "doc_id", "text", Seq("data"))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
