package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // prev: en 2 docs / 30 tokens, fr 1 doc / 10 tokens
  private def prev = Seq(
    (1L, "en", Seq.fill(10)("w").mkString(" ")),
    (2L, "en", Seq.fill(20)("w").mkString(" ")),
    (3L, "fr", Seq.fill(10)("w").mkString(" "))).toDF("doc_id", "lang", "text")
  // curr: en 1 doc / 20 tokens, de 1 doc / 20 tokens (fr vanished, de new)
  private def curr = Seq(
    (4L, "en", Seq.fill(20)("w").mkString(" ")),
    (5L, "de", Seq.fill(20)("w").mkString(" "))).toDF("doc_id", "lang", "text")

  test("report: doc and token shares sum to 1 and match hand counts") {
    val r = Mix.report(prev, "lang", "text")
      .collect().map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"),
          x.getAs[Double]("token_share")))).toMap
    assert(r("en") == ((2L, 30L, 0.75)))
    assert(r("fr") == ((1L, 10L, 0.25)))
  }

  test("drift: vanished and new strata are first-class; tv_contrib sums to the TV distance") {
    val d = Mix.drift(prev, curr, "lang", "text")
      .collect().map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("n_docs_prev"), x.getAs[Long]("n_docs_curr"),
          x.getAs[Double]("token_share_prev"), x.getAs[Double]("token_share_curr"),
          x.getAs[Double]("token_share_delta"), x.getAs[Double]("tv_contrib")))).toMap
    assert(d("en") == ((2L, 1L, 0.75, 0.5, -0.25, 0.125)))
    assert(d("fr") == ((1L, 0L, 0.25, 0.0, -0.25, 0.125)))
    assert(d("de") == ((0L, 1L, 0.0, 0.5, 0.5, 0.25)))
    // TV distance between {en .75, fr .25} and {en .5, de .5} = 0.5
    assert(math.abs(d.values.map(_._6).sum - 0.5) < 1e-9)
  }

  test("unimax: waterline allocation — caps bind small strata, remainder pools; budget conserved") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "a", words(10)), (2L, "b", words(20)), (3L, "c", words(100))
    ).toDF("doc_id", "lang", "text")
    def quotas(b: Long) = Mix.unimaxQuotas(docs, "lang", "text", b, maxEpochs = 2.0)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Double]("alloc"), r.getAs[Double]("epochs")))).toMap
    // caps 20/40/200; B=120: a,b capped at 2 epochs, c takes the rest
    val q = quotas(120L)
    assert(q("a") == ((20.0, 2.0)))
    assert(q("b") == ((40.0, 2.0)))
    assert(q("c") == ((60.0, 0.6)))
    assert(math.abs(q.values.map(_._1).sum - 120.0) < 1e-9) // budget conserved
    // B >= sum(caps): everyone at cap, never past maxEpochs
    val full = quotas(500L)
    assert(full == Map("a" -> ((20.0, 2.0)), "b" -> ((40.0, 2.0)), "c" -> ((200.0, 2.0))))
    // tiny budget: uniform split, no cap binds
    val tiny = quotas(30L)
    assert(tiny("a")._1 == 10.0 && tiny("b")._1 == 10.0 && tiny("c")._1 == 10.0)
  }

  test("drift: a NULL stratum present on both sides is ONE row, not two half-rows") {
    val p = Seq((1L, null: String, "a b c"), (2L, "en", "a b c"))
      .toDF("doc_id", "lang", "text")
    val c = Seq((3L, null: String, "a b c d e f"), (4L, "en", "a b c"))
      .toDF("doc_id", "lang", "text")
    val rows = Mix.drift(p, c, "lang", "text").collect()
    assert(rows.length == 2) // en + the single NULL-stratum row
    val nul = rows.find(_.isNullAt(0)).get
    assert(nul.getAs[Long]("n_docs_prev") == 1L)
    assert(nul.getAs[Long]("n_docs_curr") == 1L)
    assert(nul.getAs[Long]("n_tokens_prev") == 3L)
    assert(nul.getAs[Long]("n_tokens_curr") == 6L)
  }
}
