package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class PerplexitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side recompute of the whole LM for hand-checking: polyHash
    * mod nBuckets buckets, bigram/context counts from the reference,
    * Laplace-smoothed mean NLL per corpus doc. Independent of the Spark
    * implementation (plain Maps, no shared code paths beyond the hash
    * constant definition). */
  private def refNll(reference: Seq[String], doc: String, nBuckets: Int,
      alpha: Double = 1.0): Option[(Long, Double)] = {
    val P = 1000000007L
    def h(t: String): Long =
      t.codePoints.toArray.foldLeft(0L)((a, c) => (a * 31 + c) % P) % nBuckets
    def pairs(s: String): Seq[(Long, Long)] = {
      val b = s.trim.split("\\s+").toSeq.map(h)
      b.zip(b.drop(1))
    }
    val big = reference.flatMap(pairs).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = big.groupBy(_._1._1).map { case (pb, m) => pb -> m.values.sum }
    val ps = pairs(doc)
    if (ps.isEmpty) None
    else {
      val nll = ps.map { case (pb, cb) =>
        math.log(ctx.getOrElse(pb, 0L) + alpha * nBuckets) -
          math.log(big.getOrElse((pb, cb), 0L) + alpha)
      }.sum / ps.size
      Some((ps.size.toLong, nll))
    }
  }

  test("bigramFeatures: occurrence counts of adjacent pairs; short docs absent") {
    val docs = Seq((1L, "a b a b a"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val f = Perplexity.bigramFeatures(docs, "id", "text", nBuckets = 4096)
      .as[(Long, Long, Long, Long)].collect()
    // doc 1 pairs: (a,b),(b,a),(a,b),(b,a) -> two (pb,cb) rows with cnt 2
    assert(f.filter(_._3 == 1L).map(_._4).sorted.toSeq == Seq(2L, 2L))
    assert(!f.exists(_._3 == 2L) && !f.exists(_._3 == 3L))
  }

  test("scoreNll: hand-computed Laplace NLL, seen and unseen transitions") {
    val reference = Seq("the cat sat", "the cat ran", "a cat sat")
    val corpus = Seq((10L, "the cat sat"), (11L, "zebra quark the"), (12L, "x"))
    val nB = 64
    val ref = reference.zipWithIndex.map { case (t, i) => (100L + i, t) }
      .toDF("id", "text")
    val model = Perplexity.bigramModel(
      Perplexity.bigramFeatures(ref, "id", "text", nB))
    val got = Perplexity.scoreNll(
        Perplexity.bigramFeatures(corpus.toDF("id", "text"), "id", "text", nB),
        model, nB)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    for ((id, text) <- corpus) refNll(reference, text, nB) match {
      case Some((n, nll)) =>
        val (gn, gnll) = got(id)
        assert(gn == n && math.abs(gnll - nll) < 1e-12, s"doc $id")
      case None => assert(!got.contains(id), s"doc $id should be unscored")
    }
    // in-distribution text must be more likely than unseen-token text
    assert(got(10L)._2 < got(11L)._2)
  }

  test("scoreNll: bit-identical across partitionings (ordered fold)") {
    val nB = 32
    // enough distinct bigrams per doc that an unordered double sum would differ
    val mk = (i: Int) => (0 until 40).map(j => s"t${(i * 7 + j * 13) % 23}").mkString(" ")
    val ref = Seq.tabulate(6)(i => (100L + i, mk(i))).toDF("id", "text")
    val corpus = Seq.tabulate(4)(i => (i.toLong, mk(i + 3))).toDF("id", "text")
    val model = Perplexity.bigramModel(
      Perplexity.bigramFeatures(ref, "id", "text", nB))
    def run(parts: Int) = Perplexity.scoreNll(
        Perplexity.bigramFeatures(corpus.repartition(parts), "id", "text", nB),
        model, nB)
      .orderBy(col("id")).as[(Long, Long, Double, Double)].collect().toSeq
    val r1 = run(1)
    assert(r1 == run(7) && r1 == run(32)) // bit-equal, not approx
  }

  test("labelTertiles + perplexityGate: head/middle kept, tail and gibberish dropped") {
    val fluent = "the cat sat on the mat and the cat ran"
    val ref = Seq.tabulate(8)(i => (100L + i, fluent)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, fluent),                      // head
      (2L, "the cat sat on a log"),      // middle-ish: partial overlap
      (3L, "zx qy wv uk jh gf dd"),      // tail: all-unseen transitions
      (4L, "solo")                       // unscorable
    ).toDF("doc_id", "text")
    val nB = 64
    val model = Perplexity.bigramModel(
      Perplexity.bigramFeatures(ref, "doc_id", "text", nB))
    val scored = Perplexity.scoreNll(
      Perplexity.bigramFeatures(corpus, "doc_id", "text", nB), model, nB)
    val nll = scored.as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(nll(1L) < nll(2L) && nll(2L) < nll(3L))
    val labels = Perplexity.labelTertiles(scored, nll(1L), nll(2L))
      .select(col("id").as[Long], col("bucket").as[String]).collect().toMap
    assert(labels == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
    // gate at the middle threshold: keeps 1,2; drops 3; drops 4 by default
    val kept = Perplexity.perplexityGate(ref, corpus, "doc_id", "text",
      maxNll = nll(2L), nBuckets = nB)
      .select(col("doc_id").as[Long]).collect().toSet
    assert(kept == Set(1L, 2L))
    // keepUnscored = true readmits only the short doc, not the tail doc
    val keptU = Perplexity.perplexityGate(ref, corpus, "doc_id", "text",
      maxNll = nll(2L), nBuckets = nB, keepUnscored = true)
      .select(col("doc_id").as[Long]).collect().toSet
    assert(keptU == Set(1L, 2L, 4L))
  }
}
