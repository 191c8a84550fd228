package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def model(feat: Seq[(Long, Long, Long)], labels: Seq[(Long, Int)],
      nBuckets: Int, maxIters: Int): QualityClassifier.Model =
    QualityClassifier.train(
      feat.toDF("id", "bucket", "cnt"), labels.toDF("id", "y"),
      nBuckets, maxIters)

  test("hand-computed batch perceptron: one update separates, then converges") {
    // doc 1 (+1): {b0: 2, b1: 1}; doc 2 (-1): {b2: 2}
    // iter 1: all margins 0 -> both misclassified (y·0 ≤ 0) ->
    //   w = [+2, +1, -2, 0], bias = (+1) + (-1) = 0
    // iter 2: margin1 = 5 (+1 ok), margin2 = -4 (-1 ok) -> converged
    val m = model(
      Seq((1L, 0L, 2L), (1L, 1L, 1L), (2L, 2L, 2L)),
      Seq((1L, 1), (2L, -1)),
      nBuckets = 4, maxIters = 10)
    assert(m.weights === Seq(2L, 1L, -2L, 0L))
    assert(m.bias === 0L)
    assert(m.itersRun === 1)
    assert(m.converged)
  }

  test("y·margin = 0 counts as misclassified (the all-zero start updates)") {
    // symmetric docs cancel every update: weights stay 0, margins stay 0,
    // so every iteration re-misclassifies both and the loop never converges
    val m = model(
      Seq((1L, 0L, 1L), (2L, 0L, 1L)),
      Seq((1L, 1), (2L, -1)),
      nBuckets = 2, maxIters = 5)
    assert(m.weights === Seq(0L, 0L))
    assert(m.bias === 0L)
    assert(m.itersRun === 5)
    assert(!m.converged)
  }

  test("bias learns a majority class with no separating feature") {
    // both docs share the one feature; only the bias can separate a
    // 2-positive majority: iter 1 updates bias by +1 (y sums: +1+1-1),
    // weights by +1 (cnt sums) ... run to maxIters and check the exact
    // integer trajectory is reproduced by a driver-side reference loop
    val feat = Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L))
    val labels = Seq((1L, 1), (2L, 1), (3L, -1))
    val m = model(feat, labels, nBuckets = 1, maxIters = 4)
    // reference loop
    var w = 0L; var b = 0L
    for (_ <- 1 to 4) {
      val mis = labels.filter { case (_, y) => y * (w + b) <= 0 }
      if (mis.nonEmpty) {
        w += mis.map(_._2.toLong).sum
        b += mis.map(_._2.toLong).sum
      }
    }
    assert(m.weights === Seq(w))
    assert(m.bias === b)
  }

  test("training is partition-invariant: 1, 7, 32 partitions give one model") {
    val docs = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) "good clean prose text here" + (" filler" * (i % 5).toInt)
          else "spam spam buy now " + ("x" * (i % 7).toInt))
    }.toDF("id", "text")
    val labels = (0L until 60L).map(i => (i, if (i % 3 == 0) 1 else -1))
      .toDF("id", "y")
    val models = Seq(1, 7, 32).map { n =>
      QualityClassifier.train(
        QualityClassifier.features(docs.repartition(n), "id", "text", 32),
        labels, nBuckets = 32, maxIters = 6)
    }
    assert(models.map(_.weights).distinct.size === 1)
    assert(models.map(_.bias).distinct.size === 1)
    assert(models.map(_.itersRun).distinct.size === 1)
  }

  test("scoreMargin matches a driver-side dot product; unfeatured docs emit no row") {
    val m = QualityClassifier.Model(4, Seq(3L, -1L, 0L, 2L), 5L, 1, false)
    val feat = Seq((1L, 0L, 2L), (1L, 3L, 1L), (2L, 1L, 4L)).toDF("id", "bucket", "cnt")
    val got = QualityClassifier.scoreMargin(feat, m)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3 * 2 + 2 * 1 + 5L), (2L, -1 * 4 + 5L)))
  }

  test("weightTable: nonzero buckets plus the bucket = -1 bias row") {
    val m = QualityClassifier.Model(4, Seq(0L, 7L, 0L, -2L), -9L, 2, true)
    val rows = QualityClassifier.weightTable(spark, m)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(rows === Seq((-1L, -9L), (1L, 7L), (3L, -2L)))
  }

  test("doc-direct paths ≡ feature-frame paths (trainOnDocs / scoreMarginOnDocs)") {
    val docs = (0L until 40L).map { i =>
      (i, if (i % 4 == 0) "careful committee prose " + ("depth " * (i % 3).toInt)
          else "buy now spam " + ("win " * (i % 5).toInt))
    }.toDF("id", "text")
    val labels = (0L until 40L).map(i => (i, if (i % 4 == 0) 1 else -1)).toDF("id", "y")
    val viaFeat = QualityClassifier.train(
      QualityClassifier.features(docs, "id", "text", 32), labels, 32, 5)
    val viaDocs = QualityClassifier.trainOnDocs(docs, "id", "text", labels, 32, 5)
    assert(viaDocs.weights === viaFeat.weights)
    assert(viaDocs.bias === viaFeat.bias)
    assert(viaDocs.itersRun === viaFeat.itersRun)
    assert(viaDocs.converged === viaFeat.converged)
    val sFeat = QualityClassifier.scoreMargin(
        QualityClassifier.features(docs, "id", "text", 32), viaFeat)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val sDocs = QualityClassifier.scoreMarginOnDocs(docs, "id", "text", viaDocs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(sDocs === sFeat)
  }

  test("classifierGate keeps reference-like corpus docs and drops crawl-like ones") {
    val pos = (0L until 20L).map(i => (i, "the committee discussed the careful bill"))
      .toDF("pid", "text")
    val neg = (100L until 120L).map(i => (i, "casino casino free free buy pills"))
      .toDF("pid", "text")
    val corpus = Seq(
      (200L, "the committee discussed the bill"),
      (201L, "casino free pills buy"),
      (202L, "careful committee bill discussed the the")).toDF("pid", "text")
    val kept = QualityClassifier.classifierGate(pos, neg, corpus, "pid", "text",
        nBuckets = 64, maxIters = 10)
      .select("pid").as[Long].collect().toSet
    assert(kept === Set(200L, 202L))
  }
}
