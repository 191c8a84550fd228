package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("features: occurrence counts, not presence (repeated bigram counts twice)") {
    val docs = Seq((1L, "a b a b a"), (2L, "x")).toDF("id", "text")
    val f = Dsir.features(docs, "id", "text", n = 2, nBuckets = 4096)
      .as[(Long, Long, Long)].collect()
    // doc 1 bigrams: "a b","b a","a b","b a" → two buckets with cnt 2
    // (the distinct-form shingler would report cnt 1 each)
    assert(f.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(2L, 2L))
    assert(!f.exists(_._1 == 2L)) // shorter than n tokens → no features
  }

  test("bucketLogRatios: Laplace smoothing, hand-computed on 4 buckets") {
    val tf = Seq((1L, 0L, 3L), (1L, 1L, 1L)).toDF("id", "bucket", "cnt")
    val rf = Seq((9L, 0L, 1L), (9L, 2L, 1L)).toDF("id", "bucket", "cnt")
    val w = Dsir.bucketLogRatios(tf, rf, nBuckets = 4, alpha = 1.0)
      .as[(Long, Double)].collect().toMap
    // tt = 4, tr = 2; denomT = 8, denomR = 6
    def e(ct: Long, cr: Long) = math.log((ct + 1.0) / 8.0) - math.log((cr + 1.0) / 6.0)
    assert(w(0L) == e(3, 1) && w(1L) == e(1, 0) && w(2L) == e(0, 1) && w(3L) == e(0, 0))
  }

  test("importanceWeights: bucket-ordered fold, partition-count invariant") {
    val rf = Seq.tabulate(64)(i => (1L, i.toLong, (i % 3 + 1).toLong))
      .toDF("id", "bucket", "cnt")
    val ratios = Seq.tabulate(64)(i => (i.toLong, math.log(1.0 + i) - 2.0))
      .toDF("bucket", "w")
    def weight(parts: Int) =
      Dsir.importanceWeights(rf.repartition(parts), ratios)
        .as[(Long, Double)].collect().head._2
    val w1 = weight(1)
    assert(w1 == weight(7) && w1 == weight(32)) // bit-equal, not approx
  }

  test("select: higher-weight docs displace lower; gumbel is deterministic") {
    val weights = Seq((1L, 10.0), (2L, 10.0), (3L, -10.0)).toDF("id", "weight")
    val top2 = Dsir.select(weights, 2).select($"id".as[Long]).collect().toSet
    assert(top2 == Set(1L, 2L)) // ±10 swamps Gumbel noise (std ≈ 1.3)
    val s1 = Dsir.select(weights, 3).select($"score".as[Double]).collect()
    val s2 = Dsir.select(weights, 3).select($"score".as[Double]).collect()
    assert(s1.toSeq == s2.toSeq)
  }

  test("gumbel: short ids get spread noise, not a length-correlated band") {
    // Without the affine spread mod P, polyHash of a short id is tiny,
    // u collapses near 0, and g for ids "0".."199" lands in a narrow
    // monotone band around [-3.1, -1.9] — argmax-by-weight, not
    // Gumbel-perturbed sampling. With the spread, the sample must cover
    // the real Gumbel range on both sides.
    val ids = Seq.tabulate(200)(i => i.toString).toDF("id")
    val g = ids.select(Dsir.gumbel(col("id")).as("g")).as[Double].collect()
    assert(g.max > 0.5, s"max=${g.max}")  // P(g > 0.5) ≈ 0.45 per draw
    assert(g.min < -1.0, s"min=${g.min}") // P(g < -1) ≈ 0.066 per draw
    // and not monotone in the id's numeric value (the pre-fix pathology)
    val inversions = g.sliding(2).count(p => p(1) < p(0))
    assert(inversions > 50, s"inversions=$inversions")
  }

  test("dsirSelect: target-like raw docs outrank off-distribution ones") {
    // target speaks one dialect; half the raw corpus speaks it too, the
    // other half a disjoint one — selection must prefer the target-like
    // half. (Tokens deliberately varied: a first-cut fixture of doubled
    // letters like "aa bb" collided EVERY bigram into bucket 0 mod 64 —
    // base-31 char folding with space=32 is structured, not random.)
    val target = Seq.tabulate(8)(i => (1000L + i, "alpha beta gamma alpha beta"))
      .toDF("doc_id", "text")
    val raw = (Seq.tabulate(8)(i => (i.toLong, "alpha beta gamma alpha beta")) ++
      Seq.tabulate(8)(i => (100L + i, "omega sigma delta omega sigma")))
      .toDF("doc_id", "text")
    val picked = Dsir.dsirSelect(target, raw, "doc_id", "text", k = 8,
        n = 2, nBuckets = 64)
      .select(col("id").as[Long]).collect().toSet
    assert(picked == (0L until 8L).toSet, picked)
  }
}
