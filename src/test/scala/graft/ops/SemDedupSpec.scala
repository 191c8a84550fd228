package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, sqrt}
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def centTable(cs: Seq[(Int, Seq[Double])]) =
    cs.toDF("cluster", "cv")
      .withColumn("cn", sqrt(Ann.dot(col("cv"), col("cv"))))

  // two orthogonal centroids; cluster 0 holds a near-dup pair {1, 2} plus
  // a distinct member 3; cluster 1 holds a singleton 4
  private val cents = centTable(Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0)))
  private val emb = Seq(
    (1L, Seq(1.0, 0.0)),      // ccos to c0 = 1.0
    (2L, Seq(0.999, 0.045)),  // cos(1,2) ≈ 0.999 → dup of 1; ccos < 1
    (3L, Seq(0.92, 0.39)),    // cos with 1/2 ≈ 0.92 → below threshold
    (4L, Seq(0.0, 1.0))
  ).toDF("id", "v")

  test("hand-computed: dup group keeps the member FARTHEST from its centroid") {
    val got = SemDedup.semDedup(emb, "id", "v", cents, threshold = 0.99)
      .as[(Long, Int, Double, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    // assignment: 1,2,3 → cluster 0; 4 → cluster 1
    assert(got(1L)._1 == 0 && got(2L)._1 == 0 && got(3L)._1 == 0 && got(4L)._1 == 1)
    // one dup component {1,2} labeled by its min id; 3 and 4 singletons
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L)
    assert(got(3L)._2 == 3L && got(4L)._2 == 4L)
    // keep rule: 2's centroid cosine < 1's → 2 survives, 1 dropped
    assert(!got(1L)._3 && got(2L)._3 && got(3L)._3 && got(4L)._3)
  }

  test("survivors: corpus filtered to the kept ids") {
    val s = SemDedup.survivors(emb, "id", "v", cents, threshold = 0.99)
      .select($"id".as[Long]).collect().toSet
    assert(s == Set(2L, 3L, 4L))
  }

  test("maxClusterSize cap: overflow rows generate no pairs and stay kept") {
    val out = SemDedup.semDedup(emb, "id", "v", cents,
        threshold = 0.99, maxClusterSize = 1)
      .filter(col("keep")).select($"id".as[Long]).collect().toSet
    // with only one in-play row per cluster no pair can form — nothing dropped
    assert(out == Set(1L, 2L, 3L, 4L))
  }

  test("identical vectors: one survivor per cluster-wide group") {
    val same = Seq.tabulate(6)(i => (i.toLong, Seq(1.0, 0.0))).toDF("id", "v")
    val verdicts = SemDedup.semDedup(same, "id", "v", cents, threshold = 0.99)
      .as[(Long, Int, Double, Long, Boolean)].collect()
    assert(verdicts.count(_._5) == 1)
    assert(verdicts.map(_._4).toSet == Set(0L)) // one component = min id 0
  }

  test("zero-norm vectors never pair (NaN cosine) — kept as singletons, cluster intact") {
    // without the dn > 0 guard, the zero vector's NaN cosine passes the
    // >= threshold test against EVERY row in its cluster (NaN compares
    // greater than any double in Spark SQL) and chains the whole cluster
    // into one component
    val withZero = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.92, 0.39)),  // distinct from 1 (cos ≈ 0.92 < 0.99)
      (3L, Seq(0.0, 0.0))     // failed embed
    ).toDF("id", "v")
    val rows = SemDedup.semDedup(withZero, "id", "v", cents, threshold = 0.99)
      .as[(Long, Int, Option[Double], Long, Boolean)].collect()
    val got = rows.map(r => r._1 -> ((r._4, r._5))).toMap
    // nobody paired: three singleton components, everyone kept
    assert(got(1L) == ((1L, true)) && got(2L) == ((2L, true)) && got(3L) == ((3L, true)))
    // the zero vector's centroid cosine is undefined → NULL, never a crash
    assert(rows.find(_._1 == 3L).get._3.isEmpty)
  }

  test("cross-cluster near-dups are NOT paired (the SemDeDup trade, by design)") {
    // two near-identical vectors straddling the decision boundary land in
    // different clusters → never compared; both survive
    val boundary = centTable(Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(1.0, 0.05)))
    val pair = Seq(
      (1L, Seq(1.0, 0.0249)),  // nearer c0... (cos to c0 vs c1 decides)
      (2L, Seq(1.0, 0.0251))   // nearer c1
    ).toDF("id", "v")
    val got = SemDedup.semDedup(pair, "id", "v", boundary, threshold = 0.99)
      .as[(Long, Int, Double, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._5))).toMap
    assert(got(1L)._1 != got(2L)._1, s"expected a straddle, got $got")
    assert(got(1L)._2 && got(2L)._2)
  }
}
