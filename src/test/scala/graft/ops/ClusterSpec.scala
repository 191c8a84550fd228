package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class ClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference union-find (path compression) for brute-force comparison. */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id root: compress all, then map each root to min member
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Cluster.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("connected components == union-find on random graphs") {
    val rnd = new Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 17
      val edges = (0 until n).map { _ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter(e => e._1 != e._2)
      assert(ccOf(edges) == bruteComponents(edges), s"trial $trial")
    }
  }

  test("local fast path == distributed loop (forced via maxLocalEdges = 0)") {
    val rnd = new Random(7)
    for (trial <- 0 until 3) {
      val edges = (0 until 60 + trial * 31).map { _ =>
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
      }.filter(e => e._1 != e._2)
      val df = edges.toDF("a", "b")
      val fast = Cluster.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      val loop = Cluster.connectedComponents(df, "a", "b", maxLocalEdges = 0)
        .as[(Long, Long)].collect().toMap
      assert(fast == loop, s"trial $trial")
      assert(fast == bruteComponents(edges), s"trial $trial vs brute")
    }
    // string ids: both paths agree, min = Spark/UTF8 binary order
    val sEdges = Seq(("hb", "ha"), ("ha", "hc"), ("hz", "hy")).toDF("a", "b")
    val sFast = Cluster.connectedComponents(sEdges, "a", "b")
      .as[(String, String)].collect().toMap
    val sLoop = Cluster.connectedComponents(sEdges, "a", "b", maxLocalEdges = 0)
      .as[(String, String)].collect().toMap
    assert(sFast == sLoop)
    assert(sFast == Map("ha" -> "ha", "hb" -> "ha", "hc" -> "ha",
      "hy" -> "hy", "hz" -> "hy"))
  }

  test("chain graph (worst-case diameter) converges to one component") {
    // a 64-node path: label propagation would need 64 rounds; star-contraction
    // must finish well inside the maxIter=64 cap (O(log^2 n) rounds)
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = ccOf(chain)
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("self-pairs, duplicates, and empty input are tolerated") {
    assert(ccOf(Seq((5L, 5L))) == Map.empty) // self-loop only: no edges
    assert(ccOf(Seq((1L, 2L), (2L, 1L), (1L, 2L))) == Map(1L -> 1L, 2L -> 1L))
    assert(Cluster.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").count() == 0)
  }

  test("result is a small-star fixed point (stars rooted at component minima)") {
    val rnd = new Random(7)
    val edges = (0 until 80).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val cc = ccOf(edges)
    // every node points directly at its component min; roots are their own min
    val brute = bruteComponents(edges)
    assert(cc == brute)
    cc.foreach { case (node, comp) => assert(comp <= node && cc(comp) == comp) }
  }

  test("assignComponents covers singletons; survivors pick max score, tie -> min id") {
    val docs = Seq(
      (1L, 100L), (2L, 300L), (3L, 300L), // component {1,2,3}: 2 and 3 tie on score
      (4L, 50L), // singleton
      (10L, 7L), (11L, 9L) // component {10,11}
    ).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val assigned = Cluster.assignComponents(docs, "doc_id", pairs, "doc_a", "doc_b")
      .join(docs, "doc_id")
    val comp = assigned.select($"doc_id", $"component").as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 10L -> 10L, 11L -> 10L))
    val surv = Cluster.survivors(assigned, "doc_id", "n_chars")
      .select($"component", $"survivor", $"n_docs", $"survivor_score")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(surv == Set((1L, 2L, 3L, 300L), (4L, 4L, 1L, 50L), (10L, 11L, 2L, 9L)))
  }

  test("string ids order lexicographically") {
    val pairs = Seq(("b", "c"), ("a", "b")).toDF("x", "y")
    val got = Cluster.connectedComponents(pairs, "x", "y")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("partitioning-invariant: repartitioned input gives identical components") {
    val rnd = new Random(13)
    val edges = (0 until 120).map(_ => (rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("a", "b")
    val one = Cluster.connectedComponents(df.repartition(1), "a", "b")
      .as[(Long, Long)].collect().toMap
    val many = Cluster.connectedComponents(df.repartition(16), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(one == many && one == bruteComponents(edges))
  }
}
