package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class SplitsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(n: Int) =
    Seq.tabulate(n)(i => (i.toLong, s"doc $i")).toDF("id", "text")

  test("assignSplit: deterministic, partition-invariant, fractions roughly hold") {
    val fr = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val d = docs(2000)
    val a = Splits.assignSplit(d, "id", fr)
      .select($"id".as[Long], $"split".as[String]).collect().toMap
    val b = Splits.assignSplit(d.repartition(13), "id", fr)
      .select($"id".as[Long], $"split".as[String]).collect().toMap
    assert(a == b)
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts("train") > 1400 && counts("train") < 1800)
    assert(counts("valid") > 100 && counts("test") > 100)
    assertThrows[IllegalArgumentException] {
      Splits.assignSplit(d, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("leakPairsBanded: cross-side collisions only; cap drops degenerate buckets") {
    val aB = Seq((1L, 0, 10L), (2L, 0, 11L), (3L, 1, 10L)).toDF("id", "band", "bv")
    val bB = Seq((7L, 0, 10L), (8L, 0, 12L), (9L, 1, 10L)).toDF("id", "band", "bv")
    val pairs = Splits.leakPairsBanded(aB, bB, "id", Int.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 7L), (3L, 9L))) // same (band,bv) across sides only
    // degenerate bucket: 5 a-side rows in one bucket, cap 3 drops them all
    val aDeg = (aB.as[(Long, Int, Long)].collect().toSeq ++
      Seq.tabulate(5)(i => (100L + i, 2, 99L))).toDF("id", "band", "bv")
    val bDeg = Seq((7L, 0, 10L), (9L, 1, 10L), (50L, 2, 99L)).toDF("id", "band", "bv")
    val cappedPairs = Splits.leakPairsBanded(aDeg, bDeg, "id", 3)
      .as[(Long, Long)].collect().toSet
    assert(cappedPairs == Set((1L, 7L), (3L, 9L))) // bucket 99 sacrificed, nothing invented
    val uncapped = Splits.leakPairsBanded(aDeg, bDeg, "id", Int.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(cappedPairs.subsetOf(uncapped) && uncapped.size == 7)
  }

  test("crossSplitLeakPairs + purge: planted near-dup across splits is caught") {
    val body = (0 until 30).map(j => s"w${j % 17}").mkString(" ")
    val train = Seq((1L, body), (2L, "completely different text about other things entirely")).toDF("id", "text")
    val eval = Seq((10L, body + " tail"), (11L, "nothing shared with anything at all here")).toDF("id", "text")
    val leaks = Splits.crossSplitLeakPairs(train, eval, "id", "text")
      .as[(Long, Long)].collect().toSet
    assert(leaks.contains((1L, 10L)))
    assert(!leaks.exists(p => p._1 == 2L || p._2 == 11L))
    val purged = Splits.purgeByIds(train, "id",
      Splits.crossSplitLeakPairs(train, eval, "id", "text").select(col("train_id")))
      .select($"id".as[Long]).collect().toSet
    assert(purged == Set(2L))
  }

  test("splitWithLeakageGuard: no surviving train doc near-dups an eval doc") {
    // a cluster of near-identical docs large enough to straddle splits
    val base = (0 until 40).map(j => s"token${j % 11}").mkString(" ")
    val cluster = Seq.tabulate(20)(i => (i.toLong, s"$base extra$i"))
    val singles = Seq.tabulate(20)(i =>
      (100L + i, (0 until 25).map(j => s"u${i}x${(j * 7 + i) % 19}").mkString(" ")))
    val corpus = (cluster ++ singles).toDF("id", "text")
    val fr = Seq("train" -> 0.6, "eval" -> 0.4)
    val out = Splits.splitWithLeakageGuard(corpus, "id", "text", fr, "train")
    val survivors = out.select($"id".as[Long], $"split".as[String]).collect()
    // every eval row survived untouched
    val assignedEval = Splits.assignSplit(corpus, "id", fr)
      .filter(col("split") =!= "train").select($"id".as[Long]).collect().toSet
    assert(survivors.filter(_._2 != "train").map(_._1).toSet == assignedEval)
    // and re-mining leaks on the survivor set finds nothing
    val train2 = out.filter(col("split") === "train")
    val eval2 = out.filter(col("split") =!= "train")
    assert(Splits.crossSplitLeakPairs(train2, eval2, "id", "text").count() == 0L)
  }
}
