package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def windowReplay(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"g", $"rank", $"id", $"score")
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("aggregated top-k equals the row_number window on skewed multi-partition data") {
    // deterministic pseudo-random scores with REPEATED values (hash mod 17)
    // so the id tie-break is genuinely exercised; 8 partitions
    val rows = (0L until 2000L).map { i =>
      (s"g${i % 7}", i, (i * 2654435761L % 17L).toDouble / 17.0)
    }
    val df = spark.sparkContext.parallelize(rows, 8).toDF("g", "id", "score")
    val got = TopK.topKPerGroup(df, "g", "score", "id", k = 9)
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == windowReplay(df, 9))
  }

  test("k larger than every group returns whole groups, still ranked") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 7.0), ("b", 3L, 1.0))
      .toDF("g", "id", "score")
    val got = TopK.topKPerGroup(df, "g", "score", "id", k = 10)
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(("a", 1L, 2L, 7.0), ("a", 2L, 1L, 5.0), ("b", 1L, 3L, 1.0)))
  }

  test("reduce rejects non-contenders without growing; merge stays bounded and ordered") {
    val agg = TopK.topKAggregator(3)
    val full = (1L to 10L).foldLeft(agg.zero)((b, i) => agg.reduce(b, TopK.Scored(i.toDouble, i)))
    assert(full == Seq(TopK.Scored(10.0, 10), TopK.Scored(9.0, 9), TopK.Scored(8.0, 8)))
    // a row below the current k-th must leave the buffer untouched (eq check)
    assert(agg.reduce(full, TopK.Scored(0.5, 99)) == full)
    // tie on score: LOWER id wins the slot
    val tied = agg.reduce(full, TopK.Scored(8.0, 7))
    assert(tied == Seq(TopK.Scored(10.0, 10), TopK.Scored(9.0, 9), TopK.Scored(8.0, 7)))
    // merge in either order gives the same bounded result (commutative)
    val other = Seq(TopK.Scored(11.0, 1), TopK.Scored(8.5, 2))
    assert(agg.merge(full, other) == agg.merge(other, full))
    assert(agg.merge(full, other) ==
      Seq(TopK.Scored(11.0, 1), TopK.Scored(10.0, 10), TopK.Scored(9.0, 9)))
  }

  test("empty input yields an empty frame") {
    val df = Seq.empty[(String, Long, Double)].toDF("g", "id", "score")
    assert(TopK.topKPerGroup(df, "g", "score", "id", 5).count() == 0L)
  }
}
