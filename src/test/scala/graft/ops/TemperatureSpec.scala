package graft.ops

import graft.SparkTestSession
import graft.functions.HashFns
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TemperatureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(sizes: (String, Int)*) =
    sizes.toSeq.flatMap { case (s, n) =>
      (0 until n).map(i => (s"$s-$i", s))
    }.toDF("id", "stratum")

  private def quotaMap(df: org.apache.spark.sql.DataFrame) =
    df.select($"stratum".as[String], $"quota".as[Long]).collect().toMap

  test("quotas: hand-computed sqrt flattening, caps and deficits") {
    val d = corpus("a" -> 16, "b" -> 4, "c" -> 1)
    // alpha=0.5: w = 4,2,1; W = 7
    val q7 = Temperature.quotas(d, "stratum", 0.5, 7)
      .select($"stratum".as[String], $"n_docs".as[Long], $"quota".as[Long],
        $"deficit".as[Long]).collect().map(r => r._1 -> r).toMap
    assert(q7("a") == ("a", 16L, 4L, 0L))
    assert(q7("b") == ("b", 4L, 2L, 0L))
    assert(q7("c") == ("c", 1L, 1L, 0L))
    // T=70: targets 40,20,10 all exceed the strata -> capped, deficits
    val q70 = Temperature.quotas(d, "stratum", 0.5, 70)
      .select($"stratum".as[String], $"quota".as[Long], $"deficit".as[Long])
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(q70 == Map("a" -> (16L, 24L), "b" -> (4L, 16L), "c" -> (1L, 9L)))
  }

  test("quotas: alpha=1 proportional, alpha=0 equal-per-stratum") {
    val d = corpus("a" -> 16, "b" -> 4)
    assert(quotaMap(Temperature.quotas(d, "stratum", 1.0, 10)) ==
      Map("a" -> 8L, "b" -> 2L))
    // alpha=0: weights 1,1 -> 5 each, b capped at 4
    assert(quotaMap(Temperature.quotas(d, "stratum", 0.0, 10)) ==
      Map("a" -> 5L, "b" -> 4L))
  }

  test("resample: exact per-stratum quota, deterministic, rank-prefix of the full ranking") {
    val d = corpus("a" -> 40, "b" -> 10, "c" -> 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      Temperature.resample(df, "stratum", HashFns.polyHash(col("id")),
          col("id"), alpha = 0.5, totalDocs = 20)
        .select($"stratum".as[String], $"id".as[String], $"sample_rank".as[Int])
        .collect().toSet
    val got = run(d)
    assert(got == run(d.repartition(13)))
    val byStratum = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byStratum == quotaMap(
      Temperature.quotas(d, "stratum", 0.5, 20)).map { case (k, v) => k -> v.toInt })
    // survivors are exactly the lowest-ranked prefix of the unprefiltered ranking
    val full = Sampling.quotaPerStratum(d, "stratum", HashFns.polyHash(col("id")),
        col("id"), k = 40, prefilter = false)
      .select($"stratum".as[String], $"id".as[String], $"sample_rank".as[Int])
      .collect()
    val quotas = quotaMap(Temperature.quotas(d, "stratum", 0.5, 20))
    assert(got == full.filter(r => r._3 <= quotas(r._1)).toSet)
  }

  test("resample: a stratum rounded to quota 0 vanishes; tiny corpora survive") {
    val d = corpus("big" -> 1000, "tiny" -> 1)
    // alpha=1, T=10: tiny's target = round(10/1001) = 0
    val got = Temperature.resample(d, "stratum", HashFns.polyHash(col("id")),
        col("id"), alpha = 1.0, totalDocs = 10)
      .select($"stratum".as[String]).as[String].collect()
    assert(got.count(_ == "big") == 10 && !got.contains("tiny"))
  }

  test("resample: an empty input corpus yields an empty result, not an NPE") {
    // an incremental run whose upstream gates dropped everything must
    // flow through (max(quota) over zero strata is NULL)
    val d = corpus("big" -> 3).limit(0)
    val got = Temperature.resample(d, "stratum", HashFns.polyHash(col("id")),
      col("id"), alpha = 0.5, totalDocs = 10)
    assert(got.count() == 0L)
    assert(got.columns.contains("sample_rank"))
  }
}
