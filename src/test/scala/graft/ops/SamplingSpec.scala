package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    (i.toLong, if (i % 3 == 0) "ja" else if (i % 3 == 1) "en" else "de")
  }.toDF("doc_id", "lang")
    .withColumn("h", xxhash64(col("doc_id")))

  test("hashSample is deterministic, partition-invariant, and ~fraction sized") {
    val df = corpus(2000)
    val a = Sampling.hashSample(df, col("h"), 0.2).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(13), col("h"), 0.2).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 400) < 80) // ±4 sigma-ish
    assert(Sampling.hashSample(df, col("h"), 0.0).count() == 0)
    assert(Sampling.hashSample(df, col("h"), 1.0).count() == 2000)
  }

  test("quotaPerStratum: prefiltered plan == unprefiltered window, exact") {
    val df = corpus(1500)
    def res(pre: Boolean) =
      Sampling.quotaPerStratum(df, "lang", col("h"), col("doc_id"), k = 25,
        prefilter = pre)
        .select($"lang", $"doc_id", $"sample_rank")
        .as[(String, Long, Int)].collect().toSet
    val full = res(pre = false)
    assert(res(pre = true) == full)
    assert(full.groupBy(_._1).forall(_._2.size == 25))
  }

  test("quotaPerStratum rescue path: an over-tight prefilter still yields the exact sample") {
    val df = corpus(900)
    // safety = 0 forces __thr ≈ 64/n·M buckets — usually fewer than k
    // survivors per stratum, so the rescue branch must fire and re-window
    // those strata unfiltered
    val tight = Sampling.quotaPerStratum(df, "lang", col("h"), col("doc_id"),
        k = 50, prefilter = true, safety = 0.0)
      .select($"lang", $"doc_id", $"sample_rank")
      .as[(String, Long, Int)].collect().toSet
    val full = Sampling.quotaPerStratum(df, "lang", col("h"), col("doc_id"),
        k = 50, prefilter = false)
      .select($"lang", $"doc_id", $"sample_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(tight == full)
  }

  test("quotaPerStratum: NULL strata survive the prefiltered plan") {
    val df = (0 until 300).map { i =>
      (i.toLong, if (i % 5 == 0) null else if (i % 2 == 0) "en" else "ja")
    }.toDF("doc_id", "lang")
      .withColumn("h", xxhash64(col("doc_id")))
    def res(pre: Boolean) =
      Sampling.quotaPerStratum(df, "lang", col("h"), col("doc_id"), k = 15,
        prefilter = pre)
        .select($"lang", $"doc_id", $"sample_rank")
        .as[(Option[String], Long, Int)].collect().toSet
    val full = res(pre = false)
    assert(res(pre = true) == full)
    assert(full.count(_._1.isEmpty) == 15) // the null stratum is sampled too
  }

  test("quotaPerStratum: a stratum the prefilter empties entirely is rescued") {
    // every 'dup' row carries the same top-bucket hash (duplicated content
    // hashed identically — the degenerate real-world case): with safety=0
    // the threshold keeps none of them, so the zero-survivor rescue must
    // fire or the stratum would vanish from the sample
    val df = (0 until 200).map(i => (i.toLong, if (i < 100) "dup" else "ok"))
      .toDF("doc_id", "lang")
      .withColumn("h",
        when(col("lang") === "dup", lit(999999L)).otherwise(xxhash64(col("doc_id"))))
    def res(pre: Boolean) =
      Sampling.quotaPerStratum(df, "lang", col("h"), col("doc_id"), k = 10,
        prefilter = pre, safety = 0.0)
        .select($"lang", $"doc_id", $"sample_rank")
        .as[(String, Long, Int)].collect().toSet
    val full = res(pre = false)
    assert(res(pre = true) == full)
    assert(full.count(_._1 == "dup") == 10)
  }

  test("quotaPerStratum: strata smaller than k keep all their rows, ranked") {
    val df = Seq((1L, "ja"), (2L, "ja"), (3L, "en")).toDF("doc_id", "lang")
      .withColumn("h", xxhash64(col("doc_id")))
    val out = Sampling.quotaPerStratum(df, "lang", col("h"), col("doc_id"), k = 10)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    assert(out == Set(("ja", 1L), ("ja", 2L), ("en", 3L)))
  }
}
