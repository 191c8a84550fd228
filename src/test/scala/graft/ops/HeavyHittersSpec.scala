package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sequential MG sketch honors the classic guarantees") {
    // stream: token "hot" 40×, "warm" 25×, 100 distinct singletons; k = 8
    val stream = Seq.fill(40)("hot") ++ Seq.fill(25)("warm") ++
      (0 until 100).map(i => s"cold_$i")
    val sk = stream.foldLeft(HeavyHitters.MgSketch.empty(8))(_.add(_))
    assert(sk.n == 165L)
    assert(sk.counters.size <= 8)
    val n = stream.length
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // one-sided error: est <= true, and true - est <= n/(k+1)
    sk.counters.foreach { case (t, est) =>
      val tc = trueCounts(t)
      assert(est <= tc, s"$t overestimated: $est > $tc")
      assert(tc - est <= n / 9, s"$t undercounted past the bound")
    }
    // no false negatives above the threshold: count > n/(k+1) must survive
    trueCounts.filter(_._2 > n / 9).keys.foreach { t =>
      assert(sk.counters.contains(t), s"true heavy hitter $t dropped")
    }
  }

  test("merge preserves the bound (mergeable-summaries combine)") {
    val a = (Seq.fill(30)("x") ++ (0 until 50).map(i => s"a_$i"))
      .foldLeft(HeavyHitters.MgSketch.empty(6))(_.add(_))
    val b = (Seq.fill(20)("x") ++ Seq.fill(15)("y") ++ (0 until 50).map(i => s"b_$i"))
      .foldLeft(HeavyHitters.MgSketch.empty(6))(_.add(_))
    val m = a.merge(b)
    assert(m.n == a.n + b.n)
    assert(m.counters.size <= 6)
    // x: true 50 of n=165; bound n/(k+1) = 165/7 = 23 → x must survive with
    // est in [50 - 23, 50]
    val est = m.counters.getOrElse("x", 0L)
    assert(est >= 50L - 165L / 7 && est <= 50L, s"x estimate $est out of range")
    intercept[IllegalArgumentException] {
      a.merge(HeavyHitters.MgSketch.empty(5))
    }
  }

  test("distributed two-pass equals brute force on a skewed corpus") {
    // 8 partitions, heavy tokens h0..h4 (600..1000×) on a 5000-singleton tail
    val rows = (0 until 5).flatMap(h => Seq.fill(600 + h * 100)(s"h$h")) ++
      (0 until 5000).map(i => s"tail_$i")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("tok")
    val q = 20 // threshold = ceil(n/20)
    val got = HeavyHitters.heavyHitters(df, "tok", q)
      .as[(String, Long)].collect().toSeq
    val n = rows.length
    val thr = (n + q - 1) / q
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toSeq.sortBy { case (t, c) => (-c, t) }
    assert(got == want)
  }

  test("sketch via the typed Aggregator matches a driver-side fold bound-wise") {
    val rows = (Seq.fill(200)("big") ++ (0 until 300).map(i => s"s_$i"))
    val df = spark.sparkContext.parallelize(rows, 4).toDF("tok")
    val sk = HeavyHitters.sketch(df, "tok", k = 10)
    assert(sk.n == rows.length.toLong)
    assert(sk.counters.size <= 10)
    // "big" is 200 of 500; bound 500/11 = 45 → must be present
    assert(sk.counters.contains("big"))
    assert(sk.counters("big") <= 200L && sk.counters("big") >= 200L - 500L / 11)
  }

  test("empty input and no-qualifier cases return empty results") {
    val empty = Seq.empty[String].toDF("tok")
    assert(HeavyHitters.heavyHitters(empty, "tok", 10).count() == 0L)
    // 100 singletons, threshold ceil(100/10) = 10 → nobody qualifies
    val flat = (0 until 100).map(i => s"u_$i").toDF("tok")
    assert(HeavyHitters.heavyHitters(flat, "tok", 10).count() == 0L)
  }
}
