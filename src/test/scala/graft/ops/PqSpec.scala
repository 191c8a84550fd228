package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 6 vectors of dim 4; with m = 2 each splits into two 2-dim subvectors
  private def corpus = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 1.0)),
    (2L, Seq(0.0, 1.0, 1.0, 0.0)),
    (3L, Seq(1.0, 1.0, 0.0, 0.0)),
    (4L, Seq(0.5, 0.5, 0.5, 0.5)),
    (5L, Seq(-1.0, 0.0, 0.0, -1.0)),
    (6L, Seq(2.0, 2.0, 2.0, 2.0))
  ).toDF("id", "v")

  private def exactSq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }

  test("lossless regime: ksub >= corpus size makes encode/decode a roundtrip " +
    "and ADC equal to the exact squared distance") {
    val book = Pq.train(corpus, "id", "v", m = 2, ksub = 6)
    assert(book.dim == 4 && book.dsub == 2 && book.cb.length == 2)
    // every subvector of every row is itself a codebook entry, so the
    // quantizer is exact: decode(encode(x)) == x
    val decoded = Pq.decode(Pq.encode(corpus, "id", "v", book), book)
      .select($"id".as[Long], $"decoded".as[Seq[Double]]).collect().toMap
    val orig = corpus.as[(Long, Seq[Double])].collect().toMap
    orig.foreach { case (id, v) => assert(decoded(id) == v, s"roundtrip broke for $id") }
    // and ADC == brute-force exact squared distance for every pair
    val adc = Pq.adcTopK(corpus, Pq.encode(corpus, "id", "v", book), "id", "v", book, k = 5)
      .select($"query_id".as[Long], $"neighbor_id".as[Long], $"dist2".as[Double])
      .collect()
    assert(adc.length == 6 * 5)
    adc.foreach { case (q, n, d2) =>
      assert(math.abs(d2 - exactSq(orig(q), orig(n))) < 1e-12,
        s"ADC($q,$n)=$d2 != exact ${exactSq(orig(q), orig(n))}")
    }
  }

  test("codes are in range and deterministic across runs") {
    val book = Pq.train(corpus, "id", "v", m = 2, ksub = 3)
    val c1 = Pq.encode(corpus, "id", "v", book)
      .select($"id".as[Long], $"codes".as[Seq[Int]]).collect().toMap
    val c2 = Pq.encode(corpus, "id", "v", book)
      .select($"id".as[Long], $"codes".as[Seq[Int]]).collect().toMap
    assert(c1 == c2)
    c1.values.foreach { codes =>
      assert(codes.length == 2)
      codes.foreach(c => assert(c >= 0 && c < 3))
    }
  }

  test("argmin tie-break goes to the LOWER code") {
    // two identical centroids (duplicate seed vectors) — every vector is
    // equidistant to both, so the assignment must pick the lower code
    val dup = Seq(
      (1L, Seq(1.0, 1.0)),
      (2L, Seq(1.0, 1.0)),
      (3L, Seq(0.0, 5.0))
    ).toDF("id", "v")
    val book = Pq.train(dup, "id", "v", m = 1, ksub = 3)
    // seeds ordered by xxhash64(id): whichever order, ids 1 and 2 carry
    // the same vector — their two codebook entries are identical
    val same = book.cb(0).zipWithIndex.collect { case (cv, i) if cv == Seq(1.0, 1.0) => i }
    assert(same.length == 2)
    val codes = Pq.encode(dup, "id", "v", book)
      .select($"id".as[Long], $"codes".as[Seq[Int]]).collect().toMap
    assert(codes(1L).head == same.min && codes(2L).head == same.min)
  }

  test("Lloyd refinement does not increase total quantization error") {
    // a corpus with real cluster structure so refinement has work to do
    val pts = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Seq(base + (i % 5) * 0.1, base - (i % 3) * 0.1))
    }.toDF("id", "v")
    def totalErr(book: Pq.Codebook): Double =
      Pq.decode(Pq.encode(pts, "id", "v", book), book)
        .join(pts, Seq("id"))
        .select(Pq.sqDist(col("v").cast("array<double>"), col("decoded")).as("e"))
        .agg(sum("e")).as[Double].head()
    val e0 = totalErr(Pq.train(pts, "id", "v", m = 1, ksub = 2, iters = 0))
    val e2 = totalErr(Pq.train(pts, "id", "v", m = 1, ksub = 2, iters = 2))
    assert(e2 <= e0 + 1e-9, s"Lloyd made it worse: $e0 -> $e2")
  }

  test("IVF-PQ with exhaustive probe equals flat ADC; partial probe is a subset path") {
    val pts = (0 until 30).map { i =>
      (i.toLong, Seq((i % 7).toDouble, (i % 5).toDouble, (i % 3).toDouble, (i % 2).toDouble))
    }.toDF("id", "v")
    val book = Pq.train(pts, "id", "v", m = 2, ksub = 4)
    val queries = pts.filter($"id" % 10 === 0)
    val flat = Pq.adcTopK(queries, Pq.encode(pts, "id", "v", book), "id", "v", book, k = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val ivf = Pq.ivfPqTopK(queries, pts, "id", "v", book, k = 4,
      nlist = 4, nprobe = 4, kmeansIters = 1)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ivf == flat)
    // nprobe < nlist returns ranked results drawn from the probed lists
    // only — still k (or fewer) rows per query, distances still exact ADC
    val partial = Pq.ivfPqTopK(queries, pts, "id", "v", book, k = 4,
      nlist = 4, nprobe = 1)
      .as[(Long, Int, Long, Double)].collect()
    val flatDist = flat.map(r => (r._1, r._3) -> r._4).toMap
    partial.groupBy(_._1).values.foreach(rs => assert(rs.length <= 4))
    partial.foreach { case (q, _, n, d2) =>
      flatDist.get((q, n)).foreach(fd => assert(fd == d2))
    }
  }

  test("native kernels are bit-identical to the definitional HOF folds") {
    // irrational-ish components make any fold-order or grouping drift
    // visible in the low mantissa bits; raw == comparison, no tolerance
    val pts = (0 until 64).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 7 + j) * math.sqrt(j + 1)))
    }.toDF("id", "v")
    val book = Pq.train(pts, "id", "v", m = 4, ksub = 7)
    val nat = Pq.encode(pts, "id", "v", book)
      .select($"id".as[Long], $"codes".as[Seq[Int]]).collect().toMap
    val hof = Pq.encodeHof(pts, "id", "v", book)
      .select($"id".as[Long], $"codes".as[Seq[Int]]).collect().toMap
    assert(nat == hof)
    val codes = Pq.encode(pts, "id", "v", book)
    val qv = pts.select($"id".as("qid"), $"v".cast("array<double>").as("qv"))
    val joined = qv.crossJoin(codes.withColumnRenamed("id", "nid"))
    import org.apache.spark.sql.functions.col
    val both = joined.select($"qid", $"nid",
        graft.functions.PqFns.pqAdcDist(col("qv"), col("codes"), book.nativeArray).as("dn"),
        Pq.adcDistHof(col("qv"), col("codes"), book).as("dh"))
      .as[(Long, Long, Double, Double)].collect()
    assert(both.length == 64 * 64)
    both.foreach { case (q, n, dn, dh) =>
      assert(java.lang.Double.doubleToLongBits(dn) == java.lang.Double.doubleToLongBits(dh),
        s"ADC($q,$n) native $dn != hof $dh")
    }
  }

  test("invalid shapes fail fast") {
    intercept[IllegalArgumentException] {
      Pq.train(corpus, "id", "v", m = 3, ksub = 2) // 4 % 3 != 0
    }
    intercept[IllegalArgumentException] {
      Pq.train(corpus.filter(lit(false)), "id", "v", m = 2, ksub = 2)
    }
  }
}
