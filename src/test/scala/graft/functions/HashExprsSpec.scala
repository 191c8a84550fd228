package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the native hash expressions bit-exactly against the interpreted
 * higher-order-function compositions they replaced (round-1 q25/q27/q28
 * formulations) so the DuckDB oracle hashes cannot drift.
 */
class HashExprsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private val P = 1000000007L

  private def oldPolyHash(c: Column): Column =
    aggregate(transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % P)

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  private def oldShingles(ts: Column, n: Int): Column = array_distinct(
    filter(
      transform(ts, (x, i) =>
        when(i <= size(ts) - n,
          concat_ws(" ", (0 until n).map(k => element_at(ts, i + k + 1)): _*))
          .otherwise(lit(null))),
      x => x.isNotNull))

  private def sampleDf = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox the quick brown fox again",
      "one two",
      "  leading and trailing  ",
      "single",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "repeat repeat repeat repeat repeat"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("PolyHash matches the interpreted per-character fold") {
    val df = sampleDf.select(
      HashFns.polyHash(trim(col("text"))).as("fast"),
      oldPolyHash(trim(col("text"))).as("slow"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("PolyHash of empty string is 0 (matches fold over split('',''))") {
    import spark.implicits._
    val r = Seq("").toDF("t")
      .select(HashFns.polyHash(col("t")), oldPolyHash(col("t"))).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }

  test("PolyShingleHashes == polyHash over distinct string 3-gram shingles") {
    val fast = sampleDf.select(col("doc_id"),
      HashFns.polyShingleHashes(toks(col("text")), 3).as("hs"))
    val slow = sampleDf.select(col("doc_id"),
      transform(oldShingles(toks(col("text")), 3), sh => oldPolyHash(sh)).as("hs"))
    val f = fast.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val s = slow.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f == s)
  }

  test("PolyShingleHashesAll == polyHash over ALL shingle occurrences, position order") {
    // the counting twin (DSIR features): duplicates kept, position order
    def allShingles(ts: Column, n: Int): Column = filter(
      transform(ts, (x, i) =>
        when(i <= size(ts) - n,
          concat_ws(" ", (0 until n).map(k => element_at(ts, i + k + 1)): _*))
          .otherwise(lit(null))),
      x => x.isNotNull)
    for (n <- Seq(2, 3)) {
      val fast = sampleDf.select(col("doc_id"),
        HashFns.polyShingleHashesAll(toks(col("text")), n).as("hs"))
      val slow = sampleDf.select(col("doc_id"),
        transform(allShingles(toks(col("text")), n), sh => oldPolyHash(sh)).as("hs"))
      assert(fast.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap ==
        slow.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap, s"n=$n")
    }
    // and distinct-in-order of ALL == the distinct shingler
    val both = sampleDf.select(
      array_distinct(HashFns.polyShingleHashesAll(toks(col("text")), 3)).as("a"),
      HashFns.polyShingleHashes(toks(col("text")), 3).as("d")).collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("XxShingleHashes == xxhash64 over concat_ws of token windows") {
    def oldXx(ts: Column, n: Int): Column = array_distinct(filter(
      transform(ts, (x, i) =>
        when(i <= size(ts) - n,
          xxhash64(concat_ws(" ", (0 until n).map(k => element_at(ts, i + k + 1)): _*)))
          .otherwise(lit(null))),
      x => x.isNotNull))
    for (n <- Seq(2, 3, 4)) {
      val fast = sampleDf.select(col("doc_id"),
        HashFns.xxShingleHashes(toks(col("text")), n).as("hs"))
      val slow = sampleDf.select(col("doc_id"), oldXx(toks(col("text")), n).as("hs"))
      assert(fast.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap ==
        slow.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap, s"n=$n")
    }
  }

  test("window hashes (positional) == per-position HOF composition; distinct-in-order == shingle variants") {
    def oldXxWin(ts: Column, n: Int): Column = filter(
      transform(ts, (x, i) =>
        when(i <= size(ts) - n,
          xxhash64(concat_ws(" ", (0 until n).map(k => element_at(ts, i + k + 1)): _*)))
          .otherwise(lit(null))),
      x => x.isNotNull)
    def oldPolyWin(ts: Column, n: Int): Column =
      transform(oldShingles0(ts, n), sh => oldPolyHash(sh))
    def oldShingles0(ts: Column, n: Int): Column = filter(
      transform(ts, (x, i) =>
        when(i <= size(ts) - n,
          concat_ws(" ", (0 until n).map(k => element_at(ts, i + k + 1)): _*))
          .otherwise(lit(null))),
      x => x.isNotNull)
    for (n <- Seq(2, 3, 8)) {
      val got = sampleDf.select(col("doc_id"),
        HashFns.xxWindowHashes(toks(col("text")), n).as("xw"),
        HashFns.polyWindowHashes(toks(col("text")), n).as("pw"),
        oldXxWin(toks(col("text")), n).as("oxw"),
        oldPolyWin(toks(col("text")), n).as("opw"),
        array_distinct(HashFns.xxWindowHashes(toks(col("text")), n)).as("xd"),
        HashFns.xxShingleHashes(toks(col("text")), n).as("xs"),
        array_distinct(HashFns.polyWindowHashes(toks(col("text")), n)).as("pd"),
        HashFns.polyShingleHashes(toks(col("text")), n).as("ps")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](3), s"xx positional n=$n doc=${r.getLong(0)}")
        assert(r.getSeq[Long](2) == r.getSeq[Long](4), s"poly positional n=$n doc=${r.getLong(0)}")
        assert(r.getSeq[Long](5) == r.getSeq[Long](6), s"xx distinct-in-order n=$n doc=${r.getLong(0)}")
        assert(r.getSeq[Long](7) == r.getSeq[Long](8), s"poly distinct-in-order n=$n doc=${r.getLong(0)}")
      }
    }
  }

  test("SimHash64Expr matches the 64-fold aggregate composition") {
    def oldSimhash(text: Column): Column = {
      val hs = transform(toks(text), t => xxhash64(t))
      val bitSums = (0 until 64).map { j =>
        aggregate(hs, lit(0L), (acc, h) =>
          acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      }
      (0 until 64).map(j =>
        when(bitSums(j) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))).reduce(_ + _)
    }
    val df = sampleDf.select(
      HashFns.simhash64(toks(col("text"))).as("fast"),
      oldSimhash(col("text")).as("slow"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("SimHashPoly32Expr matches the explode + 32-aggregate composition (q27's original form)") {
    def oldPoly32(text: Column): Column = {
      val hs = transform(toks(text), t => HashFns.polyHash(t))
      val bitSums = (0 until 32).map { j =>
        aggregate(hs, lit(0L), (acc, h) =>
          acc + when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L))
      }
      (0 until 32).map(j =>
        when(bitSums(j) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))).reduce(_ + _)
    }
    val df = sampleDf.select(
      HashFns.simhashPoly32(toks(col("text"))).as("fast"),
      oldPoly32(col("text")).as("slow"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("DotF64 matches aggregate(zip_with) fold bit-exactly on doubles") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.5f, -3.25f), Array(0.5f, -1.5f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"), col("b").cast("array<double>").as("b"))
    val r = df.select(
      HashFns.dotF64(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("slow")).collect()
    r.foreach(row => assert(
      java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1))))
  }

  test("SignSignatureExpr matches the interpreted zip_with plane fold") {
    import spark.implicits._
    def oldPlaneComponent(table: Int, plane: Int, dim: Column): Column =
      (pmod(xxhash64(lit(table), lit(plane), dim), lit(2000001L)) - 1000000L)
        .cast("double") / 1000000.0
    def oldSig(v: Column, planes: Int, table: Int): Column =
      (0 until planes).map { p =>
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, i) => x * oldPlaneComponent(table, p, i)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val df = Seq(
      Array(0.1, -0.4, 2.5, 0.0, -1.25),
      Array(1.0, 1.0, 1.0),
      Array(-3.0)
    ).toDF("v")
    for (t <- Seq(0, 3, 17); p <- Seq(2, 6)) {
      val r = df.select(
        HashFns.signSignature(col("v"), p, t).as("fast"),
        oldSig(col("v"), p, t).as("slow")).collect()
      r.foreach(row => assert(row.getLong(0) == row.getLong(1), s"t=$t p=$p"))
    }
  }

  test("expressions survive whole-stage codegen (no fallback exception)") {
    // force the codegen path on a non-trivial plan
    val out = sampleDf
      .select(col("doc_id"), toks(col("text")).as("ts"), trim(col("text")).as("t"))
      .select(col("doc_id"),
        HashFns.polyHash(col("t")).as("ph"),
        HashFns.simhash64(col("ts")).as("sh"),
        size(HashFns.polyShingleHashes(col("ts"), 3)).as("nps"),
        size(HashFns.xxShingleHashes(col("ts"), 3)).as("nxs"))
      .filter(col("ph") >= 0)
    assert(out.count() == 7)
  }
}
