package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def root() = SparkTestSession.tmpDir("bloomdedup")
  private val cfg = BloomDedup.Config(m = 1L << 20, k = 4)

  private def gate(rows: Seq[(Long, Long, String)], dir: String) =
    BloomDedup.gateParagraphs(spark,
      rows.toDF("doc_id", "par_idx", "par"), "doc_id", dir, cfg)
      .as[(Long, Long, String, String)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap

  test("positions: k probes, distinct, all within [0, m)") {
    val ps = Seq("alpha", "beta", "gamma").toDF("par")
      .select(BloomDedup.positions(xxhash64(col("par")),
        xxhash64(lit("bff"), col("par")), cfg).as("ps"))
      .as[Seq[Long]].collect()
    assert(ps.forall(p => p.nonEmpty && p.size <= cfg.k))
    assert(ps.forall(_.forall(x => x >= 0 && x < cfg.m)))
    assert(ps.forall(p => p.distinct.size == p.size))
  }

  test("within-batch: one min-(doc,offset) witness survives, the rest are dup_batch") {
    val v = gate(Seq(
      (2L, 0L, "same paragraph"), (1L, 3L, "same paragraph"),
      (1L, 1L, "same paragraph"), (3L, 0L, "unique paragraph")), root())
    assert(v((1L, 1L)) == "kept")
    assert(v((1L, 3L)) == "dup_batch")
    assert(v((2L, 0L)) == "dup_batch")
    assert(v((3L, 0L)) == "kept")
  }

  test("cross-batch: a seeded paragraph is dup_bloom, a novel one is kept") {
    val dir = root()
    gate(Seq((1L, 0L, "seeded body"), (1L, 1L, "other body")), dir)
    val v = gate(Seq((9L, 0L, "seeded body"), (9L, 1L, "fresh body")), dir)
    assert(v((9L, 0L)) == "dup_bloom")
    assert(v((9L, 1L)) == "kept")
  }

  test("a rejected paragraph never extends the filter; replay is at-most-once") {
    val dir = root()
    gate(Seq((1L, 0L, "seeded body")), dir)
    // batch 2: its dup_bloom row must not (re)strengthen state; its
    // survivor does — so replaying batch 2 sees the survivor as dup_bloom
    val v2 = gate(Seq((5L, 0L, "seeded body"), (5L, 1L, "novel body")), dir)
    assert(v2((5L, 0L)) == "dup_bloom" && v2((5L, 1L)) == "kept")
    val v3 = gate(Seq((5L, 0L, "seeded body"), (5L, 1L, "novel body")), dir)
    assert(v3((5L, 1L)) == "dup_bloom")
  }

  test("m=1 degenerates to drop-everything-after-the-first: the conservative FP direction") {
    val dir = root()
    val tiny = BloomDedup.Config(m = 1, k = 3)
    BloomDedup.gateParagraphs(spark,
      Seq((1L, 0L, "first ever")).toDF("doc_id", "par_idx", "par"),
      "doc_id", dir, tiny)
    val v = BloomDedup.gateParagraphs(spark,
      Seq((2L, 0L, "completely unrelated")).toDF("doc_id", "par_idx", "par"),
      "doc_id", dir, tiny)
      .as[(Long, Long, String, String)].collect()
    assert(v.head._4 == "dup_bloom") // over-drop, never under-drop
  }

  test("filter state is bounded by m, not by corpus size") {
    val dir = root()
    val tiny = BloomDedup.Config(m = 8, k = 2)
    val rows = (0L until 200L).map(i => (i, 0L, s"paragraph number $i"))
    BloomDedup.gateParagraphs(spark,
      rows.toDF("doc_id", "par_idx", "par"), "doc_id", dir, tiny)
    val state = new graft.sinks.SnapshotTable(spark, dir).read()
    assert(state.count() <= 8)
    assert(state.select(col("pos")).as[Long].collect().forall(p => p >= 0 && p < 8))
  }

  test("doc rebuild: kept paragraphs re-join in original order; all-dup docs come back empty") {
    val dir = root()
    BloomDedup.bloomParagraphDedup(spark,
      Seq((1L, "alpha one\nbeta two")).toDF("doc_id", "text"),
      "doc_id", "text", dir, cfg)
    val out = BloomDedup.bloomParagraphDedup(spark,
      Seq(
        (10L, "gamma three\nalpha one\ndelta four"),
        (11L, "alpha one\nbeta two")).toDF("doc_id", "text"),
      "doc_id", "text", dir, cfg)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(10L)._2 == "gamma three\ndelta four")
    assert((out(10L)._3, out(10L)._4, out(10L)._6) == ((3L, 2L, 1L)))
    assert(out(11L)._2 == "")
    // doc 11's "alpha one" loses the within-batch witness race to doc 10
    // (min doc wins) -> dup_batch; its "beta two" dies on the filter
    assert((out(11L)._3, out(11L)._4, out(11L)._5, out(11L)._6) == ((2L, 0L, 1L, 1L)))
  }

  test("empty paragraphs vanish in the split; par_idx keeps original positions") {
    val pars = BloomDedup.paragraphs(
      Seq((1L, "first\n\n  \nsecond")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, String)].collect().sortBy(_._2)
    assert(pars.toSeq == Seq((1L, 0L, "first"), (1L, 3L, "second")))
  }
}
