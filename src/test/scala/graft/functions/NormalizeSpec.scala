package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every fixture is constructed from explicit code points (ASCII-only
  * source) so no editor/toolchain normalization can silently rewrite the
  * decomposed forms under test. */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cp(points: Int*): String =
    points.map(c => new String(Character.toChars(c))).mkString

  private def run(col: org.apache.spark.sql.Column, inputs: String*): Seq[String] =
    inputs.toDF("t").select(col.as("o")).as[String].collect().toSeq

  private val eAcuteComposed = "caf" + cp(0xE9)      // cafe with composed e-acute
  private val eAcuteDecomposed = "cafe" + cp(0x301)  // e + combining acute
  private val gaComposed = cp(0x30AC)                // katakana GA
  private val gaDecomposed = cp(0x30AB, 0x3099)      // KA + combining voiced mark

  test("NFC composes decomposed graphemes, leaves composed text alone") {
    val out = run(NormalizeFns.nfc($"t"),
      eAcuteDecomposed, eAcuteComposed, gaDecomposed)
    assert(out == Seq(eAcuteComposed, eAcuteComposed, gaComposed))
  }

  test("NFKC additionally folds compatibility forms (full-width, half-width kana, circled)") {
    val fullWidthABC = cp(0xFF21, 0xFF22, 0xFF23)
    val halfWidthTesuto = cp(0xFF83, 0xFF7D, 0xFF84)
    val katakanaTesuto = cp(0x30C6, 0x30B9, 0x30C8)
    val circled12 = cp(0x2460, 0x2461)
    val out = run(NormalizeFns.nfkc($"t"),
      fullWidthABC, halfWidthTesuto, circled12, eAcuteDecomposed)
    assert(out == Seq("ABC", katakanaTesuto, "12", eAcuteComposed))
    // NFC must NOT fold compatibility forms
    assert(run(NormalizeFns.nfc($"t"), cp(0xFF21)) == Seq(cp(0xFF21)))
  }

  test("null-safe and idempotent") {
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, "plain"))
      .toDF("id", "t")
      .select(NormalizeFns.nfkc($"t").as("o")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getString(0) == "plain")
    // half-width KA + voiced mark -> composed GA; then a fixpoint
    val once = run(NormalizeFns.nfkc($"t"), cp(0xFF76, 0xFF9E) + "ta")
    assert(once == Seq(gaComposed + "ta"))
    assert(run(NormalizeFns.nfkc($"t"), once.head) == once)
  }
}
