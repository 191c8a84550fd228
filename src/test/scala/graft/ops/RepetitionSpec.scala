package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RepetitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def metrics(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select($"doc_id",
        Repetition.duplicateLineFraction($"text").as("dlf"),
        Repetition.duplicateLineCharFraction($"text").as("dlcf"),
        Repetition.topBigramFraction($"text").as("tbf"),
        Repetition.dupTrigramFraction($"text").as("dtf"))
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)

  test("hand-computed goldens") {
    // doc 0: lines [ab, ab, cd] → dup 2/3 of lines are a dup pair:
    //   distinct 2 of 3 → dlf = 1 - 2/3 = 0.3333; dup chars 4 of 6 → 0.6667
    // tokens [ab, ab, cd]: bigrams ["ab ab","ab cd"] max 1 → tbf 2/3=0.6667
    //   trigram ["ab ab cd"] freq 1 → dtf 0
    // doc 1: "a b a b a b" bigrams [a b, b a, a b, b a, a b] max 3,
    //   T=6 → tbf 3*2/6 = 1.0; trigrams [aba,bab,aba,bab] all dup → 1.0
    // doc 2: one line, no dup anything
    val m = metrics(Seq("ab\nab\ncd", "a b a b a b", "unique words only here"))
    assert(m(0) == ((0L, 0.3333, 0.6667, 0.6667, 0.0)))
    assert(m(1) == ((1L, 0.0, 0.0, 1.0, 1.0)))
    assert(m(2) == ((2L, 0.0, 0.0, 0.5, 0.0)))
  }

  test("degenerate inputs: empty, single token, all-identical lines") {
    val m = metrics(Seq("", "solo", "x\nx\nx\nx"))
    assert(m(0) == ((0L, 0.0, 0.0, 0.0, 0.0)))
    assert(m(1) == ((1L, 0.0, 0.0, 0.0, 0.0)))
    // 4 identical lines: dlf = 1 - 1/4; all chars dup; \s+ split makes
    // the 4 lines 4 'x' tokens too: bigrams [x x]*3, max 3, raw ratio
    // 3*2/4 = 1.5 → capped to 1.0 (overlap can exceed the denominator)
    assert(m(2)._2 == 0.75 && m(2)._3 == 1.0 && m(2)._4 == 1.0 && m(2)._5 == 1.0)
  }

  test("native expression == the original HOF compositions (bit-equal, incl. rounding)") {
    import org.apache.spark.sql.Column
    def ls(t: Column) = split(t, "\n")
    def toks(t: Column) = split(trim(t), "\\s+")
    def grams(t: Column, n: Int) = {
      val ts = toks(t)
      val g = size(ts) - (n - 1)
      when(g <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), greatest(g, lit(1))),
          i => concat_ws(" ", slice(ts, i, lit(n)))))
    }
    def r4(c: Column) = round(c, 4)
    def hofDlf(t: Column) = r4(lit(1.0) - size(array_distinct(ls(t))).cast("double") /
      greatest(size(ls(t)).cast("double"), lit(1.0)))
    def hofDlcf(t: Column) = {
      val l = ls(t)
      val dup = aggregate(l, lit(0L), (acc, x) =>
        acc + when(size(filter(l, y => y === x)) > 1, length(x).cast("long")).otherwise(0L))
      val all = aggregate(l, lit(0L), (acc, x) => acc + length(x).cast("long"))
      r4(when(all > 0, dup.cast("double") / all.cast("double")).otherwise(0.0))
    }
    def hofTbf(t: Column) = {
      val gs = grams(t, 2)
      val mx = array_max(transform(gs, g => size(filter(gs, x => x === g))))
      r4(when(size(gs) > 0,
        least(mx.cast("double") * 2.0 / (size(gs) + 1).cast("double"), lit(1.0)))
        .otherwise(0.0))
    }
    def hofDtf(t: Column) = {
      val gs = grams(t, 3)
      val dp = size(filter(gs, g => size(filter(gs, x => x === g)) > 1))
      r4(when(size(gs) > 0, dp.cast("double") / size(gs).cast("double")).otherwise(0.0))
    }
    val texts = Seq(
      "ab\nab\ncd", "a b a b a b", "unique words only here", "", "solo",
      "x\nx\nx\nx", "  spaces  around\nand \t tabs between ",
      "\nleading newline x y\n", "国会 の 委員会 国会 の 委員会 国会 の")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select($"doc_id",
        Repetition.duplicateLineFraction($"text"),
        Repetition.duplicateLineCharFraction($"text"),
        Repetition.topBigramFraction($"text"),
        Repetition.dupTrigramFraction($"text"))
      .as[(Long, Double, Double, Double, Double)].collect().toSet
    val hof = df.select($"doc_id",
        hofDlf($"text"), hofDlcf($"text"), hofTbf($"text"), hofDtf($"text"))
      .as[(Long, Double, Double, Double, Double)].collect().toSet
    assert(native == hof)
  }

  test("DF plane == column plane on a mixed corpus") {
    val texts = Seq(
      "ab\nab\ncd", "a b a b a b", "unique words only here", "", "solo",
      "x\nx\nx\nx", "one two three one two three one two three",
      "line one\nline two\nline one\nline three")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val colPlane = df.select($"doc_id",
        Repetition.duplicateLineFraction($"text").as("dup_line_frac"),
        Repetition.duplicateLineCharFraction($"text").as("dup_line_char_frac"),
        Repetition.topBigramFraction($"text").as("top_bigram_frac"),
        Repetition.dupTrigramFraction($"text").as("dup_trigram_frac"))
      .as[(Long, Double, Double, Double, Double)].collect().toSet
    val dfPlane = Repetition.statsDF(df.repartition(5), "doc_id", "text")
      .as[(Long, Double, Double, Double, Double)].collect().toSet
    assert(dfPlane == colPlane)
  }
}
