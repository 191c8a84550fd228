package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass text-repetition statistics (Gopher filters, Rae et al.
 * 2021 §A1.1). The original column plane composed interpreted HOFs whose
 * within-row frequency counts were O(lines²)/O(grams²) per document —
 * fine on short fixtures, quadratic death on real sf0.1 documents (q49
 * went from sub-second to >1000 s). This expression computes all four
 * fractions in one linear pass with open hashing, stays inside
 * whole-stage codegen via a static call, and is bit-equal to the HOF
 * forms (pinned in RepetitionSpec) and to the DuckDB oracle (q49/q50):
 *
 *  - lines     = split(text, "\n")            (limit -1: trailing empties kept)
 *  - tokens    = split(trim(text), "\\s+")    (trim strips ASCII spaces ONLY,
 *                                              matching Spark's trim / SQL trim)
 *  - length    = Unicode code points           (Spark length() semantics)
 *  - rounding  = BigDecimal.valueOf(x).setScale(4, HALF_UP)
 *                                              (Spark round(col, 4) semantics)
 */
object TextStatImpl {

  private def r4(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** See [[TokenCountExpr]]: size(split(trim(s), "\\s+")) as one
    * allocation-free byte scan. */
  def tokenCountFast(s: UTF8String): Long = {
    val t = s.trim() // ASCII space 0x20 only — Spark trim semantics
    val n = t.numBytes()
    if (n == 0) return 1L // split("") = [""]
    var runs = 0L
    var inRun = false
    var i = 0
    while (i < n) {
      val c = t.getByte(i)
      val ws = c == 32 || c == 9 || c == 10 || c == 11 || c == 12 || c == 13
      if (ws) { if (!inRun) { runs += 1; inRun = true } }
      else inRun = false
      i += 1
    }
    runs + 1L
  }

  private def codePoints(s: String): Long = s.codePointCount(0, s.length).toLong

  /** (dup_line_frac, dup_line_char_frac, top_bigram_frac, dup_trigram_frac) */
  def repetitionStats(s: UTF8String): InternalRow = {
    val text = s.toString
    val ls = text.split("\n", -1)
    val lineCounts = new java.util.HashMap[String, Integer](ls.length * 2)
    var i = 0
    while (i < ls.length) {
      lineCounts.merge(ls(i), Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      i += 1
    }
    val dupLineFrac =
      r4(1.0 - lineCounts.size.toDouble / math.max(ls.length, 1).toDouble)
    var allChars = 0L
    var dupChars = 0L
    i = 0
    while (i < ls.length) {
      val n = codePoints(ls(i))
      allChars += n
      if (lineCounts.get(ls(i)) > 1) dupChars += n
      i += 1
    }
    val dupLineCharFrac =
      r4(if (allChars > 0) dupChars.toDouble / allChars.toDouble else 0.0)

    val toks = s.trim().toString.split("\\s+", -1)
    // (positions, maxFreq, positions-with-freq>1) for word n-grams
    def gramStats(n: Int): (Long, Long, Long) = {
      val g = toks.length - (n - 1)
      if (g <= 0) return (0L, 0L, 0L)
      val counts = new java.util.HashMap[String, Integer](g * 2)
      val sb = new java.lang.StringBuilder
      var p = 0
      while (p < g) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(p + k))
          k += 1
        }
        counts.merge(sb.toString, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        p += 1
      }
      var maxFreq = 0L
      var dupPos = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next().toLong
        if (c > maxFreq) maxFreq = c
        if (c > 1) dupPos += c
      }
      (g.toLong, maxFreq, dupPos)
    }
    val (g2, max2, _) = gramStats(2)
    val topBigramFrac =
      r4(if (g2 > 0) math.min(max2.toDouble * 2.0 / (g2 + 1).toDouble, 1.0) else 0.0)
    val (g3, _, dup3) = gramStats(3)
    val dupTrigramFrac = r4(if (g3 > 0) dup3.toDouble / g3.toDouble else 0.0)

    new GenericInternalRow(Array[Any](dupLineFrac, dupLineCharFrac,
      topBigramFrac, dupTrigramFrac))
  }
}

/** struct(dup_line_frac, dup_line_char_frac, top_bigram_frac,
  * dup_trigram_frac) over a text column — one linear pass per row. */
/** Whitespace-token count of a string — EXACTLY
  * size(split(trim(text), "\\s+")) under Spark semantics (trim strips
  * ASCII space 0x20 only; java-regex \s is the 6 ASCII whitespace chars;
  * split keeps boundary empties, so count = maximal-\s-run count + 1,
  * with the empty trimmed string counting 1), but as ONE byte scan with
  * zero allocation — the old form materialized the whole token ARRAY per
  * row everywhere only a count was needed (Budget/Packing prefix scans,
  * q20/q96-style stats). ASCII byte compares are UTF-8 safe
  * (continuation bytes are >= 0x80). */
case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_count_fast"
  protected override def nullSafeEval(input: Any): Any =
    TextStatImpl.tokenCountFast(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatImpl.tokenCountFast($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"
  protected override def nullSafeEval(input: Any): Any =
    TextStatImpl.repetitionStats(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatImpl.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_trigram_frac", DoubleType, nullable = false)))
}

object TextStatFns {
  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(text)))
  // the .cast("string") preserves the coercion the size(split(trim(...)))
  // form performed implicitly on non-string inputs (a redundant cast on
  // an already-string column is elided by the optimizer); without it a
  // non-string column would ClassCastException at execution
  def tokenCountFast(text: Column): Column =
    ColumnBridge.column(TokenCountExpr(ColumnBridge.expression(text.cast("string"))))
}
