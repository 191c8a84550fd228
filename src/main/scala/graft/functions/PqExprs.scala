package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Native product-quantization kernels (see [[graft.ops.Pq]] — Jégou et
 * al. TPAMI 2011). These are the codegen'd twins of the zip_with +
 * aggregate higher-order-function compositions Pq started with: HOFs
 * evaluate one interpreted lambda call per element, which puts ~m·dsub
 * lambda dispatches on every ADC pair — at 500k pairs × 64 dims that
 * interpretation dominated q89/q90. The loops below accumulate in the
 * EXACT same order and grouping as the HOF folds (per-subspace partial
 * from 0.0, partials added in subspace order; (x−y)·(x−y), never pow),
 * so every double — and therefore every code, rank, and oracle hash —
 * is bit-identical (pinned in PqSpec). The codebook is a constructor
 * value, not a child expression: O(ksub·D) doubles embedded in the plan
 * and shipped once per executor via the codegen reference table.
 */
object PqImpl {

  /** Per-subspace squared L2 between v[s·dsub ..] and the centroid,
    * accumulated in index order from 0.0 — the HOF sqDist fold. */
  private def subDist(v: ArrayData, off: Int, cv: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < cv.length) {
      val d = v.getDouble(off + i) - cv(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Argmin code per subspace; strict `<` keeps the first (lowest) code
    * on ties — the array_min(struct(d2, code)) tie-break. All-NaN
    * distances also land on code 0, matching Spark's NaN ordering. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val codes = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = cb(s)
      var best = 0
      var bestD = subDist(v, off, book(0))
      var c = 1
      while (c < book.length) {
        val d2 = subDist(v, off, book(c))
        if (d2 < bestD) { best = c; bestD = d2 }
        c += 1
      }
      codes(s) = best
      off += book(0).length
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC distance: per-subspace partial from 0.0, partials added in
    * subspace order — the aggregate(sequence(0, m-1), ...) fold. */
  def adcDist(qv: ArrayData, codes: ArrayData, cb: Array[Array[Array[Double]]]): Double = {
    var acc = 0.0
    var s = 0
    var off = 0
    while (s < cb.length) {
      val cv = cb(s)(codes.getInt(s))
      acc += subDist(qv, off, cv)
      off += cv.length
      s += 1
    }
    acc
  }
}

/** codes = per-subspace argmin against the embedded codebook. */
case class PqEncodeCodes(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  protected override def nullSafeEval(input: Any): Any =
    PqImpl.encode(input.asInstanceOf[ArrayData], cb)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqImpl.encode($c, $cbRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** ADC distance between a raw query vector and an m-code row. */
case class PqAdcDist(left: Expression, right: Expression, cb: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dist"
  protected override def nullSafeEval(qv: Any, codes: Any): Any =
    PqImpl.adcDist(qv.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], cb)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    defineCodeGen(ctx, ev, (q, c) => s"graft.functions.PqImpl.adcDist($q, $c, $cbRef)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcDist =
    copy(left = newLeft, right = newRight)
}

object PqFns {
  def pqEncode(v: Column, cb: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeCodes(ColumnBridge.expression(v), cb))
  def pqAdcDist(qv: Column, codes: Column, cb: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcDist(ColumnBridge.expression(qv), ColumnBridge.expression(codes), cb))
}
