package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hash-heavy training-data operators
 * (MinHash shingling, SimHash, fingerprints, dot products).
 *
 * Why these exist: the same semantics are expressible with
 * `aggregate(transform(split(c, ""), ...))` higher-order-function
 * compositions, but Catalyst HOF lambdas are *interpreted* — a per-character
 * fold materializes one UTF8String per character and re-evaluates the
 * lambda through the interpreter for each element (q25 in round 1 spent
 * 180 s hashing ~26k shingles). Each expression here runs the identical
 * math in one tight JVM loop and participates in whole-stage codegen via
 * a static call, so the hot path stays inside generated code.
 *
 * Semantics are bit-identical to the HOF versions they replace (pinned by
 * HashExprsSpec against the old compositions and by the DuckDB oracle):
 *  - [[PolyHash]]        == aggregate(transform(split(s,""), ascii), 0, (a,c)=>(a*31+c)%P)
 *  - [[PolyShingleHashes]] == distinct polyHash over space-joined word n-grams
 *  - [[XxShingleHashes]] == array_distinct(xxhash64(concat_ws(" ", t_i..t_{i+n-1})))
 *  - [[SimHash64]]       == 64-bit simhash over xxhash64(token) bit tallies
 *  - [[DotF64]]          == aggregate(zip_with(a,b,_*_), 0.0, _+_) (same fold order)
 */
object HashImpl {
  final val P: Long = 1000000007L
  private final val Seed: Long = 42L // Spark's xxhash64 default seed

  /** Polynomial code-point hash: acc = (acc*31 + codePoint) % P, left-to-right.
    * Matches DuckDB `list_reduce(... unicode(ch) ...)` on the oracle side. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** polyHash of tokens(from..from+n-1) joined with a single space —
    * identical to polyHash(t0 + " " + t1 + ... ) without materializing
    * the joined string. */
  private def polyHashShingle(toks: Array[String], from: Int, n: Int): Long = {
    var acc = 0L
    var k = 0
    while (k < n) {
      if (k > 0) acc = (acc * 31 + 32L) % P // ' '
      val t = toks(from + k)
      var i = 0
      val len = t.length
      while (i < len) {
        val cp = t.codePointAt(i)
        acc = (acc * 31 + cp) % P
        i += Character.charCount(cp)
      }
      k += 1
    }
    acc
  }

  private def distinctInOrder(hs: Array[Long], m: Int): ArrayData = {
    val seen = new java.util.HashSet[java.lang.Long](Math.max(16, m * 2))
    val out = new Array[Long](m)
    var n = 0
    var i = 0
    while (i < m) {
      if (seen.add(hs(i))) { out(n) = hs(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  /** POSITIONAL polynomial window hashes: one hash per window position,
    * in order, repeats kept (index i = hash of tokens i..i+n-1). The
    * positional form backs passage-level dedup, where the array index is
    * the window's token offset and repeated windows must stay visible. */
  def polyWindowHashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val hs = new Array[Long](cnt)
    i = 0
    while (i < cnt) { hs(i) = polyHashShingle(toks, i, n); i += 1 }
    new GenericArrayData(hs)
  }

  /** POSITIONAL xxhash64 window hashes (seed 42): one hash per window
    * position, in order, repeats kept — the production-scale twin of
    * [[polyWindowHashes]]. */
  def xxWindowHashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    val hs = new Array[Long](cnt)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < cnt) {
      var k = 0
      while (k < n) { window(k) = toks(i + k); k += 1 }
      hs(i) = XXH64.hashUTF8String(UTF8String.concatWs(space, window: _*), Seed)
      i += 1
    }
    new GenericArrayData(hs)
  }

  /** Distinct polynomial hashes of word n-gram shingles, first-occurrence
    * order (array_distinct semantics). */
  def polyShingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val hs = new Array[Long](cnt)
    i = 0
    while (i < cnt) { hs(i) = polyHashShingle(toks, i, n); i += 1 }
    distinctInOrder(hs, cnt)
  }

  /** ALL polynomial shingle hashes, position order, duplicates kept — the
    * occurrence-counting twin of [[polyShingleHashes]] (DSIR-style hashed
    * n-gram features need counts, not presence). */
  def polyShingleHashesAll(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val hs = new Array[Long](cnt)
    i = 0
    while (i < cnt) { hs(i) = polyHashShingle(toks, i, n); i += 1 }
    new GenericArrayData(hs)
  }

  /** Distinct xxhash64 (seed 42, Spark-compatible) of space-joined word
    * n-gram shingles, first-occurrence order. */
  def xxShingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    val hs = new Array[Long](cnt)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < cnt) {
      var k = 0
      while (k < n) { window(k) = toks(i + k); k += 1 }
      val joined = UTF8String.concatWs(space, window: _*)
      hs(i) = XXH64.hashUTF8String(joined, Seed)
      i += 1
    }
    distinctInOrder(hs, cnt)
  }

  /** 64-bit SimHash over xxhash64(token): tally each bit (+1/-1), set the
    * result bit where the tally is >= 0. Empty input -> all bits set. */
  def simhash64(arr: ArrayData): Long = {
    val m = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** 32-bit SimHash over polyHash(token) — the PORTABLE (DuckDB-oracle
    * matching) twin of [[simhash64]]: bit j of each token's polynomial
    * hash votes +1/-1, the result bit is set where the tally is >= 0.
    * Identical to the explode + 32-aggregate-column composition it
    * replaces (q27's original form): one loop per document instead of a
    * shuffle of every token. */
  def simhashPoly32(arr: ArrayData): Long = {
    val m = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < m) {
      val h = polyHash(arr.getUTF8String(i))
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** MinHash signature over a shingle-hash array: m_k = min over shingles
    * of pmod(pmod(h, P)·(2k+3) + (7k+11), P), P = 1000000007 — the exact
    * integer sequence of the explode + pmod + groupBy(min ×k) composition
    * it replaces ([[graft.ops.Dedup.minhashSignature]] round-1 form), ONE
    * loop per document instead of a corpus-sized shingle exchange. Empty
    * input → EMPTY array (callers drop those rows up front, matching the
    * explode's row elimination; a null return would lie to codegen's
    * nullIntolerant tracking). */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val P = 1000000007L
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      val hp = java.lang.Math.floorMod(arr.getLong(i), P)
      var k = 0
      while (k < numHashes) {
        val v = (hp * (2 * k + 3) + (7 * k + 11)) % P // operands ≥ 0: % = pmod
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Sequential-order dot product of two double arrays (fold order matches
    * aggregate(zip_with(...)) so doubles are bit-identical). Iterates over
    * the shorter length. */
  def dotF64(a: ArrayData, b: ArrayData): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Sign-LSH signature of a double vector under hash-derived hyperplanes:
    * plane component (table, plane, dim) = (xxhash64(table, plane, dim)
    * pmod 2000001 - 10^6) / 10^6 — identical values and fold order to the
    * interpreted composition it replaces (Ann.signSignature round 1). */
  def signSignature(v: ArrayData, planes: Int, table: Int): Long = {
    val n = v.numElements()
    val tSeed = XXH64.hashInt(table, Seed)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val pSeed = XXH64.hashInt(p, tSeed)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashInt(i, pSeed)
        val comp = (Math.floorMod(h, 2000001L) - 1000000L).toDouble / 1000000.0
        acc += v.getDouble(i) * comp
        i += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Polynomial code-point hash of a string column (cross-engine portable:
  * identical to DuckDB's unicode()-fold; see QueriesB.polyHashSql). */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.polyHash(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Distinct polynomial hashes of word n-gram shingles of a token array. */
case class PolyShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_shingle_hashes"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.polyShingleHashes(input.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.polyShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): PolyShingleHashes =
    copy(child = newChild)
}

/** [[PolyShingleHashes]] without the distinct: every shingle occurrence,
  * position order (the counting form — DSIR hashed n-gram features). */
case class PolyShingleHashesAll(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_shingle_hashes_all"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.polyShingleHashesAll(input.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.polyShingleHashesAll($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): PolyShingleHashesAll =
    copy(child = newChild)
}

/** Distinct xxhash64 of word n-gram shingles of a token array (production
  * 64-bit variant; seed-42 compatible with Spark's xxhash64). */
case class PolyWindowHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_window_hashes"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.polyWindowHashes(input.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.polyWindowHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): PolyWindowHashes =
    copy(child = newChild)
}

case class XxWindowHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "xx_window_hashes"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.xxWindowHashes(input.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.xxWindowHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): XxWindowHashes =
    copy(child = newChild)
}

case class XxShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "xx_shingle_hashes"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.xxShingleHashes(input.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.xxShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): XxShingleHashes =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (single pass, one loop per document). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.simhash64(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Portable 32-bit SimHash of a token array (polyHash votes; oracle twin). */
case class SimHashPoly32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_poly32"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.simhashPoly32(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.simhashPoly32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashPoly32Expr =
    copy(child = newChild)
}

/** MinHash signature array of a shingle-hash array column (one pass per
  * row; EMPTY array on an empty input — see HashImpl.minhashSig). */
case class MinhashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.minhashSig(input.asInstanceOf[ArrayData], numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.minhashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

/** Sign-LSH signature of an array<double> column (see HashImpl.signSignature). */
case class SignSignatureExpr(child: Expression, planes: Int, table: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_signature"
  protected override def nullSafeEval(input: Any): Any =
    HashImpl.signSignature(input.asInstanceOf[ArrayData], planes, table)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.signSignature($c, $planes, $table)")
  override protected def withNewChildInternal(newChild: Expression): SignSignatureExpr =
    copy(child = newChild)
}

/** Dot product of two array<double> columns in index order. */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_f64"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.dotF64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.dotF64($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

/** Column-space entry points for the native expressions. */
object HashFns {
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  def polyHash(c: Column): Column = ColumnBridge.column(PolyHash(ex(c)))
  def polyShingleHashes(tokens: Column, n: Int = 3): Column =
    ColumnBridge.column(PolyShingleHashes(ex(tokens), n))
  def polyShingleHashesAll(tokens: Column, n: Int = 3): Column =
    ColumnBridge.column(PolyShingleHashesAll(ex(tokens), n))
  def xxShingleHashes(tokens: Column, n: Int = 3): Column =
    ColumnBridge.column(XxShingleHashes(ex(tokens), n))
  def polyWindowHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(PolyWindowHashes(ex(tokens), n))
  def xxWindowHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(XxWindowHashes(ex(tokens), n))
  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinhashSigExpr(ex(shingleHashes), numHashes))
  def simhash64(tokens: Column): Column = ColumnBridge.column(SimHash64Expr(ex(tokens)))
  def simhashPoly32(tokens: Column): Column = ColumnBridge.column(SimHashPoly32Expr(ex(tokens)))
  def dotF64(a: Column, b: Column): Column = ColumnBridge.column(DotF64(ex(a), ex(b)))
  def signSignature(v: Column, planes: Int, table: Int): Column =
    ColumnBridge.column(SignSignatureExpr(ex(v), planes, table))
}
