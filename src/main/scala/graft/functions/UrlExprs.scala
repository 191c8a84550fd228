package graft.functions

import graft.urls.UrlCanon
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM entry points for the generated code (kept tiny and static). */
object UrlImpl {
  def canonicalize(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.canonicalize(u.toString))
  def resolve(base: UTF8String, href: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.resolve(base.toString, href.toString))
  def host(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.hostOf(u.toString))
}

/** RFC 3986 canonicalization as a native codegen'd expression — the same
  * normalizer the frontier uses (graft.urls.UrlCanon), exposed to the
  * DataFrame/SQL planes without a UDF boundary (stays inside whole-stage
  * codegen; Catalyst can fold it over literals and prune around it). */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "canonicalize_url"
  protected override def nullSafeEval(input: Any): Any =
    UrlImpl.canonicalize(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlImpl.canonicalize($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

/** href absolutization against a base URL (E2). */
case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "resolve_url"
  protected override def nullSafeEval(base: Any, href: Any): Any =
    UrlImpl.resolve(base.asInstanceOf[UTF8String], href.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => s"graft.functions.UrlImpl.resolve($b, $h)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ResolveUrl =
    copy(left = newLeft, right = newRight)
}

/** Host of a canonical URL. */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_host"
  protected override def nullSafeEval(input: Any): Any =
    UrlImpl.host(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlImpl.host($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
}

object UrlFns {
  def canonicalizeUrl(c: Column): Column =
    ColumnBridge.column(CanonicalizeUrl(ColumnBridge.expression(c)))
  def resolveUrl(base: Column, href: Column): Column =
    ColumnBridge.column(ResolveUrl(ColumnBridge.expression(base), ColumnBridge.expression(href)))
  def urlHost(c: Column): Column =
    ColumnBridge.column(UrlHost(ColumnBridge.expression(c)))
}

/**
 * SQL-plane registration of the engine's native functions, two ways:
 *
 *  - `GraftFunctions.register(spark)` on a live session;
 *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
 *    build time (the standard SparkSessionExtensions route).
 *
 * After either, `SELECT canonicalize_url(url), poly_hash(text) FROM …`
 * works from pure SQL.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  /** Arity-checked builder: wrong argument counts get a plan-time
    * AnalysisException instead of an IndexOutOfBounds (or, worse, a
    * silently ignored argument). */
  private def checked(name: String, arities: Set[Int])(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (!arities.contains(es.length))
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name,
            "expectedNum" -> arities.toSeq.sorted.mkString(" or "),
            "actualNum" -> es.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(es)
    }

  /** Literal int argument (e.g. the shingle width n). */
  private def litInt(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT, got $other")
  }

  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("canonicalize_url", info("canonicalize_url", "RFC 3986 canonical form"),
      checked("canonicalize_url", Set(1))(es => CanonicalizeUrl(es.head))),
    ("resolve_url", info("resolve_url", "absolutize href against base"),
      checked("resolve_url", Set(2))(es => ResolveUrl(es(0), es(1)))),
    ("url_host", info("url_host", "host of a canonical url"),
      checked("url_host", Set(1))(es => UrlHost(es.head))),
    ("poly_hash", info("poly_hash", "portable polynomial code-point hash"),
      checked("poly_hash", Set(1))(es => PolyHash(es.head))),
    ("poly_shingle_hashes", info("poly_shingle_hashes",
      "distinct word n-gram polynomial hashes (optional literal n, default 3)"),
      checked("poly_shingle_hashes", Set(1, 2))(es =>
        PolyShingleHashes(es.head,
          if (es.length > 1) litInt("poly_shingle_hashes", es(1)) else 3))),
    ("xx_shingle_hashes", info("xx_shingle_hashes",
      "distinct word n-gram xxhash64 (optional literal n, default 3)"),
      checked("xx_shingle_hashes", Set(1, 2))(es =>
        XxShingleHashes(es.head,
          if (es.length > 1) litInt("xx_shingle_hashes", es(1)) else 3))),
    ("simhash64", info("simhash64", "64-bit simhash of a token array"),
      checked("simhash64", Set(1))(es => SimHash64Expr(es.head))),
    ("dot_f64", info("dot_f64", "dot product of two double arrays"),
      checked("dot_f64", Set(2))(es => DotF64(es(0), es(1)))))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
