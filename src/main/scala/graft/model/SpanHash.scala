package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/**
 * Strong validator over a document's span sequence — the engine's analog
 * of an HTTP entity tag (the reference gets revalidation for free from
 * Scrapy's HTTP cache, /root/reference/crawler/settings.py:84-86; a
 * 10^10-URL crawler revalidates explicitly because re-downloading
 * unchanged bodies is the dominant recrawl cost).
 *
 * The SAME hash is computable on both sides of the fetch boundary:
 *
 *  - [[column]] — a codegen'd Catalyst expression over a
 *    `array<struct<kind,text,media_ref,offset>>` spans column (builtin
 *    transform/concat_ws/array_join/xxhash64 only — no UDF), used by the
 *    history/plan side ([[graft.ops.Revalidate]]);
 *  - [[of]] — the Scala twin over `Seq[Span]`, used inside
 *    [[graft.fetch.Fetcher.fetchConditional]] to compare a live page
 *    against the validator the frontier row carried.
 *
 * Bit-for-bit agreement of the two (incl. null media_ref, empty span
 * lists, non-ASCII text) is pinned in RevalidateSpec. Encoding: per span
 * `kind U+0001 text U+0001 media_ref U+0001 offset` (nulls → ""), spans
 * joined by U+0002, hashed with xxhash64 seed 42 (Spark SQL's default —
 * same convention as [[graft.urls.UrlCanon.urlHash]]).
 */
object SpanHash {
  private final val FieldSep = "\u0001"
  private final val SpanSep = "\u0002"

  /** Scala-side validator of a span sequence (order-sensitive, like the
    * per-row invariant: kind, text, media_ref, order). */
  def of(spans: Seq[Span]): Long = {
    val sb = new java.lang.StringBuilder(64 * (spans.size + 1))
    var first = true
    spans.foreach { s =>
      if (!first) sb.append(SpanSep)
      first = false
      sb.append(if (s.kind == null) "" else s.kind).append(FieldSep)
        .append(if (s.text == null) "" else s.text).append(FieldSep)
        .append(if (s.media_ref == null) "" else s.media_ref).append(FieldSep)
        .append(s.offset)
      ()
    }
    XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, 42L)
  }

  /** Catalyst twin of [[of]] over a spans column. */
  def column(spans: Column): Column =
    xxhash64(array_join(
      transform(spans, s => concat_ws(FieldSep,
        coalesce(s.getField("kind"), lit("")),
        coalesce(s.getField("text"), lit("")),
        coalesce(s.getField("media_ref"), lit("")),
        coalesce(s.getField("offset").cast("string"), lit("")))),
      SpanSep))
}
