package graft.fetch

import graft.model.Span

/**
 * HTML → interleaved span-sequence parser: the deployable counterpart of
 * what a Scrapy `response` + XPath selectors provide in the reference
 * (SURVEY.md §1.3). [[HttpFetcher]] runs it over live responses so the
 * whole engine — frontier, politeness, extraction transforms — operates
 * on real pages with the same `Document(doc_id, spans)` model the tests
 * and the synthetic bench use.
 *
 * Span contract (kinds from [[graft.model.SpanKind]], offsets are the
 * span's position in document order, matching the corpus fetchers):
 *  - `<title>`                        → one `title` span;
 *  - `<a href>`                       → one `link` span: text = the
 *    anchor's inner text, media_ref = the RAW href (the engine's
 *    candidate stage absolutizes/canonicalizes, E2);
 *  - `<img src>`                      → one `media` span (ref = raw src);
 *  - `<td>` / `<th>`                  → one `table_cell` span per cell;
 *    the cell text is `string(.)` — ALL inner text including anchors —
 *    while anchors inside the cell ALSO emit their own `link` spans (the
 *    row-set transforms read cells, the frontier reads links);
 *  - `<caption>`, `<h2>`-`<h4>`       → `caption` spans (the section/
 *    table-caption dispatch keys of R3);
 *  - `<script type="application/ld+json">` → one `json` span carrying the
 *    raw block (E4 JSON-LD parsing reads it);
 *  - other `<script>`/`<style>`/comments → skipped;
 *  - remaining text nodes            → `text` spans, one per contiguous
 *    run between tags (XPath `//text()` granularity), whitespace
 *    collapsed, empties dropped.
 *
 * Deliberately tolerant, single-pass, and allocation-light: unclosed
 * tags close at the next boundary, unknown tags are transparent,
 * attributes parse with or without quotes. It is not a DOM — the engine
 * only needs the ordered span stream.
 */
object HtmlSpans {

  def parse(html: String): Seq[Span] = {
    val spans = scala.collection.mutable.ArrayBuffer[Span]()
    var off = 0
    def add(kind: String, text: String, ref: String): Unit = {
      spans += Span(kind, text, ref, off); off += 1
    }

    val n = html.length
    var i = 0
    // containment state (no full DOM): innermost special container wins
    var inTitle = false
    var aHref: String = null // non-null ⇔ inside <a>
    val aText = new StringBuilder
    var cellKind: String = null // "table_cell" | "caption" while inside
    val cellText = new StringBuilder
    val text = new StringBuilder

    def flushText(): Unit = {
      val t = squeeze(text); text.setLength(0)
      if (t.nonEmpty) add(SpanKindText, t, "")
    }

    def flushAnchor(): Unit = if (aHref != null) {
      val t = squeeze(aText)
      add(SpanKindLink, t, aHref)
      // string(.) semantics for an enclosing cell: anchor text is part of
      // the cell's text too
      if (cellKind != null) { if (cellText.nonEmpty) cellText.append(' '); cellText.append(t) }
      aText.setLength(0); aHref = null
    }

    def flushCell(): Unit = if (cellKind != null) {
      val t = squeeze(cellText)
      add(cellKind, t, "")
      cellText.setLength(0); cellKind = null
    }

    def textSink: StringBuilder =
      if (aHref != null) aText else if (cellKind != null) cellText else text

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { textSink.append(html.substring(i, n)); i = n }
      else {
        if (lt > i) textSink.append(html.substring(i, lt))
        // comments / doctype / CDATA
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else {
          val gt = html.indexOf('>', lt + 1)
          if (gt < 0) { i = n } // truncated tag: drop the tail
          else {
            val inner = html.substring(lt + 1, gt)
            i = gt + 1
            val closing = inner.startsWith("/")
            val body = if (closing) inner.substring(1) else inner
            val name = tagName(body)
            if (!closing) name match {
              case "a" =>
                attr(body, "href") match {
                  case Some(href) =>
                    flushAnchor() // unclosed previous <a> closes here
                    if (cellKind == null) flushText()
                    aHref = href
                  case None => () // href-less anchor (<a name=...>): transparent,
                  // its text stays in the current sink — never a link span
                }
              case "img" =>
                // inline element, but the span stream is ordered: text
                // before the image must flush as its own node first
                if (aHref == null && cellKind == null && !inTitle) flushText()
                add(SpanKindMedia, "", attr(body, "src").getOrElse(""))
              case "td" | "th" =>
                // anchor first: an unclosed <a> inside the PREVIOUS cell
                // must contribute its text to that cell before it flushes
                flushAnchor(); flushCell(); flushText()
                cellKind = SpanKindTableCell
              case "caption" | "h2" | "h3" | "h4" =>
                flushAnchor(); flushCell(); flushText()
                cellKind = SpanKindCaption
              case "title" =>
                flushText(); inTitle = true; text.setLength(0)
              case "script" =>
                flushText()
                val end = indexOfIgnoreCase(html, "</script", i)
                val blockEnd = if (end < 0) n else end
                if (attr(body, "type").exists(_.equalsIgnoreCase("application/ld+json"))) {
                  val block = html.substring(i, blockEnd).trim
                  if (block.nonEmpty) add(SpanKindJson, block, "")
                }
                i = if (end < 0) n else html.indexOf('>', end) match {
                  case -1 => n
                  case g => g + 1
                }
              case "style" =>
                flushText()
                val end = indexOfIgnoreCase(html, "</style", i)
                i = if (end < 0) n else html.indexOf('>', end) match {
                  case -1 => n
                  case g => g + 1
                }
              case "br" | "p" | "div" | "tr" | "li" | "table" | "section" | "article" =>
                // block boundary: close the current text node
                if (aHref == null && cellKind == null && !inTitle) flushText()
              case _ => () // transparent
            } else name match {
              case "a" => flushAnchor()
              case "td" | "th" | "caption" | "h2" | "h3" | "h4" =>
                flushAnchor(); flushCell()
              case "title" =>
                if (inTitle) {
                  val t = squeeze(text); text.setLength(0)
                  if (t.nonEmpty) add(SpanKindTitle, t, "")
                  inTitle = false
                }
              case "p" | "div" | "tr" | "li" | "table" | "section" | "article" =>
                if (aHref == null && cellKind == null && !inTitle) flushText()
              case _ => () // transparent close
            }
          }
        }
      }
    }

    flushAnchor(); flushCell()
    if (inTitle) { val t = squeeze(text); if (t.nonEmpty) add(SpanKindTitle, t, "") }
    else flushText()
    spans.toSeq
  }

  // local aliases (graft.model.SpanKind values)
  private val SpanKindText = graft.model.SpanKind.Text
  private val SpanKindLink = graft.model.SpanKind.Link
  private val SpanKindMedia = graft.model.SpanKind.Media
  private val SpanKindTableCell = graft.model.SpanKind.TableCell
  private val SpanKindTitle = graft.model.SpanKind.Title
  private val SpanKindJson = graft.model.SpanKind.Json
  private val SpanKindCaption = graft.model.SpanKind.Caption

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    var i = math.max(0, from)
    val last = s.length - target.length
    while (i <= last) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** First word of a tag body, lowercased ("a href=..." → "a"). */
  private def tagName(body: String): String = {
    var e = 0
    while (e < body.length && !Character.isWhitespace(body.charAt(e)) && body.charAt(e) != '/') e += 1
    body.substring(0, e).toLowerCase
  }

  /** Attribute value: quoted ('...' or "...") or bare-word; `Some("")`
    * for a value-less attribute, None when absent. Case-insensitive name
    * match. Attributes are TOKENIZED left to right — a substring search
    * would false-match the name inside another attribute's quoted value
    * (`title="link href=/wrong" href="/right"`). */
  private[fetch] def attr(tagBody: String, name: String): Option[String] = {
    val n = tagBody.length
    var i = 0
    while (i < n && !Character.isWhitespace(tagBody.charAt(i))) i += 1 // tag name
    while (i < n) {
      while (i < n && (Character.isWhitespace(tagBody.charAt(i)) || tagBody.charAt(i) == '/')) i += 1
      if (i >= n) return None
      val ns = i
      while (i < n && !Character.isWhitespace(tagBody.charAt(i)) &&
        tagBody.charAt(i) != '=' && tagBody.charAt(i) != '/') i += 1
      val aname = tagBody.substring(ns, i)
      while (i < n && Character.isWhitespace(tagBody.charAt(i))) i += 1
      var value: String = null
      if (i < n && tagBody.charAt(i) == '=') {
        i += 1
        while (i < n && Character.isWhitespace(tagBody.charAt(i))) i += 1
        if (i >= n) value = ""
        else {
          val q = tagBody.charAt(i)
          if (q == '"' || q == '\'') {
            val end = tagBody.indexOf(q, i + 1)
            value = tagBody.substring(i + 1, if (end < 0) n else end)
            i = if (end < 0) n else end + 1
          } else {
            val vs = i
            while (i < n && !Character.isWhitespace(tagBody.charAt(i))) i += 1
            value = tagBody.substring(vs, i)
          }
        }
      }
      if (aname.equalsIgnoreCase(name))
        return Some(decodeEntities(if (value == null) "" else value))
    }
    None
  }

  /** Whitespace-collapse + trim + entity decode: delegates to the
    * pipeline's precompiled E18 normalizer (ScrapeFns.normalizeWhitespace)
    * so text spans share the rest of the engine's whitespace convention —
    * including the ideographic space U+3000 ubiquitous on the Diet target
    * sites — and the hot text-node path compiles no per-call Pattern (the
    * round-2 JFR finding). */
  private def squeeze(sb: StringBuilder): String =
    graft.extract.ScrapeFns.normalizeWhitespace(decodeEntities(sb.toString))

  /** The handful of entities that matter for crawling (full charref
    * decoding belongs to a text-normalization transform, not the
    * tokenizer). */
  private[fetch] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          s.substring(i + 1, semi) match {
            case "amp" => out.append('&'); i = semi + 1
            case "lt" => out.append('<'); i = semi + 1
            case "gt" => out.append('>'); i = semi + 1
            case "quot" => out.append('"'); i = semi + 1
            case "nbsp" => out.append(' '); i = semi + 1
            case "#39" | "apos" => out.append('\''); i = semi + 1
            case ent if ent.length > 1 && ent.startsWith("#") &&
              ent.drop(1).forall(_.isDigit) =>
              // bounded + validated: "&#;" / "&#99999999;" / surrogate
              // code points must stay literal text, never crash the parse
              val cp = ent.drop(1).toLong
              if (cp <= Character.MAX_CODE_POINT && Character.isValidCodePoint(cp.toInt))
                out.appendAll(Character.toChars(cp.toInt))
              i = semi + 1
            case _ => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
