package graft.extract

import java.time.LocalDateTime

/**
 * Scalar extraction operators (SURVEY.md §2.3, E1-E28) as pure Scala
 * functions. Behavior is pinned 1:1 by the reference's golden tests
 * (ported in src/test/scala/graft/extract/) — citations inline.
 */
object ScrapeFns {

  /** Whitespace class incl. the ideographic space U+3000 — Python's
    * `str.split()` treats it as whitespace, Java's `\s` does not. */
  val WsRegex = "[\\s\\u3000]+"
  // All patterns precompiled: String.split(regex)/replaceFirst compile a
  // Pattern per call, which JFR showed at ~12% of crawl-bench CPU.
  private val WsPattern = java.util.regex.Pattern.compile(WsRegex)

  /** `contains_word(s, words)` from the external politylink lib — pinned by
    * call sites (/root/reference/crawler/utils/common.py:13-16,
    * topics.py:62-66): plain substring containment of any word. */
  def containsWord(s: String, words: Seq[String]): Boolean =
    words.exists(w => s.contains(w))

  /** Order-preserving first-occurrence dedup (`politylink.utils.deduplicate`,
    * used at /root/reference/crawler/utils/topics.py:85). */
  def deduplicate[T](xs: Seq[T]): Seq[T] = {
    val seen = scala.collection.mutable.LinkedHashSet[T]()
    xs.foreach(seen.add)
    seen.toSeq
  }

  /** E9 — drop the speaker prefix (first whitespace token), join the rest
    * with no separator (/root/reference/crawler/utils/common.py:9-10;
    * golden: tests/utils/test_common.py:4-7). */
  def cleanSpeech(speech: String): String =
    WsPattern.split(speech.trim).filter(_.nonEmpty).drop(1).mkString("")

  /** E10 — speaker token contains 議長/委員長/会長/主査
    * (/root/reference/crawler/utils/common.py:13-16). */
  def isModerator(speech: String): Boolean = {
    val toks = WsPattern.split(speech.trim).filter(_.nonEmpty)
    if (toks.isEmpty) false
    else containsWord(toks(0), Seq("議長", "委員長", "会長", "主査"))
  }

  /** E11 — parse "逢沢　一郎（あいさわ　いちろう）" or "蓮舫（れんほう）" into
    * (first, last, firstHira, lastHira); invalid input → None
    * (/root/reference/crawler/utils/common.py:19-34; golden:
    * tests/utils/test_common.py:10-12). */
  private val NameFullRe = java.util.regex.Pattern.compile("([^（）]+)（([^（）]+)）")
  private val NameSplitRe = java.util.regex.Pattern.compile("[ \\u3000（）]")

  def parseNameStr(nameStr: String): Option[(String, String, String, String)] = {
    val s = nameStr.trim
    if (!NameFullRe.matcher(s).matches()) return None
    // -1 keeps trailing empty strings — Python re.split does, and the
    // 5-part form relies on the trailing '' after the closing paren.
    val parts = NameSplitRe.split(s, -1).toSeq
    parts.length match {
      case 3 => Some((parts(0), "", parts(1), ""))
      case 5 => Some((parts(1), parts(0), parts(3), parts(2)))
      case _ => None
    }
  }

  /** E6 — `(\d+)年(\d+)月(\d+)日` anywhere in the string → datetime; no
    * match → None (reference raises ValueError; the engine's null is the
    * quarantine channel) (/root/reference/crawler/utils/scrape.py:42-47). */
  private val DatetimeRe = "(\\d+)年(\\d+)月(\\d+)日".r

  def extractDatetime(s: String): Option[LocalDateTime] =
    DatetimeRe.findFirstMatchIn(s).map(m =>
      LocalDateTime.of(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt, 0, 0))

  /** E7 — parliamentary-group alias table
    * (/root/reference/crawler/utils/scrape.py:50-68). */
  val GroupAliases: Seq[(String, Set[String])] = Seq(
    "JIMIN" -> Set("自民", "自由民主党・無所属の会", "自由民主党・国民の声", "自由民主党"),
    "RIKKEN" -> Set("立民", "立憲民主党・無所属", "立憲", "立憲民主・社民"),
    "KOMEI" -> Set("公明", "公明党"),
    "KYOSAN" -> Set("共産", "日本共産党"),
    "ISHIN" -> Set("維新", "日本維新の会・無所属の会", "日本維新の会"),
    "KOKUMIN" -> Set("国民", "国民民主党・無所属クラブ", "民主", "国民民主党・新緑風会"))

  def extractParliamentaryGroupOrNone(s: String): Option[String] =
    GroupAliases.collectFirst { case (g, names) if names.contains(s) => g }

  /** E8 — split on separator, map E7, drop misses
    * (/root/reference/crawler/utils/scrape.py:71-77). */
  def extractParliamentaryGroups(s: String, separator: String = ";"): Seq[String] =
    s.split(java.util.regex.Pattern.quote(separator), -1).toSeq
      .flatMap(ss => extractParliamentaryGroupOrNone(ss.trim))

  /** E5 — `ld['image']['url']` from a JSON-LD string
    * (/root/reference/crawler/utils/scrape.py:36-39). Jackson-backed; the
    * typed transform lives in transforms.NewsPages.extractThumbnailOrNone. */
  def extractThumbnailOrNone(ldJson: String): Option[String] =
    try {
      val ld = new com.fasterxml.jackson.databind.ObjectMapper().readTree(ldJson)
      transforms.NewsPages.extractThumbnailOrNone(ld)
    } catch { case _: Exception => None }

  /** E17 — section bill paragraphs at 附 則 / 理 由 markers
    * (/root/reference/crawler/utils/elasticsearch.py:12-26; golden:
    * tests/utils/test_elasticsearch.py:6-28). Returns None if either
    * marker is missing or out of order (reference raises). */
  def buildBillText(texts: Seq[String]): Option[(String, String, String)] = {
    val supplementIdx = texts.indexOf("附 則")
    val reasonIdx = texts.indexOf("理 由")
    if (supplementIdx < 0 || reasonIdx < 0 || supplementIdx > reasonIdx) None
    else Some((
      texts.slice(0, supplementIdx).mkString(""),
      texts.slice(supplementIdx + 1, reasonIdx).mkString(""),
      texts.slice(reasonIdx + 1, texts.length).mkString("")))
  }

  /** E22 — `第(\d+)回国会(.*?)月(.*?)日` from a shugiin committee-news title;
    * year supplied from the diet's start date
    * (/root/reference/crawler/spiders/shugiin_minutes_spider.py:74-80;
    * golden: tests/spiders/test_shugiin_minutes_spider.py:9-18). */
  private val TitleRe = "第(\\d+)回国会(.*)月(.*)日".r

  def extractDatetimeFromTitle(title: String, year: Int): Option[LocalDateTime] = {
    TitleRe.findFirstMatchIn(title).flatMap { m =>
      try Some(LocalDateTime.of(year, m.group(2).trim.toInt, m.group(3).trim.toInt, 0, 0))
      catch { case _: Exception => None }
    }
  }

  /** E26 — squeeze all whitespace: `''.join(text.strip().split())`
    * (/root/reference/crawler/spiders/sangiin_minutes_spider.py:49). */
  def squeezeWhitespace(s: String): String =
    WsPattern.split(s.trim).filter(_.nonEmpty).mkString("")

  /** `squeezeWhitespace(s).length` without building the string — the
    * crawl bench calls this per text span (tens of millions of times), and
    * the split+mkString allocation showed up directly in young-GC time.
    * Char class is exactly WsRegex's `[\s　]` (Java `\s` is ASCII). */
  def squeezedLength(s: String): Int = {
    var i = 0
    var n = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != ' ' && c != '\t' && c != '\n' && c != '\u000B' && c != '\f' &&
        c != '\r' && c != '　') n += 1
      i += 1
    }
    n
  }

  /** E18 — normalize whitespace runs to single spaces
    * (/root/reference/crawler/spiders/shugiin_spider.py:70-72). */
  def normalizeWhitespace(s: String): String =
    WsPattern.split(s.trim).filter(_.nonEmpty).mkString(" ")

  /** E20 — remove internal whitespace (member name cells)
    * (/root/reference/crawler/spiders/shugiin_member_spider.py:75). */
  def removeWhitespace(s: String): String = squeezeWhitespace(s)

  // ------------------------------------------------------------------
  // E27 — Japanese date strings incl. era forms (DateConverter.convert).
  // External lib; spec pinned by call-site inputs: meisai values like
  // 令和3年4月1日 / 平成31年1月1日 and plain 2021年4月1日
  // (/root/reference/crawler/spiders/sangiin_spider.py:129).
  // ------------------------------------------------------------------
  private val EraStarts = Seq("令和" -> 2018, "平成" -> 1988, "昭和" -> 1925, "大正" -> 1911, "明治" -> 1867)

  private val EraRe = "(令和|平成|昭和|大正|明治)(元|\\d+)年(\\d+)月(\\d+)日".r

  def convertJapaneseDate(s: String): Option[LocalDateTime] = {
    val t = s.trim
    EraRe.findFirstMatchIn(t) match {
      case Some(m) =>
        val base = EraStarts.find(_._1 == m.group(1)).get._2
        val y = if (m.group(2) == "元") 1 else m.group(2).toInt
        try Some(LocalDateTime.of(base + y, m.group(3).toInt, m.group(4).toInt, 0, 0))
        catch { case _: Exception => None }
      case None => extractDatetime(t)
    }
  }

  // ------------------------------------------------------------------
  // E28 — deterministic entity IDs (idgen). External lib; our own spec:
  // "<Entity>:<xxhash64 hex of the canonical key fields>". Key fields per
  // builder (/root/reference/crawler/utils/graphql.py:36-125):
  //   Bill←bill_number, Url←url, Minutes←name+start_date_time,
  //   Speech←minutes_id+order, Committee←name, Member←name, Diet←number,
  //   News←url, Activity←member+target+dt, BillAction←bill+minutes+type.
  // Determinism (same inputs → same id) is the only contract the reference
  // tests rely on (tests/spiders/test_minutes_spider.py:39).
  // ------------------------------------------------------------------
  def idgen(entity: String, keyFields: String*): String = {
    val h = graft.urls.UrlCanon.urlHash(keyFields.mkString(""))
    f"$entity:$h%016x" // %x renders a Long as unsigned two's-complement hex
  }

  def billId(billNumber: String): String = idgen("Bill", billNumber)
  def urlId(url: String): String = idgen("Url", url)
  def minutesId(name: String, startDateTime: String): String = idgen("Minutes", name, startDateTime)
  def speechId(minutesId: String, order: Int): String = idgen("Speech", minutesId, order.toString)
  def committeeId(name: String): String = idgen("Committee", name)
  def memberId(name: String): String = idgen("Member", name)
  def dietId(number: Int): String = s"Diet:$number"
  def newsId(url: String): String = idgen("News", url)
  def activityId(memberId: String, targetId: String, dt: String): String = idgen("Activity", memberId, targetId, dt)
  def billActionId(billId: String, minutesId: String, actionType: String): String =
    idgen("BillAction", billId, minutesId, actionType)
}
