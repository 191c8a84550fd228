package graft.extract

/**
 * E12-E16 — topic extraction from the first speech (会議録情報) of a meeting
 * transcript. This is the engine's single most intricate scalar operator:
 * an indentation-aware fold over the lines of one string, no cross-row
 * state, so it runs as a plain Scala function inside a typed Dataset map
 * (whole row-local; Catalyst treats it as a deterministic scalar).
 *
 * Reference: /root/reference/crawler/utils/topics.py:18-116; behavior is
 * pinned by the 4 golden transcripts in tests/utils/test_topics.py:20-121.
 */
object Topics {

  val TopicSections: Seq[String] = Seq("議事日程", "本日の会議に付した案件", "本日の公聴会で意見を聞いた案件")
  val TopicWords: Seq[String] =
    Seq("法律案", "法案", "決議案", "議決案", "調査", "調書", "協定", "承認", "予算", "互選", "件", "決算書", "計算書", "請願", "質疑")
  val IgnoreWords: Seq[String] = Seq("-", "―", "━", "─", "◇", "開議")

  private def isWs(c: Char): Boolean = Character.isWhitespace(c) || c == '　'

  /** `politylink.utils.get_str_offset` — leading-whitespace width of a line;
    * -1 for a blank line (per the docstring example at
    * /root/reference/crawler/utils/topics.py:29-43). */
  def strOffset(line: String): Int = {
    var i = 0
    while (i < line.length && isWs(line.charAt(i))) i += 1
    if (i == line.length) -1 else i
  }

  private def trimJa(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isWs(s.charAt(a))) a += 1
    while (b > a && isWs(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** E12 — extract the ordered topic list from the first speech. */
  def extractTopics(firstSpeech: String, clean: Boolean = true, split: Boolean = true): Seq[String] =
    extractTopicsLines(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(firstSpeech.split("\n", -1)),
      clean, split)

  /** Line-sequence form of [[extractTopics]] — callers that already hold
    * the page as lines (the crawl parse stage holds spans) skip building
    * and re-splitting a page-sized string. */
  def extractTopicsLines(lines: Seq[String], clean: Boolean = true,
      split: Boolean = true): Seq[String] = {

    val idx = lines.indexWhere(l => ScrapeFns.containsWord(l, TopicSections))
    val start = if (idx >= 0) idx + 1 else lines.length

    val topics = scala.collection.mutable.ArrayBuffer[String]()
    val buffer = new java.lang.StringBuilder // string += per child line was hot
    var parentOffset = 0

    def flush(): Unit = {
      if (buffer.length > 0) {
        val b0 = buffer.toString
        if (ScrapeFns.containsWord(b0, TopicWords)) {
          val b = if (clean) cleanTopic(b0) else b0
          if (split) topics ++= splitTopic(b) else topics += b
        }
        buffer.setLength(0)
      }
    }

    var li = start
    val end = lines.length + 1 // one-past sentinel flushes the buffer
    while (li < end) {
      val rawLine = if (li < lines.length) lines(li) else ""
      val offset = strOffset(rawLine)
      val line = trimJa(rawLine)

      if (buffer.length == 0) parentOffset = offset

      val (flushBuffer, appendLine) =
        if (ScrapeFns.containsWord(line, IgnoreOrSection)) {
          parentOffset = 0 // next line re-establishes the parent offset
          (true, false)
        } else if (offset <= parentOffset) { // next parent line
          parentOffset = offset
          (true, true)
        } else (false, true) // child line — continue the buffer

      if (flushBuffer) flush()
      if (appendLine) buffer.append(line)
      li += 1
    }
    ScrapeFns.deduplicate(topics.toSeq)
  }

  private val IgnoreOrSection: Seq[String] = IgnoreWords ++ TopicSections

  /** E13 — strip 〇 / 日程第N / kanji-numeral prefixes
    * (/root/reference/crawler/utils/topics.py:88-89). */
  private val CleanTopicRe =
    java.util.regex.Pattern.compile("^○?(日程)?第?(一|二|三|四|五|六|七|八|九|十)*、?")

  def cleanTopic(topic: String): String =
    trimJa(CleanTopicRe.matcher(topic).replaceFirst(""))

  /** E14 — split on `）、` only outside parens; `）及び` → `）、` first; restore
    * the closing paren (/root/reference/crawler/utils/topics.py:92-99). */
  private val SplitTopicRe =
    java.util.regex.Pattern.compile("）、(?=(?:[^（）]|（[^（）]*）)*$)")

  def splitTopic(topic: String): Seq[String] = {
    val t = topic.replace("）及び", "）、")
    val parts = SplitTopicRe.split(t, -1).toSeq
    parts.dropRight(1).map(_ + "）") :+ parts.last
  }

  /** E15 — strip trailing ため
    * (/root/reference/crawler/utils/topics.py:102-106). */
  def cleanCommitteeTopic(topic: String): String = {
    val t = trimJa(topic)
    if (t.endsWith("ため")) t.dropRight(2) else t
  }

  /** E16 — substring containment of bill names in a speech → bill ids, in
    * the bill map's iteration order
    * (/root/reference/crawler/utils/topics.py:109-116). */
  def extractTopicIds(speech: String, billIdToName: Seq[(String, String)]): Seq[String] =
    billIdToName.collect { case (id, name) if speech.contains(name) => id }
}
