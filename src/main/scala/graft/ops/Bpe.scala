package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding tokenizer training (Sennrich et al.
 * 2016, "Neural Machine Translation of Rare Words with Subword Units",
 * arXiv:1508.07909) — the tokenizer-TRAINING half of the pipeline whose
 * token-COUNTING half lives in [[TextStats]]. The classic algorithm is
 * inherently iterative (each merge depends on the counts after the
 * previous one); the distributed shape that survives 100 TB is:
 *
 *  - ONE corpus-scale pass ([[wordCounts]]): whitespace words →
 *    map-side-combinable groupBy count. Everything after runs on that
 *    O(vocab) plane — the corpus is never touched again during training.
 *  - [[train]] collects that O(distinct words) plane ONCE (optionally
 *    frequency-floored via `minCount` — the knob that bounds the
 *    driver-resident plane at open-web scale, where the cnt≥2 floor
 *    already cuts the tail by ~half and cnt≥5 by ~4×) and runs the
 *    classic incremental pair-count trainer driver-side (Sennrich's
 *    own algorithm: full pair stats built once, then per merge only
 *    the words CONTAINING the merged pair — tracked by an inverted
 *    index — are rescanned). Training therefore costs ZERO Spark jobs
 *    beyond the single collect: a 32k-merge vocab is ~32k hash-map
 *    argmaxes, not ~64k driver-scheduled distributed jobs (the shape
 *    this replaced). The trained plane is handed back as a DataFrame
 *    so everything downstream ([[segmentation]], [[vocab]],
 *    [[encode]]) stays distributed and unchanged.
 *  - [[encode]] never re-runs BPE on the corpus: the trained plane IS
 *    the segmentation of every known word, so encoding = posexplode
 *    words → broadcast equi-join on the O(vocab) segmentation →
 *    re-flatten, with out-of-vocabulary words falling back to their
 *    character sequence (rank-ordered merge replay on unseen words
 *    would need a per-word loop; the fallback is exact for any word
 *    seen in training and documented for the rest).
 *
 * Symbol sequences are carried as SEP-wrapped strings — [a, b] is
 * `⟨S⟩a⟨S⟩⟨S⟩b⟨S⟩` — so the adjacent pair (a, b) occurs iff
 * `⟨S⟩a⟨S⟩⟨S⟩b⟨S⟩` occurs as a substring, and one standard
 * left-to-right non-overlapping literal `replace` of that substring
 * with `⟨S⟩ab⟨S⟩` IS the greedy BPE merge pass: [a,b,a,b] → [ab,ab],
 * [x,x,x] → [xx,x]. Identical semantics (and one shared literal
 * pattern) in Spark codegen and the DuckDB oracle — no UDF, no per-row
 * loop, no array rebuild.
 */
object Bpe {

  /** Symbol separator (U+001F unit separator). Words containing it are
    * dropped by [[wordCounts]] (a C0 control char — `\s+` tokenization
    * of sane text never emits it; dropping beats corrupting the
    * plane). */
  val Sep = "\u001f"
  private val Sep2 = Sep + Sep

  /** The one corpus-scale pass: (word, cnt) over whitespace tokens. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(Sep))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** A word as its initial SEP-wrapped character sequence:
    * "abc" → `⟨S⟩a⟨S⟩⟨S⟩b⟨S⟩⟨S⟩c⟨S⟩`. */
  def symbolize(word: Column): Column = {
    val doubled = regexp_replace(word, "(.)", "$1" + Sep2)
    concat(lit(Sep), doubled.substr(lit(1), length(doubled) - 1))
  }

  /** SEP-wrapped string → symbol array. */
  def symbols(s: Column): Column =
    split(s.substr(lit(2), length(s) - 2), Sep2)

  /** Weighted adjacent-pair counts over a (word, cnt, s) plane:
    * (l, r, c). */
  def pairCounts(words: DataFrame): DataFrame = {
    val ss = symbols(col("s"))
    words
      .select(col("cnt"),
        explode(zip_with(
          slice(ss, lit(1), size(ss) - 1),
          slice(ss, lit(2), size(ss) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** One greedy merge pass of the pair (l, r) over a SEP-wrapped symbol
    * string — left-to-right, non-overlapping (see object doc). */
  def applyMerge(s: Column, l: String, r: String): Column =
    replace(s, lit(Sep + l + Sep2 + r + Sep), lit(Sep + l + r + Sep))

  /** One learned merge. */
  final case class Merge(rank: Int, left: String, right: String) {
    def merged: String = left + right
  }

  /** Unsigned UTF-8 byte comparison — the string order Spark
    * (UTF8String) and DuckDB both sort by. Java's `String.compareTo`
    * differs on supplementary characters (UTF-16 surrogates sort below
    * U+E000..U+FFFF), so the driver-side argmax tie-break must compare
    * bytes to stay engine-identical. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** One greedy left-to-right non-overlapping merge pass over a symbol
    * array — the array twin of [[applyMerge]]'s literal `replace` (same
    * semantics: [a,b,a,b]→[ab,ab], [x,x,x]→[xx,x], merged tokens don't
    * re-merge within the pass). */
  private def mergeSymbols(sym: Array[String], l: String, r: String,
      merged: String): Array[String] = {
    val out = Array.newBuilder[String]
    out.sizeHint(sym.length)
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
        out += merged; i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` BPE merges on a (word, cnt) plane. Ties in the
    * pair argmax break deterministically by (count desc, l asc, r asc)
    * under UTF-8 byte order — identical to the engine/oracle sort.
    * Returns the merge list and the trained word plane (word, cnt, s) —
    * the segmentation of every training word, which is what [[encode]]
    * consumes. Stops early if no pair is left.
    *
    * Dataflow at scale: the plane is collected ONCE (bounded by
    * `minCount` — words below the floor neither train nor appear in the
    * returned plane, so they encode via the OOV character fallback) and
    * all `numMerges` iterations run driver-side with incremental pair
    * stats: an inverted index (pair → words containing it) restricts
    * each merge's rescan to the affected words, per Sennrich's
    * reference trainer. No Spark job is scheduled after the collect. */
  def train(wordCounts: DataFrame, numMerges: Int,
      minCount: Long = 1L): (Seq[Merge], DataFrame) = {
    val spark = wordCounts.sparkSession
    val floored =
      if (minCount > 1L) wordCounts.filter(col("cnt") >= minCount)
      else wordCounts
    // The single plane-scale job: O(distinct words ≥ floor) rows.
    val collected = floored.select(col("word"), col("cnt")).collect()
    val words = new Array[Array[String]](collected.length)
    val wordStr = new Array[String](collected.length)
    val cnts = new Array[Long](collected.length)
    var w = 0
    while (w < collected.length) {
      wordStr(w) = collected(w).getString(0)
      cnts(w) = collected(w).getLong(1)
      // split by CODE POINT, matching symbolize's regex `(.)` (Java
      // regex `.` consumes a full surrogate pair)
      words(w) = wordStr(w).codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      w += 1
    }

    // Full pair stats + inverted index, built once. The argmax uses
    // Sennrich's threshold pool: a candidate set of every pair whose
    // count ever reached `floor` (half the max at the last full scan);
    // per merge only that small pool is scanned, and a full O(|stats|)
    // rescan happens only when the pool drains below the floor. Any
    // pair with live count ≥ floor is in the pool by construction
    // (updates re-add on crossing), so the pool argmax IS the global
    // argmax — exact, not approximate. On Zipfian planes the pool stays
    // O(10-100) and training is ~10× faster than a per-merge full scan.
    val stats = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val index =
      scala.collection.mutable.HashMap.empty[(String, String),
        scala.collection.mutable.HashSet[Int]]
    val pool = scala.collection.mutable.HashSet.empty[(String, String)]
    var floor = Long.MaxValue // no pool maintenance until the first scan
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val sym = words(wi)
      var i = 0
      while (i + 1 < sym.length) {
        val p = (sym(i), sym(i + 1))
        val c = stats.getOrElse(p, 0L) + sign * cnts(wi)
        if (c == 0L) stats.remove(p) else stats.update(p, c)
        if (c >= floor) pool += p
        if (sign > 0)
          index.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty)
            .add(wi)
        i += 1
      }
    }
    w = 0
    while (w < words.length) { addWordPairs(w, 1L); w += 1 }

    def rebuildPool(): Unit = {
      var mx = 0L
      stats.foreach { case (_, c) => if (c > mx) mx = c }
      floor = math.max(1L, mx / 2)
      pool.clear()
      stats.foreach { case (p, c) => if (c >= floor) pool += p }
    }
    // argmax over the pool by (count desc, l asc, r asc); prunes
    // entries that fell below the floor; null when the pool is dry
    def poolArgmax(): (String, String) = {
      var best: (String, String) = null
      var bestC = 0L
      val stale = Seq.newBuilder[(String, String)]
      pool.foreach { p =>
        val c = stats.getOrElse(p, 0L)
        if (c < floor) stale += p
        else if (c > bestC || (c == bestC && {
          val cl = utf8Compare(p._1, best._1)
          cl < 0 || (cl == 0 && utf8Compare(p._2, best._2) < 0)
        })) { best = p; bestC = c }
      }
      stale.result().foreach(pool -= _)
      best
    }

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      var best = poolArgmax()
      if (best == null && stats.nonEmpty) { rebuildPool(); best = poolArgmax() }
      if (best == null) done = true
      else {
        val (l, r) = best
        merges += Merge(rank, l, r)
        val merged = l + r
        val touched = index.getOrElse(best, scala.collection.mutable.HashSet.empty)
        touched.toArray.foreach { wi =>
          addWordPairs(wi, -1L) // retract the word's old adjacent pairs
          words(wi) = mergeSymbols(words(wi), l, r, merged)
          addWordPairs(wi, 1L)  // add back the post-merge pairs
        }
        // the merged pair is gone from every word that contained it
        stats.remove(best)
        index.remove(best)
        pool -= best
        rank += 1
      }
    }

    import spark.implicits._
    val planeRows = (0 until words.length).map { wi =>
      (wordStr(wi), cnts(wi),
        if (words(wi).isEmpty) Sep * 2
        else Sep + words(wi).mkString(Sep2) + Sep)
    }
    (merges.result(), planeRows.toDF("word", "cnt", "s"))
  }

  /** The trained plane as (word, tokens array) — broadcast-sized by
    * construction (O(vocab) rows of short strings). */
  def segmentation(trainedWords: DataFrame): DataFrame =
    trainedWords.select(col("word"), symbols(col("s")).as("tokens"))

  /** Token-id table for a trained plane: (token, token_id), ids dense
    * from 0 in lexicographic token order (deterministic across runs and
    * engines). The window runs over the distinct-token plane only —
    * O(vocab + numMerges) rows, never the corpus. */
  def vocab(trainedWords: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    segmentation(trainedWords)
      .select(explode(col("tokens")).as("token")).distinct()
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("token"))) - 1)
  }

  /** Encode a corpus with a trained segmentation: one output row per
    * subword token, ordered by (id, word_pos, sub_pos). Known words
    * take their trained segmentation via a broadcast equi-join; OOV
    * words fall back to their character sequence. The corpus text dies
    * at the posexplode — only (id, pos, word) rows reach the join. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      seg: DataFrame): DataFrame = {
    val wordRows = docs
      .select(col(idCol).as("id"),
        posexplode(split(trim(col(textCol)), "\\s+")))
      .filter(length(col("col")) > 0 && !col("col").contains(Sep))
      .select(col("id"), col("pos").as("word_pos"), col("col").as("word"))
    wordRows
      .join(broadcast(seg), Seq("word"), "left")
      .select(col("id"), col("word_pos"),
        posexplode(coalesce(col("tokens"), symbols(symbolize(col("word"))))))
      .select(col("id"), col("word_pos"), col("pos").as("sub_pos"),
        col("col").as("token"))
  }

  /** Convenience: train on `trainDocs`, encode `corpus`, return
    * per-document subword token counts (id, n_tokens) — the
    * sequence-length plane [[Packing]] consumes. */
  def tokenCounts(trainDocs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, numMerges: Int): DataFrame = {
    val (_, trained) = train(wordCounts(trainDocs, textCol), numMerges)
    encode(corpus, idCol, textCol, segmentation(trained))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tokens"))
  }
}
