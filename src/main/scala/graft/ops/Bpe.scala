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
 *  - [[train]] iterates `numMerges` times over the word plane: pair
 *    counts (explode of adjacent symbol pairs weighted by word count →
 *    one tiny aggregate), the argmax pair (a ONE-ROW driver collect per
 *    iteration — same posture as PageRank's dangling-mass scalar), and
 *    the merge itself as one codegen'd literal `replace` over the word
 *    plane. Each iteration materializes the plane (localCheckpoint) so
 *    lineage stays O(1) instead of O(numMerges).
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

  /** Train `numMerges` BPE merges on a (word, cnt) plane. Ties in the
    * pair argmax break deterministically by (count desc, l asc, r asc).
    * Returns the merge list and the trained word plane (word, cnt, s) —
    * the segmentation of every training word, which is what [[encode]]
    * consumes. Stops early if no pair is left. */
  def train(wordCounts: DataFrame, numMerges: Int): (Seq[Merge], DataFrame) = {
    var words = wordCounts
      .select(col("word"), col("cnt"), symbolize(col("word")).as("s"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val best = pairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(i, l, r)
        val prev = words
        words = words
          .withColumn("s", applyMerge(col("s"), l, r))
          .localCheckpoint()
        prev.unpersist()
        i += 1
      }
    }
    (merges.result(), words)
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
