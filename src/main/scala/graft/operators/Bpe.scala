package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING (Sennrich et al. 2016, the
  * public tokenizer-training recipe behind GPT-2/LLaMA-class BPE
  * vocabularies) — the tokenizer-construction half of the pipeline
  * whose APPLICATION side the engine already covers (token counting,
  * packing, vocabulary growth). The reference has no tokenizer
  * training at all (it calls a hosted model's tokenizer implicitly);
  * this is north-star training-data scope.
  *
  * The standard formulation trains on the WORD-FREQUENCY TABLE, not
  * the corpus: distinct words with counts (Zipf-bounded — at 100 TB
  * the distinct-word table is GBs where the corpus is TBs), each word
  * a character-symbol sequence. Each round: count adjacent symbol
  * pairs weighted by word frequency (one partial-aggregable groupBy),
  * take the argmax (count DESC, then lexicographic — fully
  * deterministic), fuse that pair left-to-right in every sequence,
  * repeat. The per-round reduction is corpus-scale-legal: the only
  * shuffle is the pair-count aggregate, and the argmax collect is ONE
  * row.
  *
  * Verification split (stated honestly): each round's PAIR COUNTS and
  * ARGMAX are replayed by the SQL oracle from the persisted per-round
  * sequence artifacts; the merge APPLICATION step (artifact r-1 →
  * artifact r) is a sequential left-to-right scan no relational
  * expression states cleanly, so it is gated by [[mergeApply]]'s
  * hand-computed specs (BpeSpec) instead — the t49/v14 convention of
  * pinning the non-SQL kernel with golden fixtures and hash-gating
  * everything downstream of it.
  */
object Bpe {

  /** One left-to-right greedy pass fusing adjacent (a, b) into ab —
    * the published BPE apply rule. Overlaps resolve leftmost-first:
    * applying (a, a) to "aaa" yields ["aa", "a"], never ["a", "aa"].
    * Runs on the distinct-word table (Zipf-bounded), not the corpus.
    */
  def mergeApply(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.toSeq
  }

  /** A word as its codepoint symbols — the JVM-side twin of
    * [[CodepointSplit]] (same contract: surrogate pairs stay whole),
    * the round-0 state [[segmentWord]] starts from. */
  def codepointSyms(word: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  /** Segment ONE word with a trained merge list — the true BPE apply:
    * codepoint symbols, then every merge in training order, each a
    * left-to-right greedy pass ([[mergeApply]]). This is how words the
    * training corpus never saw (OOV under the vocab JOIN) tokenize at
    * inference: they are never unsegmentable, they just stop merging
    * wherever the learned pairs stop applying. Runs per DISTINCT word
    * (Zipf-bounded), never per occurrence.
    */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(codepointSyms(word)) {
      case (syms, (a, b)) => mergeApply(syms, a, b)
    }

  /** Zero-width split pattern that cuts a string into CODEPOINTS, not
    * UTF-16 code units: split at every inter-character position
    * (`(?<=.)`, so never before the first char and never producing an
    * empty trailing symbol) EXCEPT between a surrogate pair
    * (`(?<!high-surrogate)`). A bare `split(word, "")` would cleave
    * non-BMP characters (emoji, CJK extension B, math alphanumerics)
    * into two lone surrogates — invalid strings that silently corrupt
    * merge statistics the moment the corpus leaves ASCII (the t29 NFC
    * path feeds exactly such text). Grapheme clusters (combining
    * marks, ZWJ sequences) still split into their constituent
    * codepoints — the standard BPE convention (byte- or
    * codepoint-level base alphabets are both published; grapheme-level
    * is not). The trailing `(?!$)` stops the zero-width pattern
    * matching at the very end of the string — Spark's `split` keeps
    * trailing empties (limit -1), so without it every word would grow
    * a phantom "" symbol. */
  private[graft] val CodepointSplit = "(?<=.)(?<![\\uD800-\\uDBFF])(?!$)"

  /** The word-frequency table as round-0 symbol sequences:
    * (word, n, syms) with syms = the word's codepoints. */
  def wordSeqs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.TextFunctions
        .words(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("word"), col("n"),
        split(col("word"), CodepointSplit).as("syms"))

  /** Adjacent-pair frequencies over a (word, n, syms) frame — the
    * per-round reduction. One narrow generator + one aggregate. */
  def pairCounts(seqs: DataFrame): DataFrame =
    seqs.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
      .groupBy(col("p.a").as("lhs"), col("p.b").as("rhs"))
      .agg(sum(col("n")).as("cnt"))

  /** Train `rounds` merges. `persistRound(r, seqs)` is called with the
    * round-r sequence table (r = 0 is the initial character split) and
    * must return the frame to continue from — the caller persists each
    * as the oracle-replayable artifact AND cuts the iteration's
    * lineage in one move (the Artifacts.write + read-back idiom).
    * Returns the merge table (round, lhs, rhs, merged, pair_count),
    * driver-built (rounds rows — model-sized).
    */
  def train(docs: DataFrame, textCol: String, rounds: Int,
            persistRound: (Int, DataFrame) => DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var seqs = persistRound(0, wordSeqs(docs, textCol))
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(seqs)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word fused to one symbol
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, a + b, cnt))
        val applyMerge = udf((syms: Seq[String]) => mergeApply(syms, a, b))
        seqs = persistRound(r,
          seqs.select(col("word"), col("n"),
            applyMerge(col("syms")).as("syms")))
        r += 1
      }
    }
    merges.toSeq
      .toDF("round", "lhs", "rhs", "merged", "pair_count")
      .select(col("round").cast("long").as("round"), col("lhs"),
        col("rhs"), col("merged"), col("pair_count"))
  }
}
