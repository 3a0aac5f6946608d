package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Pins the BPE kernels the t66/t67 oracle split leaves to specs: the
  * sequential merge-apply rule (no clean relational expression states
  * it, so the SQL oracle replays pair counts/argmax but not the apply)
  * and the codepoint-safe symbol split (the Spark side of the round-0
  * artifact the oracle then consumes verbatim).
  */
class BpeSpec extends SparkSpec {

  test("mergeApply fuses adjacent pairs left-to-right") {
    assert(Bpe.mergeApply(Seq("h", "e", "l", "l", "o"), "l", "l")
      == Seq("h", "e", "ll", "o"))
    assert(Bpe.mergeApply(Seq("a", "b", "a", "b"), "a", "b")
      == Seq("ab", "ab"))
  }

  test("mergeApply resolves overlaps leftmost-first") {
    // the published rule: (a, a) over "aaa" -> ["aa", "a"], never
    // ["a", "aa"] — and "aaaa" -> ["aa", "aa"], the pass continuing
    // AFTER the fused pair, not inside it
    assert(Bpe.mergeApply(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeApply(Seq("a", "a", "a", "a"), "a", "a")
      == Seq("aa", "aa"))
  }

  test("mergeApply no-ops when the pair is absent") {
    assert(Bpe.mergeApply(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(Bpe.mergeApply(Seq.empty, "a", "b") == Seq.empty)
    assert(Bpe.mergeApply(Seq("a"), "a", "a") == Seq("a"))
  }

  test("multi-merge application composes: learned merges re-segment") {
    // apply merge 1 (l, l) then merge 2 (ll, o) — the t67 contract
    // that the final-round syms are the result of the full merge list
    val afterM1 = Bpe.mergeApply(Seq("h", "e", "l", "l", "o"), "l", "l")
    val afterM2 = Bpe.mergeApply(afterM1, "ll", "o")
    assert(afterM2 == Seq("h", "e", "llo"))
  }

  test("segmentWord replays the merge list in order over codepoints") {
    // merges learned in order: (l,l) then (ll,o) — "hello" -> 3 syms,
    // an unseen word stops merging where the pairs stop applying
    val merges = Seq(("l", "l"), ("ll", "o"))
    assert(Bpe.segmentWord("hello", merges) == Seq("h", "e", "llo"))
    assert(Bpe.segmentWord("llama", merges) == Seq("ll", "a", "m", "a"))
    assert(Bpe.segmentWord("xyz", merges) == Seq("x", "y", "z"))
    assert(Bpe.segmentWord("", merges) == Seq.empty)
  }

  test("codepointSyms keeps non-BMP codepoints whole (JVM twin of the " +
      "split pattern)") {
    val nonBmp = new String(Character.toChars(0x1D4B3))
    assert(Bpe.codepointSyms(s"a${nonBmp}b") == Seq("a", nonBmp, "b"))
    assert(Bpe.codepointSyms("ab") == Seq("a", "b"))
  }

  test("wordSeqs splits to codepoints, keeping non-BMP chars whole") {
    // U+1D4B3 MATHEMATICAL SCRIPT CAPITAL X — a surrogate pair in
    // UTF-16; a naive split("") would cleave it into two lone
    // surrogates. 𝒳 occurs twice so (𝒳, 𝒳) is even a countable pair.
    val nonBmp = new String(Character.toChars(0x1D4B3))
    val word = s"a${nonBmp}b$nonBmp"
    val r = Bpe.wordSeqs(docsDf((1L, word)), "text").collect()
    assert(r.length == 1)
    val syms = r(0).getAs[scala.collection.Seq[String]]("syms")
    assert(syms == Seq("a", nonBmp, "b", nonBmp))
    assert(syms.forall(s =>
      s.length == 1 || (s.length == 2 && s.codePointCount(0, 2) == 1)))
  }

  test("wordSeqs lowercases and counts word frequency") {
    val r = Bpe.wordSeqs(docsDf((1L, "Ab ab cd"), (2L, "AB")), "text")
      .orderBy("word").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq
      == Seq(("ab", 3L), ("cd", 1L)))
    assert(r(0).getAs[scala.collection.Seq[String]]("syms") == Seq("a", "b"))
  }

  test("pairCounts weights by word frequency and skips 1-symbol words") {
    val seqs = Bpe.wordSeqs(docsDf((1L, "ab ab x")), "text")
    val pc = Bpe.pairCounts(seqs).collect()
    assert(pc.length == 1)
    assert((pc(0).getString(0), pc(0).getString(1), pc(0).getLong(2))
      == ("a", "b", 2L))
  }

  test("train learns the argmax merge per round, deterministic ties") {
    // corpus: "aa aa ab" -> round-1 pairs: (a,a)x2, (a,b)x1 -> merge
    // (a,a); round-2 pairs: only (a,b)x1 -> merge (a,b); then exhausted
    val merges = Bpe.train(docsDf((1L, "aa aa ab")), "text", rounds = 5,
        persistRound = (_, df) => df.localCheckpoint())
      .orderBy("round").collect()
    assert(merges.map(m => (m.getLong(0), m.getString(1), m.getString(2),
      m.getString(3), m.getLong(4))).toSeq
      == Seq((1L, "a", "a", "aa", 2L), (2L, "a", "b", "ab", 1L)))
  }

  test("train on non-BMP corpus fuses whole codepoints") {
    val nonBmp = new String(Character.toChars(0x1D4B3))
    val merges = Bpe.train(docsDf((1L, s"$nonBmp$nonBmp $nonBmp$nonBmp")),
        "text", rounds = 1,
        persistRound = (_, df) => df.localCheckpoint())
      .collect()
    assert(merges.length == 1)
    assert(merges(0).getString(1) == nonBmp
      && merges(0).getString(2) == nonBmp
      && merges(0).getString(3) == nonBmp + nonBmp)
  }
}
