package graft

import graft.operators.Dedup
import graft.functions.TextFunctions.{shingles, words}
import org.apache.spark.sql.functions._

/** Dedup suite: exact dedup keeper semantics (INSERT OR IGNORE parity —
  * reference server.js:198), shingle/MinHash/LSH/SimHash invariants.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedup keeps the smallest id per duplicated text") {
    val df = docsDf((3L, "x"), (1L, "x"), (2L, "y"))
    val got = Dedup.exactDedup(df, "text", "doc_id")
      .orderBy("doc_id").as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 1L), ("y", 2L)))
  }

  test("exactDedup is idempotent: re-deduping changes nothing") {
    val df = docsDf((1L, "a"), (2L, "a"), (3L, "b"))
    val once = Dedup.exactDedup(df, "text", "doc_id")
    val twice = Dedup.exactDedup(once, "text", "doc_id")
    assert(once.orderBy("doc_id").collect().toSeq ==
      twice.orderBy("doc_id").collect().toSeq)
  }

  test("shingleSet emits distinct n-grams; short docs yield one shingle") {
    val got = Dedup.shingleSet(docsDf((1L, "a b c d"), (2L, "a b")),
        "doc_id", "text", 3)
      .orderBy("doc_id", "shingle").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a b c"), (1L, "b c d"), (2L, "a b")))
  }

  test("ngramJaccardPairs: identical docs score 1.0; disjoint docs absent") {
    val df = docsDf(
      (1L, "the quick brown fox jumps over"),
      (2L, "the quick brown fox jumps over"),
      (3L, "entirely different words here now"))
    val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
  }

  test("ngramJaccardPairs maxDf drops stop-shingles from pairing") {
    // the shared shingle appears in all 3 docs; maxDf=2 suppresses it
    val df = docsDf((1L, "a b c"), (2L, "a b c"), (3L, "a b c"))
    val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.1, maxDf = 2L)
    assert(got.count() == 0)
  }

  test("lineDedupKeepFirst: first occurrence survives, later copies drop") {
    // doc 1 lines: "a b", "c d"; doc 2 lines: "c d" (dup), "e f" (novel)
    val df = docsDf((1L, "a b c d"), (2L, "c d e f"))
    val got = Dedup.lineDedupKeepFirst(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (2L, 2L, 1L)))
  }

  test("lineDedupKeepFirst: duplicate line WITHIN one doc keeps only first") {
    val df = docsDf((1L, "a b a b"))
    val got = Dedup.lineDedupKeepFirst(df, "doc_id", "text", 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L)))
  }

  test("lineDedupRebuild emits surviving lines re-joined in order") {
    // doc 1 keeps everything; doc 2 loses its duplicate "c d" middle
    // line but keeps order around it; doc 3 loses EVERY line → absent
    val df = docsDf((1L, "a b c d"), (2L, "e f c d g h"), (3L, "a b c d"))
    val got = Dedup.lineDedupRebuild(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "a b c d"), (2L, 2L, "e f g h")))
  }

  test("decontaminate counts eval-set shingle overlap per corpus doc") {
    val evalSet = docsDf((100L, "w x y z"))
    // doc 1 shares shingles ("w x y", "x y z"); doc 2 shares none
    val corpus = docsDf((1L, "w x y z q"), (2L, "p q r s t"))
    val got = Dedup.decontaminate(corpus, evalSet, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L), (2L, 3L, 0L)))
  }

  test("decontaminate: zero-overlap docs still report their shingle count") {
    val got = Dedup.decontaminate(docsDf((1L, "a b c d")),
        docsDf((9L, "x y z")), "doc_id", "text", 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L)))
  }

  test("minHash: identical docs share full signature; length = numHashes") {
    val sigs = Dedup.minHash(docsDf((1L, "a b c d e"), (2L, "a b c d e")),
        "doc_id", "text", n = 3, numHashes = 16)
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    assert(sigs(0)._2.length == 16)
    assert(sigs(0)._2 == sigs(1)._2)
    assert(sigs(0)._2.forall(_ >= 0L))
  }

  test("lshCandidatePairs surfaces identical docs with est_jaccard 1.0") {
    val sigs = Dedup.minHash(
      docsDf((1L, "a b c d e f g"), (2L, "a b c d e f g"),
        (3L, "q r s t u v w")),
      "doc_id", "text", n = 3, numHashes = 16)
    val got = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
  }

  test("simHashNearDupPairs: block join finds all pairs within the radius") {
    val docs = docsDf(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical → hamming 0
      (3L, "alpha beta gamma delta epsilon eta"),  // near
      (4L, "totally different words everywhere here now"))
    val fp = Dedup.simHashDocs(docs, "doc_id", "text", bits = 16)
    val blocked = Dedup.simHashNearDupPairs(fp, "doc_id", 16, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth by brute force
    val hs = fp.as[(Long, Long)].collect().toMap
    val exact = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3
    } yield (a, b)).toSet
    assert(blocked == exact)
    assert(blocked.contains((1L, 2L)))
  }

  test("simHashNearDupPairs: hot (block, block_val) bucket trips the " +
      "guard instead of fanning out quadratically") {
    // template-heavy corpus: every doc identical → identical fingerprints
    // → ONE bucket holds all rows per block
    val docs = docsDf((1L to 8L).map(i => (i, "alpha beta gamma delta")): _*)
    val fp = Dedup.simHashDocs(docs, "doc_id", "text", bits = 16)
    val e = intercept[Exception] {
      Dedup.simHashNearDupPairs(fp, "doc_id", 16, maxHamming = 3,
        maxBucketRows = 4L).collect()
    }
    assert(e.getMessage.contains("maxBucketRows") ||
      e.getCause != null && e.getCause.getMessage.contains("maxBucketRows"))
    // same corpus passes under the default cap and still finds the pairs
    val ok = Dedup.simHashNearDupPairs(fp, "doc_id", 16, maxHamming = 3)
      .count()
    assert(ok == 8L * 7 / 2)
  }

  test("simHashNearDupGroups: the template-heavy corpus that trips the " +
      "pair guard collapses to one self row; cross rows match brute " +
      "force over distinct fingerprints") {
    // 8 identical docs + 1 near-dup + 1 far doc
    val docs = docsDf(
      ((1L to 8L).map(i => (i, "alpha beta gamma delta epsilon zeta")) ++
        Seq((20L, "alpha beta gamma delta epsilon eta"),
          (30L, "totally different words everywhere here now"))): _*)
    val fp = Dedup.simHashDocs(docs, "doc_id", "text", bits = 16)
    val got = Dedup.simHashNearDupGroups(fp, "doc_id", 16, maxHamming = 3)
      .select("sh_a", "sh_b", "hamming", "n_a", "n_b", "keeper_a",
        "keeper_b")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // the 8-doc template is ONE self row (28 pair-level rows collapsed)
    val selfRows = got.filter(r => r._1 == r._2)
    assert(selfRows.size == 1 && selfRows.head._4 == 8L &&
      selfRows.head._6 == 1L, s"self rows: $selfRows")
    // cross rows = brute force over the distinct fingerprints
    val hs = fp.as[(Long, Long)].collect().groupBy(_._2)
      .map { case (sh, rows) => sh -> rows.map(_._1).min }
    val exact = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if java.lang.Long.bitCount(a ^ b) <= 3
    } yield (a, b)).toSet
    assert(got.filter(r => r._1 != r._2).map(r => (r._1, r._2)) == exact)
    spark.catalog.clearCache()
  }

  test("simHash: equal docs equal fingerprints, hamming 0; bounded bits") {
    val fp = Dedup.simHashDocs(
        docsDf((1L, "a b c"), (2L, "a b c"), (3L, "x y z w")),
        "doc_id", "text", bits = 16)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(fp(0)._2 == fp(1)._2)
    assert(fp.forall { case (_, h) => h >= 0 && h < (1L << 16) })
    val hd = Seq((fp(0)._2, fp(1)._2), (fp(0)._2, fp(2)._2))
      .toDF("a", "b")
      .select(Dedup.hammingDist(col("a"), col("b"))).as[Long].collect()
    assert(hd(0) == 0L)
  }

  test("updateJaccardIndex: incremental == full rebuild (new-new and " +
      "new-old pairs)") {
    // base: docs 1-2 share shingles; delta: 10 near-dups 1, 11 near-dups
    // 10 (new-new), 12 is novel
    val base = docsDf((1L, "w x y z q a"), (2L, "w x y z r b"))
    val delta = docsDf((10L, "w x y z q c"), (11L, "w x y z q d"),
      (12L, "completely different words here"))
    val full = Dedup.ngramJaccardPairs(base.unionByName(delta),
        "doc_id", "text", 3, 0.1, 1000L)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val ix = Dedup.buildJaccardIndex(base, "doc_id", "text", 3, 0.1, 1000L)
    val (updated, overflowed) = Dedup.updateJaccardIndex(ix, delta,
      "doc_id", "text", 3, 0.1, 1000L)
    assert(overflowed.count() == 0)
    val inc = updated.pairs.select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full)
    // the incremental pair set includes new-old (1,10) and new-new (10,11)
    assert(inc.exists(p => p._1 == 1L && p._2 == 10L))
    assert(inc.exists(p => p._1 == 10L && p._2 == 11L))
    spark.catalog.clearCache()
  }

  test("updateJaccardIndex reports shingles that crossed maxDf") {
    // maxDf = 2: the shared shingle's list holds 2 base docs; a delta
    // doc pushes it to 3 -> overflow reported (rebuild required)
    val base = docsDf((1L, "a b c"), (2L, "a b c"))
    val delta = docsDf((10L, "a b c"))
    val ix = Dedup.buildJaccardIndex(base, "doc_id", "text", 3, 0.5, 2L)
    val (_, overflowed) = Dedup.updateJaccardIndex(ix, delta,
      "doc_id", "text", 3, 0.5, 2L)
    assert(overflowed.count() >= 1)
    spark.catalog.clearCache()
  }

  test("updateJaccardIndex sidecars the delta: base untouched, " +
      "mergedPostings == from-scratch build") {
    val base = docsDf((1L, "w x y z q a"), (2L, "w x y z r b"))
    val delta = docsDf((10L, "w x y z q c"), (12L, "novel words here"))
    val ix = Dedup.buildJaccardIndex(base, "doc_id", "text", 3, 0.1, 1000L)
    val (upd, _) = Dedup.updateJaccardIndex(ix, delta,
      "doc_id", "text", 3, 0.1, 1000L)
    // LSM contract: the base artifact is returned by reference, the
    // delta rides a sidecar — per-update work cannot be O(base rewrite)
    assert(upd.postings eq ix.postings)
    assert(upd.deltas.size == 1)
    val merged = upd.mergedPostings
      .as[(Long, Seq[Long])].collect().toSet
    val scratch = Dedup
      .buildJaccardIndex(base.unionByName(delta), "doc_id", "text",
        3, 0.1, 1000L)
      .postings.as[(Long, Seq[Long])].collect().toSet
    assert(merged == scratch)
    spark.catalog.clearCache()
  }

  test("compactJaccardIndex folds sidecars without changing " +
      "postings, sizes or pairs") {
    val base = docsDf((1L, "w x y z q a"), (2L, "w x y z r b"))
    val delta = docsDf((10L, "w x y z q c"), (11L, "w x y z q d"))
    val ix = Dedup.buildJaccardIndex(base, "doc_id", "text", 3, 0.1, 1000L)
    val (upd, _) = Dedup.updateJaccardIndex(ix, delta,
      "doc_id", "text", 3, 0.1, 1000L)
    val compacted = Dedup.compactJaccardIndex(upd)
    assert(compacted.deltas.isEmpty)
    assert(compacted.postings.as[(Long, Seq[Long])].collect().toSet ==
      upd.mergedPostings.as[(Long, Seq[Long])].collect().toSet)
    assert(compacted.sizes.as[(Long, Long)].collect().toSet ==
      upd.sizes.as[(Long, Long)].collect().toSet)
    assert(compacted.pairs.select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet ==
      upd.pairs.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet)
    // compacting a delta-free index is the identity
    assert(Dedup.compactJaccardIndex(compacted) eq compacted)
    spark.catalog.clearCache()
  }

  test("two sequential updates compose to the full rebuild " +
      "(the s10 induction, unit-sized)") {
    val base = docsDf((1L, "w x y z q a"), (2L, "w x y z r b"))
    val d1 = docsDf((10L, "w x y z q c"))
    val d2 = docsDf((11L, "w x y z q d"), (12L, "all novel text"))
    val full = Dedup.ngramJaccardPairs(base.unionByName(d1).unionByName(d2),
        "doc_id", "text", 3, 0.1, 1000L)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val ix0 = Dedup.buildJaccardIndex(base, "doc_id", "text", 3, 0.1, 1000L)
    val (ix1, o1) = Dedup.updateJaccardIndex(ix0, d1,
      "doc_id", "text", 3, 0.1, 1000L)
    val (ix2, o2) = Dedup.updateJaccardIndex(ix1, d2,
      "doc_id", "text", 3, 0.1, 1000L)
    assert(o1.count() == 0 && o2.count() == 0)
    assert(ix2.deltas.size == 2) // one sidecar per update, base shared
    assert(ix2.postings eq ix0.postings)
    assert(ix2.pairs.select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet == full)
    spark.catalog.clearCache()
  }

  test("maxDf overflow -> rebuild: the reported condition drives a " +
      "rebuild that matches the full-corpus result") {
    // maxDf=2: base list for the shared shingle holds docs 1,2 (kept,
    // pair (1,2) scored); the delta pushes it to 3 — overflow. The
    // stale incremental pairs STILL contain (1,2), but a full rebuild
    // drops the now-stop shingle and the pair with it. The operator's
    // report is the rebuild trigger; this pins the whole path.
    val base = docsDf((1L, "a b c"), (2L, "a b c"))
    val delta = docsDf((10L, "a b c"))
    val ix = Dedup.buildJaccardIndex(base, "doc_id", "text", 3, 0.5, 2L)
    val (updated, overflowed) = Dedup.updateJaccardIndex(ix, delta,
      "doc_id", "text", 3, 0.5, 2L)
    assert(overflowed.count() >= 1) // the rebuild signal
    // the un-rebuilt index is stale: it keeps the pre-overflow pair
    assert(updated.pairs.count() == 1)
    // caller reacts by rebuilding over base ∪ delta: exactness restored
    val rebuilt = Dedup.buildJaccardIndex(base.unionByName(delta),
      "doc_id", "text", 3, 0.5, 2L)
    val oracle = Dedup.ngramJaccardPairs(base.unionByName(delta),
        "doc_id", "text", 3, 0.5, 2L)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(rebuilt.pairs.select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet == oracle)
    assert(oracle.isEmpty) // the shared shingle is now a stop-shingle
    spark.catalog.clearCache()
  }

  test("substringSpans: maximal shared runs merge consecutive shingle " +
      "matches at one alignment") {
    // docs 1 and 2 share the 6-token run "p q r s t u" (and nothing
    // longer); with w=3, minRun=5 that is 4 consecutive shingle
    // matches -> one maximal run of 6 tokens at a single alignment
    val df = docsDf(
      (1L, "a b p q r s t u c d"),
      (2L, "x p q r s t u y z"),
      (3L, "completely different words here"))
    val got = Dedup.substringSpans(df, "doc_id", "text", w = 3,
        maxDf = 10L, minRunTokens = 5)
      .orderBy("id_a", "id_b", "pos_a")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // "p" is token 2 (0-based) in doc 1, token 1 in doc 2
    assert(got == Seq((1L, 2L, 2L, 1L, 6L)))
  }

  test("substringSpans: two alignments yield two separate runs; " +
      "short sub-runs filtered") {
    // doc 2 repeats doc 1's run twice at different offsets: each is
    // its own alignment group, reported separately
    val df = docsDf(
      (1L, "m n o p q"),
      (2L, "m n o p q z z m n o p q"))
    val got = Dedup.substringSpans(df, "doc_id", "text", w = 3,
        maxDf = 10L, minRunTokens = 5)
      .orderBy("id_a", "id_b", "pos_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L, 0L, 5L), (1L, 2L, 0L, 7L, 5L)))
  }

  test("substringSpans equals a brute-force reference on random " +
      "small-vocab corpora") {
    // independent plain-Scala implementation of the ExactSubstr
    // criterion: positional shingling, df cap, per-alignment
    // consecutive-run merge
    def refSpans(docs: Seq[(Long, String)], w: Int, maxDf: Int,
                 minRun: Int): Set[(Long, Long, Long, Long, Long)] = {
      def toks(s: String) =
        if (s.trim.isEmpty) Seq.empty[String]
        else s.trim.split("\\s+").toSeq
      val sh = docs.map { case (id, t) =>
        val ws = toks(t)
        id -> (if (ws.length <= w) Seq(0 -> ws.mkString(" "))
               else (0 to ws.length - w)
                 .map(i => i -> ws.slice(i, i + w).mkString(" ")))
      }
      val df = sh.flatMap(_._2.map(_._2)).groupBy(identity)
        .view.mapValues(_.size).toMap
      val kept = sh.map { case (id, ss) =>
        id -> ss.filter(p => df(p._2) <= maxDf)
      }
      (for {
        (ia, sa) <- kept; (ib, sb) <- kept if ia < ib
        matches = for { (pa, ga) <- sa; (pb, gb) <- sb if ga == gb }
          yield (pa, pb)
        ((_: Long), group) <- matches.groupBy { case (pa, pb) =>
          (pa - pb).toLong }
        runs = {
          val sorted = group.map(_._1).sorted
          // split consecutive position runs
          sorted.foldLeft(List.empty[List[Int]]) {
            case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
              (p :: acc.head) :: acc.tail
            case (acc, p) => List(p) :: acc
          }
        }
        run <- runs
        len = run.size + w - 1 if len >= minRun
        pa = run.min
      } yield (ia, ib, pa.toLong,
        (pa - (group.head._1 - group.head._2)).toLong, len.toLong))
        .toSet
    }
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val rng = new scala.util.Random(77)
    for (_ <- 1 to 3) {
      val docs = (1L to 8L).map { id =>
        val n = 5 + rng.nextInt(26)
        (id, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.substringSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", w = 3, maxDf = 1000L, minRunTokens = 5)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == refSpans(docs, 3, 1000, 5),
        s"mismatch on corpus: $docs")
      spark.catalog.clearCache()
    }
  }

  test("removeSpans equals a brute-force reference on a random " +
      "small-vocab corpus (spans from the real detector)") {
    val vocab = Vector("a", "b", "c", "d")
    val rng = new scala.util.Random(31)
    val docs = (1L to 6L).map { id =>
      val n = 8 + rng.nextInt(18)
      (id, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val spansDf = Dedup.substringSpans(df, "doc_id", "text", w = 3,
      maxDf = 1000L, minRunTokens = 5)
    val spans = spansDf
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val got = Dedup.removeSpans(df, spansDf, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // reference: for every doc that is an id_b, drop tokens covered by
    // any of its spans, rebuild, md5
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val byDoc = docs.toMap
    val expected = spans.map(_._2).distinct.sorted.map { id =>
      val toks = byDoc(id).split(" ").toSeq
      val covered = spans.collect {
        case (_, `id`, _, pb, run) => (pb until pb + run)
      }.flatten.toSet
      val keptToks = toks.zipWithIndex
        .collect { case (t, i) if !covered.contains(i.toLong) => t }
      (id, toks.size.toLong, keptToks.size.toLong,
        m(keptToks.mkString(" ")))
    }
    assert(got == expected, s"docs=$docs spans=$spans")
    spark.catalog.clearCache()
  }

  test("removeSpans: later doc loses the shared run, overlapping spans " +
      "need no merge, full dup reconstructs to empty") {
    val docs = docsDf(
      (1L, "a b c d e"),
      (2L, "x a b c d e y"), // loses the middle 5 tokens
      (3L, "a b c d e"))     // full dup of 1 -> empty after removal
    val spans = Seq(
      (1L, 2L, 0L, 1L, 5L),
      // overlapping second span over doc 2 (from another partner):
      // covered set is the union, tokens removed once
      (1L, 2L, 0L, 2L, 4L),
      (1L, 3L, 0L, 0L, 5L))
      .toDF("id_a", "id_b", "pos_a", "pos_b", "run_tokens")
    val got = Dedup.removeSpans(docs, spans, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // doc 1 is never an id_b -> not affected, absent from the output;
    // doc 2's spans cover positions 1-5 (union) -> "x" and "y" survive
    assert(got == Seq(
      (2L, 7L, 2L, m("x y")),
      (3L, 5L, 0L, m(""))))
  }

  test("semanticDedup: keep-first within a cluster, clusters isolated, " +
      "below-threshold mates survive") {
    import graft.operators.Ann
    // two well-separated clusters on axes 0/1; within cluster A, ids
    // 1 and 2 are near-identical (cos ≈ 1) and 5 is orthogonal-ish
    def v(x: Double, y: Double, z: Double) = Seq(x, y, z).map(_.toFloat)
    val emb = Seq(
      (1L, v(1.0, 0.0, 0.0)),   // cluster A, kept (first)
      (2L, v(0.999, 0.001, 0.0)), // dup of 1 -> dropped
      (5L, v(0.6, 0.0, 0.8)),   // cluster A but cos(1,5)=0.6 -> kept
      (7L, v(0.0, 1.0, 0.0)),   // cluster B, kept (first)
      (9L, v(0.0, 0.999, 0.001))) // dup of 7 -> dropped
      .toDF("vec_id", "embedding")
    val centroids = Seq((0L, v(1.0, 0.0, 0.0)), (1L, v(0.0, 1.0, 0.0)))
      .toDF("centroid_id", "centroid")
    val got = Dedup.semanticDedup(emb, centroids, "vec_id", "embedding",
        tau = 0.9)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 0L, true), (2L, 0L, false), (5L, 0L, true),
      (7L, 1L, true), (9L, 1L, false)))
  }

  test("updateSubstrIndex: two-step incremental == full rebuild " +
      "(new-old and new-new spans); base index untouched") {
    val base = docsDf(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f zz yy xx ww"))
    val d1 = docsDf((10L, "qq a b c d e f g h rr"))
    val d2 = docsDf((11L, "qq a b c d e f g h rr ss"))
    def spans(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "pos_a", "pos_b", "run_tokens")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val full = Dedup.buildSubstrIndex(
      base.unionByName(d1).unionByName(d2),
      "doc_id", "text", w = 3, maxDf = 1000L, minRunTokens = 5)
    val ix0 = Dedup.buildSubstrIndex(base, "doc_id", "text",
      w = 3, maxDf = 1000L, minRunTokens = 5)
    val (ix1, o1) = Dedup.updateSubstrIndex(ix0, d1, "doc_id", "text",
      w = 3, maxDf = 1000L, minRunTokens = 5)
    val (ix2, o2) = Dedup.updateSubstrIndex(ix1, d2, "doc_id", "text",
      w = 3, maxDf = 1000L, minRunTokens = 5)
    assert(o1.count() == 0 && o2.count() == 0)
    val inc = spans(ix2.spans)
    assert(inc == spans(full.spans))
    // LSM contract: base returned by reference, deltas ride sidecars
    assert(ix2.base eq ix0.base)
    assert(ix2.deltas.size == 2)
    // new-old (1,10) and new-new (10,11) spans both present
    assert(inc.exists(r => r._1 == 1L && r._2 == 10L))
    assert(inc.exists(r => r._1 == 10L && r._2 == 11L))
    // compaction folds sidecars without changing index rows or spans
    val compacted = Dedup.compactSubstrIndex(ix2)
    assert(compacted.deltas.isEmpty)
    assert(spans(compacted.spans) == inc)
    assert(compacted.mergedIndex.count() == ix2.mergedIndex.count())
    spark.catalog.clearCache()
  }

  test("updateSubstrIndex reports a maxDf crossing that invalidates " +
      "prior spans, and skips all-new over-cap shingles") {
    val base = docsDf((1L, "a b c d e f"), (2L, "a b c d e g"))
    val ix = Dedup.buildSubstrIndex(base, "doc_id", "text",
      w = 3, maxDf = 2L, minRunTokens = 3)
    // "a b c" has df=2 in the base (prior matches exist); the delta
    // pushes it to 3 -> rebuild required, reported
    val (_, over) = Dedup.updateSubstrIndex(ix,
      docsDf((10L, "a b c h i j")), "doc_id", "text",
      w = 3, maxDf = 2L, minRunTokens = 3)
    assert(over.count() >= 1)
    // an over-cap shingle seen ONLY in the delta is dropped identically
    // by update and rebuild: no rebuild signal
    val (_, over2) = Dedup.updateSubstrIndex(ix,
      docsDf((20L, "p q r s"), (21L, "p q r t"), (22L, "p q r u")),
      "doc_id", "text", w = 3, maxDf = 2L, minRunTokens = 3)
    assert(over2.count() == 0)
    spark.catalog.clearCache()
  }

  test("semanticDedup: oversized cluster trips the guard instead of " +
      "fanning out quadratically") {
    def v(x: Double) = Seq(x.toFloat, 0.0f)
    val emb = (1L to 10L).map(i => (i, v(1.0))).toDF("vec_id", "embedding")
    val centroids = Seq((0L, v(1.0))).toDF("centroid_id", "centroid")
    val e = intercept[Exception] {
      Dedup.semanticDedup(emb, centroids, "vec_id", "embedding",
        tau = 0.9, maxClusterSize = 5L).collect()
    }
    assert(e.getMessage.contains("maxClusterSize") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("maxClusterSize"))
  }

  test("fuzzyNameJoin finds exactly the distance-1 pairs, with support") {
    val df = Seq(
      "old bolt", "old bolt", "cold bolt", // deletion pair, n=2 vs n=1
      "red bolt",                          // dist 2 from "old bolt": absent
      "gear", "bear",                      // substitution pair
      "ring", "rings",                     // insertion pair
      "widget").toDF("name")
    val got = Dedup.fuzzyNameJoin(df, "name")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.toSet == Set(
      ("bear", "gear", 1L, 1L, 1L),
      ("cold bolt", "old bolt", 1L, 1L, 2L),
      ("ring", "rings", 1L, 1L, 1L)))
  }

  test("fuzzyNameJoin equals brute-force lev<=1 pairs on random corpora") {
    // small alphabet + short strings maximize near-miss density: the
    // del-1 blocking must be a SOUND candidate generator (no missed
    // pair) and the verify exact (no extra pair) — checked against an
    // independent DP Levenshtein over all distinct pairs
    val rng = new scala.util.Random(42)
    def randName() =
      (1 to rng.nextInt(5) + 1).map(_ => ('a' + rng.nextInt(3)).toChar)
        .mkString
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (round <- 1 to 3) {
      val names = Seq.fill(30)(randName())
      val got = Dedup.fuzzyNameJoin(names.toDF("name"), "name")
        .select("name_a", "name_b").as[(String, String)].collect().toSet
      val distinct = names.distinct
      val want = (for {
        a <- distinct; b <- distinct if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      assert(got == want, s"round $round: got=$got want=$want")
    }
  }

  test("fuzzyNameJoin: shared variant at distance 2 is verified away") {
    // "ab" and "ba" share del-1 variants "a" and "b" but lev = 2 —
    // the candidate must NOT survive the exact verify; identical
    // values collapse (never a self pair)
    val df = Seq("ab", "ba", "ab").toDF("name")
    val got = Dedup.fuzzyNameJoin(df, "name").collect()
    assert(got.isEmpty)
  }
}
