package graft

import graft.operators.TextAnalysis
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with most marker hits; und on none") {
    val got = docsDf(
        (1L, "the cat is on the mat and a dog"),
        (2L, "el perro es de la casa que es"),
        (3L, "der Hund und die Katze das ist"),
        (4L, "zzz qqq xxx"))
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "und"))
  }

  test("repetitionSignals: dup-word and top-bigram fractions") {
    val got = TextAnalysis.repetitionSignals(docsDf(
        (1L, "a b c d"),             // all distinct; 3 bigrams, all unique
        (2L, "spam spam spam spam"), // one word, one bigram repeated
        (3L, "x y x y x"),           // 2 distinct of 5; "x y" 2 of 4
        (4L, "")),                   // degenerate
      "doc_id", "text")
      .select("doc_id", "n_words", "dup_word_frac", "top_bigram_frac")
      .as[(Long, Long, Double, Double)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    assert(got(1L) == ((4L, 0.0, 1.0 / 3)))
    assert(got(2L) == ((4L, 0.75, 1.0)))
    assert(got(3L) == ((5L, 0.6, 0.5)))
    assert(got(4L) == ((0L, 0.0, 0.0)))
  }

  test("qualityFeatures: empty text scores 0 with zeroed features") {
    val r = TextAnalysis.qualityFeatures(docsDf((1L, "")), "doc_id", "text")
      .head()
    assert(r.getAs[Int]("n_words") == 0)
    assert(r.getAs[Double]("mean_word_len") == 0.0)
    assert(r.getAs[Double]("quality") == 0.0)
  }

  test("qualityFeatures: clean english prose passes all four gates") {
    val text = ("the quick brown fox jumps over a lazy dog and then " * 3).trim
    val r = TextAnalysis.qualityFeatures(docsDf((1L, text)), "doc_id", "text")
      .head()
    assert(r.getAs[Double]("quality") == 1.0)
  }

  test("tokenCounts: ws vs bpe-ish vs distinct") {
    val r = TextAnalysis.tokenCounts(docsDf((1L, "ab ab c4d e-f")),
      "doc_id", "text").head()
    assert(r.getAs[Int]("ws_tokens") == 4)
    // ab|ab|c|4|d|e|-|f
    assert(r.getAs[Int]("bpe_tokens") == 8)
    assert(r.getAs[Int]("distinct_tokens") == 3)
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val fps = docsDf((1L, "Hello  World"), (2L, "hello world"),
        (3L, "hello worlds"))
      .select(TextAnalysis.fingerprint(col("text")))
      .as[Long].collect().toSeq
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("relevantTokens: stopwords dropped, TF-ranked, ties alphabetical") {
    val got = TextAnalysis.relevantTokens(
        docsDf((1L, "the spark spark engine engine engine is a fast fast thing")),
        "doc_id", "text", 3)
      .select("rank", "token", "tf")
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "engine", 3L), (2, "fast", 2L), (3, "spark", 2L)))
  }

  test("tokenizeContent strips tags and truncates") {
    val got = Seq(Tuple1("<p>a <b>bold</b> word list here</p>"))
      .toDF("html")
      .select(TextFunctions.tokenizeContent(col("html"), 3))
      .as[Seq[String]].head()
    assert(got == Seq("a", "bold", "word"))
  }

  test("unigramSurprisal: mean -ln(corpus tf/total), blanks dropped") {
    val got = TextAnalysis.unigramSurprisal(
        docsDf((1L, "a a b"), (2L, "c"), (3L, "  ")), "doc_id", "text")
      .select("doc_id", "n_tokens", "avg_surprisal")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // vocab: a↦2 b↦1 c↦1, total 4; doc1 = (ln2+ln2+ln4)/3, doc2 = ln4
    assert(got == Seq(
      (1L, 3L, BigDecimal(2 * math.log(2) + math.log(4))./(3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (2L, 1L, 1.386294)))
  }

  test("redact is idempotent and leaves no digits behind") {
    val rng = new scala.util.Random(7)
    val words = Seq("alpha", "42", "x9y", "a@b.co", "no.reply+1@x.org",
      "<NUM>", "<EMAIL>", "7", "mail@mail", "end.")
    val samples = (1 to 60).map(_ =>
      Seq.fill(rng.nextInt(6) + 1)(words(rng.nextInt(words.length)))
        .mkString(" "))
    val got = samples.toDF("text")
      .select(col("text"), TextFunctions.redact(col("text")).as("r1"))
      .select(col("r1"), TextFunctions.redact(col("r1")).as("r2"))
      .as[(String, String)].collect()
    got.foreach { case (r1, r2) =>
      assert(r1 == r2, s"redact not idempotent on: $r1")
      assert(!r1.exists(_.isDigit), s"digits survived redaction: $r1")
    }
  }

  test("redact masks emails before digit runs, leaves clean text alone") {
    val got = Seq(
        "write to jo.doe+x@mail example.org", // no TLD dot → not an email
        "write to jo.doe+x@mail.example.org now",
        "card 4111 1111, pin 07",
        "no secrets here")
      .toDF("text")
      .select(TextFunctions.redact(col("text")))
      .as[String].collect().toSeq
    assert(got == Seq(
      // the digit pass never sees an address the email pass consumed
      "write to jo.doe+x@mail example.org",
      "write to <EMAIL> now",
      "card <NUM> <NUM>, pin <NUM>",
      "no secrets here"))
  }

  test("nfcNormalize composes decomposed sequences; ASCII is identity") {
    import graft.functions.TextFunctions.nfcNormalize
    val rows = Seq("cafe\u0301", "A\u030a", "plain ascii", "")
      .toDF("s")
      .select(col("s"), nfcNormalize(col("s")).as("n"),
        length(col("s")).as("lr"), length(col("n")).as("ln"))
      .collect()
    assert(rows(0).getString(1) == "caf\u00e9" && rows(0).getInt(3) == 4)
    assert(rows(1).getString(1) == "\u00c5")
    assert(rows(2).getString(1) == "plain ascii") // identity, fast path
    assert(rows(3).getString(1) == "")
    // idempotent: normalizing twice changes nothing
    val twice = Seq("o\u0308").toDF("s")
      .select(nfcNormalize(nfcNormalize(col("s")))).head.getString(0)
    assert(twice == "\u00f6")
  }

  test("dsirSelect ranks target-vocabulary docs above disjoint ones") {
    val docs = docsDf(
      (1L, "alpha beta gamma alpha beta"), // target
      (2L, "alpha beta delta"),            // target
      (3L, "alpha beta gamma"),            // raw, shares target n-grams
      (4L, "zebra quagga yak okapi"))      // raw, disjoint vocabulary
    val got = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        targetFlag = col("doc_id") <= 2L, buckets = 64, k = 10)
      .select("doc_id", "lw_units")
      .as[(Long, Long)].collect()
    // k=10 > 4 docs: all survive; output is doc_id-ordered
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val w = got.toMap
    // doc 3 re-uses the target's {uni,bi}grams; doc 4 shares none \u2014
    // its every bucket has p_cnt=0 so each feature contributes the
    // pure smoothing penalty and its weight must land strictly below
    assert(w(3L) > w(4L))
    // target docs themselves score at least as high as the disjoint doc
    assert(w(1L) > w(4L) && w(2L) > w(4L))
  }

  test("dsirSelect top-k keeps the k best Gumbel keys") {
    val docs = docsDf((1L to 20L).map(i =>
      (i, if (i <= 5) "alpha beta gamma" else "zebra quagga yak")): _*)
    val all = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        targetFlag = col("doc_id") <= 5L, buckets = 64, k = 20)
      .select("doc_id", "key_units").as[(Long, Long)].collect().toMap
    val top = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        targetFlag = col("doc_id") <= 5L, buckets = 64, k = 6)
      .select("doc_id", "key_units").as[(Long, Long)].collect().toMap
    assert(top.size == 6)
    val cutoff = top.values.min
    // every excluded doc keys strictly below the kept minimum (ties
    // impossible: integer keys + deterministic per-doc Gumbel hash)
    assert(all.filterNot { case (id, _) => top.contains(id) }
      .values.forall(_ < cutoff))
  }

  test("nbQualityClassifier separates held-out docs by class vocabulary") {
    // positive class (ids 1-15) speaks vocab A, negative (16-30) vocab B;
    // held-out = multiples of 5, so 3 unseen docs per class
    val docs = docsDf((1L to 30L).map(i =>
      (i, if (i <= 15) "alpha beta gamma alpha delta beta"
          else "zebra quagga yak okapi zebra yak")): _*)
    val got = TextAnalysis.nbQualityClassifier(docs, "doc_id", "text",
        buckets = 64,
        label = Some(col("doc_id") <= 15L),
        train = Some(col("doc_id") % 5 =!= 0))
      .as[(Long, Boolean, Long, Boolean)].collect()
    // exactly the held-out docs, one row each, doc_id-ordered
    assert(got.map(_._1).toSeq == Seq(5L, 10L, 15L, 20L, 25L, 30L))
    got.foreach { case (id, label, lo, pred) =>
      assert(label == (id <= 15L))
      assert(pred == (lo > 0), s"pred must be the sign of lo_units ($id)")
      // generalization: vocab-A docs keep, vocab-B docs drop
      assert(pred == label, s"doc $id misclassified (lo_units=$lo)")
    }
    // class separation is strict: every kept score above every dropped
    val (pos, neg) = got.partition(_._2)
    assert(pos.map(_._3).min > neg.map(_._3).max)
  }

  test("nbQualityClassifier production label/split run the same plan") {
    // defaults: t08 gate label + hash split — just pin the contract
    // (held-out rows only, pred = sign) on a small real-ish corpus
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = docsDf((1L to 30L).map(i =>
      (i, s"the cat and a dog of $filler is here")): _*)
    val got = TextAnalysis.nbQualityClassifier(docs, "doc_id", "text",
        buckets = 64)
      .as[(Long, Boolean, Long, Boolean)].collect()
    // md5("nbq:22")/("nbq:26") % 5 == 0: ids 22 and 26 are the held-out
    // slice of 1..30 under the production hash split
    assert(got.map(_._1).toSeq == Seq(22L, 26L))
    got.foreach { case (_, _, lo, pred) => assert(pred == (lo > 0)) }
  }

  test("pmiCollocations: exclusive pair tops the list, support gate holds") {
    // "nova york" only ever co-occur (5 times, passes minCount=5);
    // "rare pair" co-occurs 4 times (must be gated out); filler words
    // combine freely so their pairs carry no association
    val filler = "the cat the dog the bird the fish"
    val docs = docsDf(
      (1L, s"nova york $filler nova york"),
      (2L, s"nova york $filler rare pair"),
      (3L, s"rare pair $filler nova york"),
      (4L, s"rare pair $filler nova york"),
      (5L, s"rare pair $filler"))
    val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text",
        minCount = 5, k = 3)
      .as[(String, String, Long, Double)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.contains(("nova", "york")), s"missing exclusive pair: $got")
    assert(!pairs.contains(("rare", "pair")), "minCount gate failed")
    val ny = got.find(r => r._1 == "nova" && r._2 == "york").get
    assert(ny._3 == 5L)
    // exclusive adjacency maximizes the association: top PMI overall
    assert(ny._4 == got.map(_._4).max)
  }

  test("qualityEnsemble: ranks are permutations, rrf follows the " +
      "formula, repetition signal catches the degenerate doc") {
    val docs = docsDf(
      (1L, "the cat and a dog of value is here today"),
      (2L, "spam spam spam spam spam spam"),
      (3L, "a b a b a b a b"),
      (4L, "fresh words only appear once here now"),
      (5L, "x y z w q r s t u v"))
    val got = TextAnalysis.qualityEnsemble(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // each signal's ranks are a permutation of 1..n
    Seq(got.map(_._2), got.map(_._3), got.map(_._4)).foreach { rs =>
      assert(rs.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    }
    got.foreach { case (_, a, b, c, rrf) =>
      val want = BigDecimal(
          1.0 / (60 + a) + 1.0 / (60 + b) + 1.0 / (60 + c))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - want) < 1e-9)
    }
    // the single-token doc is the most repetitive: worst dup rank —
    // even though its perfectly predictable bigrams give it a GOOD
    // nll rank (exactly the disagreement the ensemble exists for)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(2L)._3 == 5L)
  }

  test("lmPerplexityBuckets: exact ntile terciles, monotone avg nll") {
    // 7 scorable docs (\u22652 tokens) + 2 excluded degenerates
    val docs = docsDf(
      (1L, "a b a b a b a b"),
      (2L, "a b c d"),
      (3L, "c d c d"),
      (4L, "x y z w"),
      (5L, "a b a b"),
      (6L, "p q r s t"),
      (7L, "m n m n"),
      (8L, "solo"), (9L, ""))
    val got = TextAnalysis.lmPerplexityBuckets(docs, "doc_id", "text")
      .as[(String, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq("head", "middle", "tail"))
    // ntile(3) of 7 rows = 3/2/2, extras to the first bucket
    assert(got.map(_._2).toSeq == Seq(3L, 2L, 2L))
    assert(got.map(_._3).sum == (1L to 7L).sum)
    // buckets are rank segments of the nll order, so averages ascend
    assert(got(0)._4 <= got(1)._4 && got(1)._4 <= got(2)._4)
  }

  test("lmPerplexityBuckets: repeated-bigram doc lands in head") {
    // powers-of-ten ids make every bucket's sum_ids decode its members
    val docs = docsDf(
      (1L, "a b a b a b a b a b a b"),    // dominant bigram everywhere
      (10L, "q w e r t y u i o p"),       // all-hapax bigrams
      (100L, "a b a b c d e f"),
      (1000L, "z z q q w w e e r r"))
    val byBucket = TextAnalysis.lmPerplexityBuckets(docs, "doc_id", "text")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // 4 docs \u2192 terciles 2/1/1; doc 1's positions are all the modal
    // "a b"/"b a" transitions, the lowest possible nll in this corpus
    assert(byBucket("head") % 10 == 1L,
      s"doc 1 must be a head member (head sum_ids=${byBucket("head")})")
  }
}
