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
}
