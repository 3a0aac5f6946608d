package graft.operators

import graft.functions.HashFunctions.md5Long
import graft.functions.TextFunctions.{bpeTokenCount, words}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All deterministic,
  * all narrow column pipelines (no shuffle per document), all
  * SQL-oracle-expressible.
  */
object TextAnalysis {

  /** Tiny per-language marker-word lists (deterministic heuristic
    * stand-in for a real n-gram language model — fastText/CLD-class
    * models need bundled weights, which a zero-egress build can't ship).
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "est", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def markerHits(ws: Column, lang: String): Column =
    size(filter(ws, w => w.isin(markers(lang): _*)))

  /** Predicted language = argmax marker-hit count (ties broken by
    * language code order); no hits at all → "und" (undetermined),
    * matching BCP-47 practice.
    *
    * Implemented as ONE `greatest` over (hits, priority, lang) structs —
    * a when-chain fold would embed every hit count twice per level and
    * blow the expression tree up to 2^langs evaluations of the marker
    * filters.
    */
  def langId(textCol: Column): Column = {
    val ws = words(lower(textCol))
    val langs = markers.keys.toSeq.sorted
    val best = greatest(langs.zipWithIndex.map { case (l, i) =>
      struct(markerHits(ws, l).as("hits"),
        lit(langs.size - 1 - i).as("prio"), // earlier lang wins ties
        lit(l).as("lang"))
    }: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** DataFrame-level langId: tokenization runs ONCE in its own
    * projection (the column form re-derives the split per language —
    * Catalyst won't collapse the barrier because split isn't cheap, so
    * this shape does 1 split + 5 array scans per row instead of 5+5).
    */
  def langIdDf(df: DataFrame, textCol: String,
               outCol: String = "pred_lang"): DataFrame = {
    val langs = markers.keys.toSeq.sorted
    val withWs = df.withColumn("__ws", words(lower(col(textCol))))
    val withHits = langs.foldLeft(withWs) { (d, l) =>
      d.withColumn(s"__hits_$l", markerHits(col("__ws"), l))
    }
    val best = greatest(langs.zipWithIndex.map { case (l, i) =>
      struct(col(s"__hits_$l").as("hits"),
        lit(langs.size - 1 - i).as("prio"), lit(l).as("lang"))
    }: _*)
    withHits
      .withColumn(outCol,
        when(best.getField("hits") > 0, best.getField("lang"))
          .otherwise("und"))
      .drop(("__ws" +: langs.map(l => s"__hits_$l")): _*)
  }

  /** Quality features + a weighted score in [0, ~1]:
    *   - word count within [20, 1000] (length gate)
    *   - mean word length within [2, 12]
    *   - stopword ratio (en markers) within [0.01, 0.6]
    *   - alphanumeric character ratio >= 0.6
    * Each gate contributes 0.25. The shape follows the public C4/Gopher
    * rule-based quality filters.
    */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val ws = words(col(textCol))
    val nWords = size(ws)
    val meanWordLen =
      when(nWords === 0, lit(0.0))
        .otherwise(
          aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double")
            / nWords)
    val stopRatio =
      when(nWords === 0, lit(0.0))
        .otherwise(markerHits(transform(ws, lower(_)), "en").cast("double")
          / nWords)
    val alnumRatio =
      when(length(col(textCol)) === 0, lit(0.0))
        .otherwise(
          length(regexp_replace(col(textCol), "[^A-Za-z0-9]", ""))
            .cast("double") / length(col(textCol)))
    df.select(
      col(idCol),
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      stopRatio.as("stopword_ratio"),
      alnumRatio.as("alnum_ratio"),
      (when(nWords.between(20, 1000), 0.25).otherwise(0.0) +
        when(meanWordLen.between(2.0, 12.0), 0.25).otherwise(0.0) +
        when(stopRatio.between(0.01, 0.6), 0.25).otherwise(0.0) +
        when(alnumRatio >= 0.6, 0.25).otherwise(0.0)).as("quality"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): highly
    * repetitive documents are low-quality training data even when the
    * t08 surface gates pass. Emits per doc:
    *   - dup_word_frac: 1 − distinct/total words (word-level repetition)
    *   - top_bigram_frac: occurrences of the most frequent word bigram
    *     over all bigrams (phrase-level loops)
    * Bigrams come from a per-doc `lead` window over the exploded token
    * list — pure relational ops (one shuffle keyed by doc), no per-row
    * lambda loops, so the whole computation stays codegen'd and the
    * SQL oracle mirrors it with the same window.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol),
      posexplode(words(lower(col(textCol)))).as(Seq("pos", "w")))
    val wordStats = tok.groupBy(col(idCol))
      .agg(count("*").as("n_words"),
        countDistinct(col("w")).as("n_distinct"))
    val bigrams = tok
      .withColumn("nxt",
        lead("w", 1).over(Window.partitionBy(col(idCol)).orderBy("pos")))
      .filter(col("nxt").isNotNull)
      .select(col(idCol), concat(col("w"), lit(" "), col("nxt")).as("bg"))
    val bigramStats = bigrams.groupBy(col(idCol), col("bg"))
      .agg(count("*").as("c"))
      .groupBy(col(idCol))
      .agg(max("c").as("top_bg"), sum("c").as("n_bg"))
    df.select(col(idCol))
      .join(wordStats, Seq(idCol), "left")
      .join(bigramStats, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(lit(1.0) - col("n_distinct").cast("double") / col("n_words"),
          lit(0.0)).as("dup_word_frac"),
        coalesce(col("top_bg").cast("double") / col("n_bg"), lit(0.0))
          .as("top_bigram_frac"))
  }

  /** Per-document token counts: whitespace words and BPE-ish subword
    * tokens (see [[graft.functions.TextFunctions.bpeTokenCount]]).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(words(col(textCol))).as("ws_tokens"),
      bpeTokenCount(col(textCol)).as("bpe_tokens"),
      size(array_distinct(words(col(textCol)))).as("distinct_tokens"))

  /** 60-bit content fingerprint of whitespace-normalized, lowercased
    * text — the batch analog of a rolling hash (any doc pair with equal
    * fingerprints is an exact normalized duplicate).
    */
  def fingerprint(textCol: Column): Column =
    md5Long(array_join(words(lower(textCol)), " "))

  /** Per-document unigram surprisal — the perplexity-style quality
    * filter of CCNet/CC-style pipelines (Wenzek et al. 2020), with the
    * corpus itself as the language model: a doc whose tokens are
    * systematically improbable under the corpus unigram distribution is
    * an outlier (boilerplate, noise, wrong language). Emits per doc the
    * token count and mean −ln p(token), p = corpus tf / corpus total.
    *
    * Scale shape: one agg builds the vocabulary (tf per token), one
    * shuffle joins tokens back to it (AQE splits the stop-word skew),
    * one agg per doc. The token frame feeds both the vocab agg and the
    * join, so it is persisted and eagerly materialized (broadcast-
    * future recompute race — see round-2 notes); the materializing
    * count IS the corpus token total, so it folds into the surprisal
    * as a literal instead of a second full vocab aggregation.
    */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tok = df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), explode(words(lower(col(textCol)))).as("w"))
      .persist()
    val total = tok.count()
    val vocab = tok.groupBy("w").agg(count("*").as("tf"))
    tok.join(vocab, "w")
      .groupBy(col(idCol))
      .agg(count("*").as("n_tokens"),
        round(avg(-log(col("tf") / lit(total))), 6).as("avg_surprisal"))
  }

  /** Relevant-token extraction — deterministic stand-in for the
    * reference's LLM token scorer (reference embed.js:51-98; SURVEY.md
    * §2.1 O19): stopword filter + term-frequency ranking, top `k` tokens
    * per document (ties broken alphabetically). One partial-aggregated
    * shuffle keyed by (doc, token) + a ranking window keyed by doc.
    */
  def relevantTokens(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stop = markers("en")
    val tf = df
      .select(col(idCol), explode(words(lower(col(textCol)))).as("token"))
      .filter(!col("token").isin(stop: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count("*").as("tf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("token"))
    tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
