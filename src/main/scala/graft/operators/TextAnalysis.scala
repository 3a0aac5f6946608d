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

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169, public): pick training documents whose hashed
    * n-gram distribution looks like a TARGET domain. The pipeline:
    *
    *   1. featurize every doc into hashed {uni,bi}gram counts over
    *      `buckets` buckets (md5-based so the SQL oracle replays it);
    *   2. fit two Laplace-smoothed bag-of-buckets models — p from the
    *      `targetFlag` subset, q from the whole corpus;
    *   3. per-doc log importance weight log w(x) = Σ_b c_b·(ln p_b −
    *      ln q_b);
    *   4. Gumbel top-k: key = log w + G_i with G_i = −ln(−ln(u_i)),
    *      u_i a deterministic per-doc hash uniform — equivalent to
    *      sampling k docs without replacement ∝ w(x) (the paper's
    *      resampling step, derandomized for testability).
    *
    * Determinism across engines: the per-BUCKET weight ln p_b − ln q_b
    * is computed once (≤`buckets` evaluations) and immediately rounded
    * to integer MICRO-units; every per-DOC sum is then exact Long
    * arithmetic — order-independent, so the doc scores are bit-equal in
    * Spark and DuckDB no matter how partial aggregation reorders the
    * additions. (The only residual risk is a libm ulp landing exactly
    * on a .5 micro-unit boundary — measure-zero in practice.)
    *
    * Scale shape (100 TB): one pass over the token stream into per-doc
    * bucket counts (partial-agg shuffle keyed (doc, bucket) — ≤`buckets`
    * rows per doc out of the map side). The model folds OFF that frame
    * (second agg over ~docs×buckets rows, collapsing to `buckets`
    * rows map-side), so the corpus is tokenized once; the frame is
    * persisted because model and scoring both read it. The fitted
    * model is KB-scale and broadcast; the final top-k is a TakeOrdered
    * heap, never a global sort.
    */
  /** Hashed {uni,bi}gram feature stream: one output row per feature
    * occurrence, all non-text columns carried through, `b` = the
    * md5-hashed bucket. Works on batch AND streaming frames (narrow:
    * filter + explode + hash, no state) — the shared featurizer of
    * [[dsirSelect]] and its streaming scoring twin. */
  def hashedNgramBuckets(df: DataFrame, textCol: String,
                         buckets: Int): DataFrame = {
    val others = df.columns.filterNot(_ == textCol).map(col)
    df.filter(trim(col(textCol)) =!= "")
      .withColumn("_ws", words(lower(col(textCol))))
      // unigrams ++ adjacent bigrams ("w1 w2"), hashed into buckets
      .select(others :+ explode(concat(col("_ws"),
        when(size(col("_ws")) >= 2,
          expr("transform(sequence(0, size(_ws) - 2)," +
            " i -> concat(_ws[i], ' ', _ws[i+1]))"))
          .otherwise(array().cast("array<string>")))).as("f"): _*)
      .select(others :+ (md5Long(col("f")) % buckets).as("b"): _*)
  }

  /** Fit the DSIR bucket model from a per-(doc, target-flag, bucket)
    * count frame: per-bucket integer micro-unit log importance ratio
    * `lwu` = round(1e6·(ln p̂_b − ln q̂_b)), Laplace-smoothed. ≤`buckets`
    * rows — a broadcastable artifact. */
  def dsirModel(docBuckets: DataFrame, buckets: Int): DataFrame = {
    val model = docBuckets.groupBy("b")
      .agg(sum("c").as("q_cnt"),
        sum(when(col("_tgt"), col("c")).otherwise(0L)).as("p_cnt"))
    val tot = model.agg(sum("q_cnt").as("qt"), sum("p_cnt").as("pt"))
    model.crossJoin(broadcast(tot))
      .select(col("b"),
        round(lit(1e6) *
          (log((col("p_cnt") + lit(1.0)) / (col("pt") + lit(buckets.toDouble))) -
           log((col("q_cnt") + lit(1.0)) / (col("qt") + lit(buckets.toDouble)))))
          .cast("long").as("lwu"))
  }

  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 targetFlag: Column, buckets: Int = 1024,
                 k: Int = 100): DataFrame = {
    val feats = hashedNgramBuckets(
      df.select(col(idCol), targetFlag.as("_tgt"), col(textCol)),
      textCol, buckets)
    val docBuckets = feats
      .groupBy(col(idCol), col("_tgt"), col("b"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val lw = dsirModel(docBuckets, buckets)
    val gumbelUnits =
      round(lit(-1e6) * log(-log(
        ((md5Long(concat(lit("dsir:"), col(idCol).cast("string"))) % 1000000L)
          .cast("double") + lit(0.5)) / lit(1e6)))).cast("long")
    docBuckets.join(broadcast(lw), "b")
      .groupBy(col(idCol))
      .agg(sum(col("c") * col("lwu")).as("lw_units"))
      .withColumn("key_units", col("lw_units") + gumbelUnits)
      .orderBy(col("key_units").desc, col(idCol))
      .limit(k)
      .orderBy(col(idCol))
  }

  /** Classifier-based quality filtering (the GPT-3 / LLaMA recipe —
    * Brown et al. 2020 App. A train a classifier against curated
    * reference text and keep crawl docs it scores highly; Touvron et
    * al. 2023 §2.1 do the same with a fastText model over
    * wiki-referenced pages). The strongest classifier buildable
    * without shipping external weights is multinomial Naive Bayes over
    * the [[hashedNgramBuckets]] feature space — count-based, so the
    * fit is closed-form (no SGD, no iteration order) and the whole
    * train→score→evaluate loop is exactly engine-portable.
    *
    * Pipeline (one relation out):
    *   1. label every non-empty doc with the t08 rule gate (all four
    *      [[qualityFeatures]] bands pass) — the "curated-like" proxy a
    *      real run replaces with reference-corpus membership;
    *   2. split 80/20 train/held-out by a salted doc-id hash (RNG-free,
    *      reproducible, independent of the label);
    *   3. fit NB on TRAIN only: per-bucket weight
    *      `wu = round(1e6·(ln p̂(b|pos) − ln p̂(b|neg)))` with Laplace
    *      smoothing over ALL `buckets` cells (a bucket unseen in
    *      training still carries the non-zero smoothed weight — the
    *      model frame is `range(buckets)` left-joined with counts, so
    *      held-out-only buckets score identically in both engines),
    *      plus a class-prior offset in the same micro-units;
    *   4. score the HELD-OUT docs: `lo_units = prior + Σ c_b·wu_b`,
    *      predict keep iff positive — emitting (doc_id, label,
    *      lo_units, pred), i.e. per-doc generalization evidence, not
    *      just resubstitution fit.
    *
    * Determinism: the t52 convention — each per-bucket log ratio and
    * the prior are rounded to integer MICRO-units immediately, so
    * every per-doc sum is exact Long arithmetic, order-independent
    * under partial aggregation.
    *
    * Scale shape (100 TB): the corpus is tokenized ONCE into the
    * persisted per-(doc, bucket) count frame (the same frame t52's
    * scoring reads); the model fold is a second aggregate collapsing
    * map-side to ≤`buckets` rows; the fitted model (≤`buckets` rows +
    * a 1-row prior) re-enters as a broadcast, so scoring never
    * shuffles the corpus — the only corpus-scale exchange is the
    * (doc, bucket) partial agg. Deployed, the label column comes from
    * a curated-membership join and the same plan holds.
    */
  def nbQualityClassifier(df: DataFrame, idCol: String, textCol: String,
                          buckets: Int = 1024,
                          label: Option[Column] = None,
                          train: Option[Column] = None): DataFrame = {
    val spark = df.sparkSession
    val base = df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), col(textCol))
    // label/train default to the production rules; both are evaluated
    // against the quality-feature frame (so a test can inject a
    // separable class or a fixed split through the same plan)
    val labelCol = label.getOrElse(
      col("n_words").between(20, 1000) &&
        col("mean_word_len").between(2.0, 12.0) &&
        col("stopword_ratio").between(0.01, 0.6) &&
        col("alnum_ratio") >= 0.6)
    val trainCol = train.getOrElse(
      md5Long(concat(lit("nbq:"), col(idCol).cast("string"))) % 5 =!= 0)
    val labeled = qualityFeatures(base, idCol, textCol)
      .select(col(idCol), labelCol.as("label"), trainCol.as("_train"))
    val docBuckets = hashedNgramBuckets(base, textCol, buckets)
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("c"))
      .join(labeled, idCol :: Nil)
      .persist()
    val counts = docBuckets.filter(col("_train"))
      .groupBy("b")
      .agg(sum(when(col("label"), col("c")).otherwise(0L)).as("cp"),
        sum(when(!col("label"), col("c")).otherwise(0L)).as("cn"))
    val tots = counts.agg(
      coalesce(sum("cp"), lit(0L)).as("pt"),
      coalesce(sum("cn"), lit(0L)).as("nt"))
    val model = spark.range(buckets).toDF("b")
      .join(counts, Seq("b"), "left")
      .na.fill(0L, Seq("cp", "cn"))
      .crossJoin(broadcast(tots))
      .select(col("b"),
        round(lit(1e6) * (
          log((col("cp") + lit(1.0)) / (col("pt") + lit(buckets.toDouble))) -
            log((col("cn") + lit(1.0)) / (col("nt") + lit(buckets.toDouble)))))
          .cast("long").as("wu"))
    val prior = labeled.filter(col("_train"))
      .agg(round(lit(1e6) * (
        log(sum(when(col("label"), 1L).otherwise(0L)) + lit(1.0)) -
          log(sum(when(!col("label"), 1L).otherwise(0L)) + lit(1.0))))
        .cast("long").as("prior_units"))
    docBuckets.filter(!col("_train"))
      .join(broadcast(model), "b")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("c") * col("wu")).as("_fw"))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col("label"),
        (col("_fw") + col("prior_units")).as("lo_units"),
        ((col("_fw") + col("prior_units")) > 0).as("pred"))
      .orderBy(col(idCol))
  }

  /** PMI collocation extraction (Church & Hanks 1990, public — the
    * association-ratio statistic behind collocation dictionaries and
    * phrase-vocabulary induction for tokenizers):
    *
    *   pmi(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )
    *
    * over adjacent word pairs, with a `minCount` support gate (PMI is
    * notoriously noisy on rare pairs — the gate is part of the
    * published method, not a shortcut). Top-`k` pairs by PMI, rounded
    * to 6dp BEFORE ranking (the t15 convention) with (w1, w2) ties, so
    * the cutoff is engine-portable.
    *
    * Float parity: both engines evaluate the ratio with the IDENTICAL
    * association — (bc/Tb) / ((uc1/Tu)·(uc2/Tu)), every operand cast
    * to double first — so the doubles agree bit-for-bit (IEEE ops are
    * deterministic given the same tree; only the SUM of such terms
    * would be order-sensitive, and there is none).
    *
    * Scale shape (100 TB): two counting aggregates over the token/
    * bigram streams (partial-agg shuffles on word keys, AQE-splittable
    * on stop-word skew), two scalar totals broadcast back, the
    * unigram-count joins are sort-merge on the word keys, and the
    * top-k is a TakeOrdered heap — no windows, no n² anywhere.
    */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
                      minCount: Int = 5, k: Int = 20): DataFrame = {
    val toks = df
      .select(col(idCol), words(lower(col(textCol))).as("_ws"))
      .filter(size(col("_ws")) >= 2)
    val uni = toks.select(explode(col("_ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("uc"))
    val tu = uni.agg(sum("uc").as("tu"))
    val bg = toks.select(explode(
        expr("transform(sequence(0, size(_ws) - 2)," +
          " i -> struct(_ws[i] AS w1, _ws[i+1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val tb = bc.agg(sum("n_pair").as("tb"))
    bc.filter(col("n_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("uc").as("uc1")), "w1")
      .join(uni.select(col("w").as("w2"), col("uc").as("uc2")), "w2")
      .crossJoin(broadcast(tu)).crossJoin(broadcast(tb))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log(
          (col("n_pair").cast("double") / col("tb").cast("double")) /
            ((col("uc1").cast("double") / col("tu").cast("double")) *
              (col("uc2").cast("double") / col("tu").cast("double")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
      .orderBy("w1", "w2")
  }

  /** Bigram-interpolated LM perplexity with CCNet-style head/middle/
    * tail bucketing (Wenzek et al. 2020, public — CCNet scores docs
    * with a KenLM 5-gram model and keeps perplexity terciles; this is
    * the same control loop with a corpus-fit interpolated bigram LM,
    * the strongest LM buildable without shipping external weights).
    *
    *   p(w2 | w1) = λ·c(w1 w2)/c(w1·) + (1−λ)·c(w2)/T
    *
    * over all adjacent positions of docs with ≥2 tokens; per-doc score
    * = mean −ln p (rounded to 6dp BEFORE ranking, the t15 convention,
    * so tercile boundaries resolve identically in both engines); docs
    * are then split into head/middle/tail terciles of the score order.
    *
    * Scale shape: counting models are three partial-agg shuffles over
    * the bigram stream (bigram, context, unigram); scoring re-joins
    * the stream to them — sort-merge equi-joins, AQE-splittable on
    * stop-word skew. The bigram frame feeds four consumers, so it is
    * persisted. The tercile assignment deliberately avoids a global
    * single-partition window: ranks come from `repartitionByRange` +
    * per-partition row_number + collected per-partition COUNTS folded
    * into exclusive offsets (the i10 distributed-id pattern,
    * Ingest.assignIdsDistributed) — a partition-count-sized driver
    * aggregate, never a row-sized one; tercile of rank r (1-based,
    * n rows) = ⌊(r−1)·3/n⌋, the exact ntile(3) partition.
    */
  /** Per-doc mean NLL under the corpus-fit interpolated bigram LM —
    * the scoring half of [[lmPerplexityBuckets]], factored out so
    * other consumers ([[qualityEnsemble]]) rank the same signal.
    * Emits `(idCol, n_bigrams, nll)` for every doc with ≥2 tokens;
    * nll rounds to 6dp here (the t15 before-ranking convention). */
  def lmDocNll(df: DataFrame, idCol: String, textCol: String,
               lambda: Double = 0.7): DataFrame = {
    val toks = df
      .select(col(idCol), words(lower(col(textCol))).as("_ws"))
      .filter(size(col("_ws")) >= 2)
    val bg = toks.select(col(idCol), explode(
        expr("transform(sequence(0, size(_ws) - 2)," +
          " i -> struct(_ws[i] AS w1, _ws[i+1] AS w2))")).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .persist()
    val uni = toks.select(col(idCol), explode(col("_ws")).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("uc"))
    // deliberately a separate driver count(), NOT an in-plan broadcast
    // scalar: measured at sf0.1, folding the total into the final plan
    // as a 1-row crossJoin SLOWED t58 2.3→4.0 s and t53 1.6→2.1 s (the
    // broadcast subquery serializes ahead of the probe-side stages the
    // separate action used to overlap with)
    val total = uni.count()
    val cc = bg.groupBy("w1").agg(count(lit(1)).as("cc"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val nll = -log(
      lit(lambda) * (col("bc") / col("cc")) +
        lit(1.0 - lambda) * (col("uc") / lit(total.toDouble)))
    bg
      .join(bc, Seq("w1", "w2"))
      .join(cc, Seq("w1"))
      .join(uc, col("w") === col("w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(nll), 6).as("nll"))
  }

  /** EXACT global 1-based rank by `order` without a single-partition
    * window (the i10 distributed-id pattern): repartitionByRange on
    * the order key, per-partition row_number, partition COUNTS folded
    * into exclusive offsets on the driver (a partition-count-sized
    * collect, never a row-sized one). Returns the ranked frame (input
    * columns + `outCol`) and the total row count. The order must be a
    * total order (tie-break on a unique key) or ranks are
    * partition-layout-dependent.
    */
  private[graft] def distributedRank(df: DataFrame, order: Seq[Column],
                                     outCol: String): (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val parted = df
      .repartitionByRange(spark.sparkContext.defaultParallelism, order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // eager: pins the sampled range layout
    val counts = parted.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .orderBy("_pid").collect()
    var acc = 0L
    val offsets = counts.map { r =>
      val row = (r.getInt(0), acc); acc += r.getLong(1); row
    }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("_pid", "_off")
    val ranked = parted
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(order: _*)))
      .join(broadcast(offDf), Seq("_pid"))
      .withColumn(outCol, col("_rn").cast("long") + col("_off"))
      .drop("_pid", "_rn", "_off")
    (ranked, acc)
  }

  def lmPerplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                          lambda: Double = 0.7): DataFrame = {
    val perDoc = lmDocNll(df, idCol, textCol, lambda)
    val (ranked, n) = distributedRank(perDoc,
      Seq(col("nll"), col(idCol)), "_rk")
    ranked
      // exact integer tercile: Spark's `div`, not double `/` + cast
      .withColumn("_tile", expr(s"((_rk - 1L) * 3L) div ${math.max(n, 1L)}L"))
      .groupBy(when(col("_tile") === 0L, "head")
        .when(col("_tile") === 1L, "middle")
        .otherwise("tail").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(idCol)).as("sum_ids"),
        round(avg(col("nll")), 6).as("avg_nll"))
      .orderBy("bucket")
  }

  /** Multi-signal quality ENSEMBLE (the published practice behind
    * FineWeb / Dolma-style curation: no single quality signal is
    * trusted alone — rule gates, repetition and LM perplexity are
    * combined): per-doc global ranks under three independent signals
    *   1. LM mean NLL ([[lmDocNll]], lower = more fluent),
    *   2. duplicate-word fraction ([[repetitionSignals]], lower =
    *      less degenerate),
    *   3. the t08 rule-gate score ([[qualityFeatures]], higher =
    *      cleaner surface),
    * fused with reciprocal-rank fusion (Cormack et al. 2009, the v13
    * statistic): `rrf = Σ 1/(60 + rank_i)`, top-`k` docs. Rank fusion
    * deliberately ignores the signals' incomparable scales — exactly
    * why RRF is the standard combiner.
    *
    * Engine-portability: every signal is rounded to 6dp BEFORE its
    * rank, ranks are total orders (doc-id ties), and the 3-term RRF
    * sum is evaluated with the identical left association in both
    * engines, then rounded before the final cut.
    *
    * Scale shape: ranks come from [[distributedRank]] (range exchange
    * + per-partition row_number + a partition-count-sized offset
    * broadcast — never a single-partition window); the three rank
    * frames are doc-keyed equi-joins; the final cut is a TakeOrdered
    * heap. The signal frames are one LM pass + two narrow projections.
    */
  def qualityEnsemble(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 50, rrfK: Int = 60): DataFrame = {
    val nll = lmDocNll(df, idCol, textCol).select(col(idCol), col("nll"))
    val rep = repetitionSignals(df, idCol, textCol)
      .select(col(idCol), round(col("dup_word_frac"), 6).as("dup"))
    val qf = qualityFeatures(df, idCol, textCol)
      .select(col(idCol), col("quality"))
    val base = nll.join(rep, Seq(idCol)).join(qf, Seq(idCol)).persist()
    def rankOf(c: String, ascending: Boolean, out: String) = {
      val order =
        if (ascending) Seq(col(c).asc, col(idCol).asc)
        else Seq(col(c).desc, col(idCol).asc)
      distributedRank(base.select(col(idCol), col(c)), order, out)
        ._1.select(col(idCol), col(out))
    }
    rankOf("nll", ascending = true, "r_nll")
      .join(rankOf("dup", ascending = true, "r_rep"), Seq(idCol))
      .join(rankOf("quality", ascending = false, "r_quality"), Seq(idCol))
      .withColumn("rrf", round(
        lit(1.0) / (lit(rrfK) + col("r_nll")) +
          lit(1.0) / (lit(rrfK) + col("r_rep")) +
          lit(1.0) / (lit(rrfK) + col("r_quality")), 6))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
      .orderBy(col(idCol))
  }
}
