package graft.operators

import graft.functions.TextFunctions.words
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval: BM25 scoring and reciprocal-rank fusion — the
  * lexical half of hybrid search. The reference retrieves by embedding
  * cosine only (server.js:217-265); production RAG engines pair that
  * with a term-match ranker and fuse the two rankings.
  *
  * All math is deterministic double arithmetic with fixed evaluation
  * order, so both rankers are SQL-oracle-checkable.
  *
  * Scale shape: corpus statistics (df, avg doclen) are one aggregation
  * pass each; scoring touches only postings of query terms (the term
  * filter prunes before any shuffle); per-query work is independent —
  * the classic distributed inverted-index formulation without
  * materializing an index.
  */
object TextSearch {

  /** Per-(doc, term) frequencies over lowercased whitespace tokens. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol),
        explode(words(lower(col(textCol)))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count("*").as("tf"))

  /** Build-once BM25 corpus statistics: per-doc lengths, per-(doc, term)
    * postings, and the (N, avgdl) corpus summary. Tokenization — the
    * expensive narrow pass over every document — runs exactly once per
    * frame here and is persisted, so any number of queries against the
    * same corpus reuse it (the same shape as the persisted vector
    * index, [[graft.operators.Ingest.buildIndex]]).
    *
    * OWNERSHIP: the index holds two persisted frames; the caller that
    * built it must call [[Bm25Index.release]] (or clear the session
    * cache) when done — the library never unpersists on its own.
    */
  case class Bm25Index(lens: DataFrame, postings: DataFrame,
                       corpus: DataFrame, idCol: String) {
    def release(): Unit = { lens.unpersist(); postings.unpersist() }
  }

  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String)
      : Bm25Index = {
    // lens kept separately from postings: zero-token docs still count
    // toward N and avgdl but have no postings rows
    val lens = docs.select(col(idCol),
      size(words(lower(col(textCol)))).cast("double").as("dl")).persist()
    val postings = termFrequencies(docs, idCol, textCol).persist()
    // materialize NOW: scoring evaluates corpus stats and the df
    // aggregate inside broadcast futures that run concurrently with the
    // main join job; racing readers of a lazily-persisted frame each
    // recompute the full tokenization scan (same fix as
    // Dedup.ngramJaccardPairs)
    lens.count()
    postings.count()
    val corpus = lens.agg(count("*").as("n"), avg("dl").as("avgdl"))
    Bm25Index(lens, postings, corpus, idCol)
  }

  /** BM25 scores for one tokenized query against a prebuilt index.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    * with the standard Robertson/Sparck-Jones idf
    * ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Only postings of the query's terms survive the first filter, so
    * everything downstream of the (already-built) index touches
    * O(matching docs) rows — the distributed inverted-index shape.
    */
  def bm25ScoresIndexed(index: Bm25Index, queryTerms: Seq[String],
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    val idCol = index.idCol
    val tf = index.postings.filter(col("term").isin(terms: _*))
    val df = tf.groupBy("term").agg(count("*").as("df"))
    tf.join(broadcast(df), "term")
      .join(index.lens, idCol)
      .crossJoin(broadcast(index.corpus))
      .select(col(idCol), col("term"),
        (log(lit(1.0) +
          (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("term_score"))
      .groupBy(col(idCol))
      .agg(sum("term_score").as("score"))
  }

  /** One-shot convenience over [[buildBm25Index]] +
    * [[bm25ScoresIndexed]]. OWNERSHIP: persists the transient index's
    * two frames; the caller evaluates the result and then clears them
    * (Bench/Verify do so via `spark.catalog.clearCache()`).
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScoresIndexed(buildBm25Index(docs, idCol, textCol), queryTerms, k1, b)

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Reciprocal-rank fusion of two rankings of the same id space:
    * rrf(d) = Σ_r 1/(c + rank_r(d)), missing-from-a-ranking contributes
    * nothing. The standard score-scale-free hybridizer.
    *
    * Each input is first truncated to its top `depth` rows via
    * orderBy+limit (TakeOrderedAndProject — per-partition heaps), so the
    * unpartitioned ranking window only ever sees ≤ depth rows; feeding a
    * corpus-sized ranking through a global row_number would funnel every
    * row to one task. depth ≥ corpus size makes the fusion exact;
    * smaller depths are the standard top-m approximation.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              c: Int = 60, depth: Int = 1000): DataFrame = {
    def ranked(df: DataFrame): DataFrame =
      df.orderBy(col("score").desc, col(idCol)).limit(depth)
        .withColumn("rrf",
          // partitionBy(lit) pins the (deliberate) single-partition
          // ranking stage without tripping WindowExec's no-partition
          // warning — its input is already capped at `depth` rows by the
          // TakeOrderedAndProject above, so one task is the right plan
          lit(1.0) / (lit(c) + row_number().over(
            Window.partitionBy(lit(0))
              .orderBy(col("score").desc, col(idCol)))))
        .select(col(idCol), col("rrf"))
    ranked(a).unionByName(ranked(b))
      .groupBy(col(idCol))
      .agg(sum("rrf").as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
