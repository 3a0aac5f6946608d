package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization — the EXTREME compression rung of
  * vector serving (FAISS `IndexBinaryFlat` over sign codes; the
  * "binary quantization" knob in current vector stores): one bit per
  * dimension, bit_j = [x_j > 0], packed 32 bits per word, so a
  * 1536-d float32 vector (6,144 B) becomes 48 words carrying 192 B
  * of code — 32× — and distance is a HAMMING count: popcount of the
  * XOR, word by word. No training, no scales, no staleness; what it
  * gives up is magnitude (all information except the orthant), which
  * is why BQ serves as a coarse traversal/filter score with an exact
  * rerank tail restoring true scores
  * ([[graft.queries.VectorQueries.refDimBqServe]] — v62 — measures
  * the split at the reference dimension: 1,536 sign bits turn out to
  * resolve even the fixture's replica-cluster mates, hamming-only
  * recall 0.9, where PQ's 8-byte codes collapse them to 0.3).
  *
  * Packing convention (pinned by the SQL oracle): word w holds bits
  * 32w..32w+31, MSB-first — word = Σ_b bit(32w+b) · 2^(31−b),
  * computed as a Horner fold ((acc << 1) + bit). Words stay in
  * [0, 2^32), so BIGINT arithmetic never overflows on either engine.
  * Scoring convention: score = −hamming (larger = closer), ties by
  * id — the family's ordering rules, bit-compatible with the cosine
  * and −ADC walks.
  */
object Bq {

  /** Bits per packed word. 32 (not 64) keeps every word — and any
    * intermediate sum — comfortably inside signed-64 range, so the
    * DuckDB replay can build words by exact power-of-two arithmetic
    * instead of relying on wrap-around shifts.
    */
  val WordBits = 32

  /** The packed sign-bit code column for a `d`-wide vector column:
    * array<long> of d/32 words (requires 32 | d). Nested higher-order
    * functions — the outer `transform` enumerates words, the inner
    * Horner `aggregate` folds that word's 32 sign bits; one narrow
    * map over the corpus, no shuffle.
    */
  def packCol(vec: Column, d: Int): Column = {
    require(d % WordBits == 0, s"Bq.packCol: $WordBits must divide d=$d")
    transform(sequence(lit(0), lit(d / WordBits - 1)), w =>
      aggregate(sequence(lit(0), lit(WordBits - 1)), lit(0L),
        (acc, b) => shiftleft(acc, 1) +
          when(element_at(vec, (w * WordBits + b + 1).cast("int")) > 0,
            1L).otherwise(0L)))
  }

  /** (idCol, code) — the 192-B-per-vector resident representation. */
  def pack(vectors: DataFrame, idCol: String, vecCol: String,
           d: Int): DataFrame =
    vectors.select(col(idCol), packCol(col(vecCol), d).as("code"))

  /** Driver-side twin of [[packCol]] for the query vector. */
  def packQuery(q: Array[Float]): Seq[Long] = {
    require(q.length % WordBits == 0,
      s"Bq.packQuery: $WordBits must divide d=${q.length}")
    q.grouped(WordBits).map(_.foldLeft(0L) {
      (acc, x) => (acc << 1) + (if (x > 0) 1L else 0L)
    }).toSeq
  }

  /** −hamming(code, qWords): popcount of the per-word XOR, summed —
    * d/32 bit ops per evaluation instead of a d-wide float pass. */
  def negHammingCol(code: Column, qWords: Seq[Long]): Column = {
    val qLit = array(qWords.map(lit): _*)
    negate(aggregate(
      zip_with(code, qLit, (a, b) => bit_count(a.bitwiseXOR(b))
        .cast("long")),
      lit(0L), (acc, x) => acc + x))
  }
}
