package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact top-k as a bounded-heap UDAF (SURVEY.md §7.3): each partition
  * keeps at most k (score, id) pairs, partial buffers merge by
  * re-bounding — so a grouped top-k is ONE partial-aggregate shuffle of
  * k rows per group, instead of the window formulation's full sort of
  * every scored row within each group. The window variant
  * ([[Search.topKPerQuery]]) stays as the SQL-oracle-checkable twin.
  *
  * Ordering matches the engine contract: score descending, id ascending
  * on ties (SURVEY.md §7.4).
  */
object TopKAggregator {

  type Hit = (Long, Double) // (id, score)

  private def bound(k: Int, buf: List[Hit]): List[Hit] =
    buf.sortBy { case (id, score) => (-score, id) }.take(k)

  def topK(k: Int): Aggregator[Hit, List[Hit], Seq[Hit]] =
    new Aggregator[Hit, List[Hit], Seq[Hit]] {
      override def zero: List[Hit] = Nil
      override def reduce(buf: List[Hit], in: Hit): List[Hit] = {
        // fast path: below the current k-th, skip the sort
        if (buf.size >= k) {
          val (lastId, lastScore) = buf.last
          if (in._2 < lastScore || (in._2 == lastScore && in._1 > lastId))
            return buf
        }
        bound(k, in :: buf)
      }
      override def merge(a: List[Hit], b: List[Hit]): List[Hit] =
        bound(k, a ++ b)
      override def finish(buf: List[Hit]): Seq[Hit] = buf
      // buffer is engine-internal → opaque kryo bytes; output must be
      // relational → a real struct-array encoder
      override def bufferEncoder: Encoder[List[Hit]] = Encoders.kryo[List[Hit]]
      override def outputEncoder: Encoder[Seq[Hit]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
    }

  /** Shared result-shaping tail for heap-UDAF searches: explode the
    * `hits` array to (queryIdCol, rank, vec_id, score) rows — ONE
    * definition of the rank/round contract for the batch (v10) and
    * streaming (s07) twins.
    */
  def explodeHits(df: org.apache.spark.sql.DataFrame, queryIdCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(col(queryIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(queryIdCol), (col("pos") + 1).cast("long").as("rank"),
        col("hit._1").as("vec_id"), round(col("hit._2"), 6).as("score"))
  }

  /** Column function: top_k(idCol, scoreCol) → array<struct<_1,_2>>. */
  def topKUdaf(k: Int): (Column, Column) => Column = {
    val fn = udaf(topK(k))
    (id, score) => fn(id, score)
  }
}
