package graft

import graft.operators.Chunker
import org.apache.spark.sql.functions._

/** The reference chunker contract (reference embed.js:183-207): windows of
  * `chunkSize` words advancing by chunkSize - overlap; always at least one
  * chunk, even for empty/short docs.
  */
class ChunkerSpec extends SparkSpec {

  private def chunksOf(text: String, n: Int, m: Int): Seq[String] = {
    import spark.implicits._
    Chunker.chunk(docsDf((1L, text)), "text", n, m)
      .orderBy("chunk_ix").select("chunk").as[String].collect().toSeq
  }

  test("empty doc still yields one (empty) chunk") {
    assert(chunksOf("", 5, 2) == Seq(""))
  }

  test("doc shorter than chunkSize is a single chunk") {
    assert(chunksOf("a b c", 5, 2) == Seq("a b c"))
  }

  test("doc of exactly chunkSize words is a single chunk") {
    assert(chunksOf("a b c d e", 5, 2) == Seq("a b c d e"))
  }

  test("windows advance by chunkSize - overlap and cover the tail") {
    // 7 words, size 5, overlap 2 → stride 3 → chunks at 0 and 3
    assert(chunksOf("a b c d e f g", 5, 2) ==
      Seq("a b c d e", "d e f g"))
  }

  test("adjacent chunks overlap by exactly `overlap` words mid-doc") {
    val cs = chunksOf((1 to 20).map(i => s"w$i").mkString(" "), 8, 3)
    val first = cs.head.split(" ").toSeq
    val second = cs(1).split(" ").toSeq
    assert(first.takeRight(3) == second.take(3))
  }

  test("every word appears in at least one chunk") {
    val text = (1 to 57).map(i => s"w$i").mkString(" ")
    val cs = chunksOf(text, 10, 4)
    val covered = cs.flatMap(_.split(" ")).toSet
    assert((1 to 57).map(i => s"w$i").toSet == covered)
  }

  test("chunk count matches 1 + ceil(max(0, w - n) / stride)") {
    for ((w, n, m) <- Seq((100, 40, 10), (30, 40, 10), (41, 40, 10), (70, 40, 10))) {
      val text = (1 to w).map(i => s"w$i").mkString(" ")
      val expected = 1 + math.ceil(math.max(0, w - n).toDouble / (n - m)).toInt
      assert(chunksOf(text, n, m).size == expected, s"w=$w")
    }
  }
}
