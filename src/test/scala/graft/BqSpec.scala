package graft

import graft.operators.Bq
import org.apache.spark.sql.functions._

class BqSpec extends SparkSpec {
  import spark.implicits._

  // 64-d vectors (2 words): known sign patterns, incl. exact zeros
  // (quantize to 0 — the > 0 rule) and a negative-everything vector
  private def emb = vecsDf(
    (1L, Seq.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)),
    (2L, Seq.tabulate(64)(i => if (i < 32) 0.5f else 0f)),
    (3L, Seq.fill(64)(-0.25f)),
    (4L, Seq.tabulate(64)(i => if (i % 2 == 0) 2f else -3f)))

  test("pack: MSB-first Horner words match the closed form") {
    val codes = Bq.pack(emb, "vec_id", "embedding", 64)
      .as[(Long, Seq[Long])].collect().toMap
    // vec 1: alternating 10 -> 0xAAAAAAAA per word
    assert(codes(1L) == Seq(0xAAAAAAAAL, 0xAAAAAAAAL))
    // vec 2: first word all ones (32 bits), second all zeros
    assert(codes(2L) == Seq(0xFFFFFFFFL, 0L))
    // vec 3: all negative -> zero words
    assert(codes(3L) == Seq(0L, 0L))
    // identical signs -> identical codes regardless of magnitude
    assert(codes(4L) == codes(1L))
  }

  test("packQuery is the driver-side twin of packCol") {
    val q = Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)
    assert(Bq.packQuery(q) == Seq(0xAAAAAAAAL, 0xAAAAAAAAL))
    val spark1 = Bq.pack(emb.filter(col("vec_id") === 1L),
        "vec_id", "embedding", 64)
      .as[(Long, Seq[Long])].head()._2
    assert(Bq.packQuery(q) == spark1)
  }

  test("negHamming: zero to itself, -d to its complement, symmetric counts") {
    val codes = Bq.pack(emb, "vec_id", "embedding", 64)
    val q = Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)
    val scores = codes
      .select(col("vec_id"),
        Bq.negHammingCol(col("code"), Bq.packQuery(q)).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(scores(1L) == 0L)   // identical signs
    assert(scores(4L) == 0L)
    assert(scores(3L) == -32L) // complement of the 32 set bits
    assert(scores(2L) == -32L) // 16 flips in word 1 + 16 in word 2
  }

  test("pack rejects widths not divisible by the word size") {
    intercept[IllegalArgumentException] {
      Bq.packQuery(Array.fill(63)(1f))
    }
  }
}
