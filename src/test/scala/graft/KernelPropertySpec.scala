package graft

import graft.expressions._
import graft.functions.HashFunctions.{affineA, affineB, AffineP}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the kernel expressions, evaluated directly
  * (nullSafeEval on catalyst data — no Spark jobs, so hundreds of
  * seeded-random samples run in milliseconds) against independent
  * reference implementations in plain Scala.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(1234)

  // plain-Scala reference md5_60 via BigInt parsing of the hex digest
  private def refMd5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def strArr(ws: Seq[String]): ArrayData =
    new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])

  private def randWord(): String =
    (1 to rng.nextInt(8) + 1).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  test("Md5Util.md5_60 equals hex-parse reference; always non-negative") {
    for (_ <- 1 to 300) {
      val s = randWord() + (if (rng.nextBoolean()) " " + randWord() else "")
      val got = Md5Util.md5_60(s)
      assert(got == refMd5_60(s))
      assert(got >= 0L)
    }
  }

  test("Md5LongArray maps each element like md5_60") {
    val expr = Md5LongArray(BoundReference(0, ArrayType(StringType), false))
    for (_ <- 1 to 100) {
      val ws = Seq.fill(rng.nextInt(20))(randWord())
      val got = expr.nullSafeEval(strArr(ws))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      assert(got == ws.map(Md5Util.md5_60))
    }
  }

  test("affine constants stay in [0, P) and families differ") {
    val as = (0 until 64).map(affineA)
    val bs = (0 until 64).map(affineB)
    assert((as ++ bs).forall(x => x >= 0 && x < AffineP))
    assert(as.distinct.size == as.size && bs.distinct.size == bs.size)
  }

  test("MinHashSignature equals the brute-force affine min; monotone under union") {
    val expr = MinHashSignature(
      BoundReference(0, ArrayType(LongType), false), 16)
    def sig(hs: Seq[Long]): Seq[Long] =
      expr.nullSafeEval(new GenericArrayData(hs.toArray))
        .asInstanceOf[ArrayData].toLongArray.toSeq
    def refSig(hs: Seq[Long]): Seq[Long] =
      (0 until 16).map(j => hs.map(h =>
        (affineA(j) * (h % AffineP) + affineB(j)) % AffineP).min)
    for (_ <- 1 to 100) {
      val a = Seq.fill(rng.nextInt(30) + 1)(rng.nextLong().abs % (1L << 60))
      val b = Seq.fill(rng.nextInt(30) + 1)(rng.nextLong().abs % (1L << 60))
      assert(sig(a) == refSig(a))
      // union can only lower each component (min over a superset)
      assert(sig(a ++ b).zip(sig(a)).forall { case (u, x) => u <= x })
      // identical sets → identical signatures regardless of order
      assert(sig(rng.shuffle(a)) == sig(a))
    }
  }

  test("ShingleHashes equals hash-of-distinct-shingles reference") {
    val expr = ShingleHashes(
      BoundReference(0, ArrayType(StringType), false), 3)
    def refShingles(ws: Seq[String]): Seq[Long] = {
      val sh =
        if (ws.length <= 3) Seq(ws.mkString(" "))
        else ws.sliding(3).map(_.mkString(" ")).toSeq
      sh.distinct.map(Md5Util.md5_60)
    }
    for (_ <- 1 to 100) {
      val ws = Seq.fill(rng.nextInt(25))(randWord())
      val got = expr.nullSafeEval(strArr(ws))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      assert(got == refShingles(ws))
    }
  }

  test("SimHashBits: vote-majority reference; complement flips nothing it shouldn't") {
    val expr = SimHashBits(BoundReference(0, ArrayType(LongType), false), 16)
    def ref(hs: Seq[Long]): Long =
      (0 until 16).map { b =>
        val v = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (v > 0) 1L << b else 0L
      }.sum
    for (_ <- 1 to 100) {
      val hs = Seq.fill(rng.nextInt(40) + 1)(rng.nextLong().abs % (1L << 60))
      val got = expr.nullSafeEval(new GenericArrayData(hs.toArray))
        .asInstanceOf[Long]
      assert(got == ref(hs))
      assert(got >= 0 && got < (1L << 16))
    }
  }

  test("HashEmbed: unit norm, order-insensitive, matches scatter-add reference") {
    val expr = HashEmbed(BoundReference(0, StringType, false), 16)
    def eval(s: String): Seq[Double] =
      expr.nullSafeEval(UTF8String.fromString(s))
        .asInstanceOf[ArrayData].toDoubleArray.toSeq
    for (_ <- 1 to 60) {
      val ws = Seq.fill(rng.nextInt(30) + 1)(randWord())
      val e = eval(ws.mkString(" "))
      val norm = math.sqrt(e.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9 || e.forall(_ == 0.0))
      assert(eval(rng.shuffle(ws).mkString(" ")) == e) // bag of words
      // reference scatter-add
      val acc = new Array[Double](16)
      ws.map(_.toLowerCase).foreach { w =>
        val b = (Md5Util.md5_60(w) % 16).toInt
        acc(b) += (if ((Md5Util.md5_60("sign:" + w) & 1L) == 1L) 1.0 else -1.0)
      }
      val n = math.sqrt(acc.map(x => x * x).sum)
      val refE = if (n == 0.0) acc.toSeq else acc.map(_ / n).toSeq
      assert(e == refE)
    }
  }

  test("CosineLshBits: antipodal vectors flip every bit; scaling is invariant") {
    val expr = CosineLshBits(
      BoundReference(0, ArrayType(DoubleType), false), 16)
    def eval(v: Seq[Double]): Long =
      expr.nullSafeEval(new GenericArrayData(v.toArray)).asInstanceOf[Long]
    for (_ <- 1 to 60) {
      val v = Seq.fill(24)(rng.nextGaussian())
      val s = eval(v)
      assert((s ^ eval(v.map(-_))) == 0xffffL) // all 16 bits flip
      assert(eval(v.map(_ * 7.5)) == s)        // scale-invariant
    }
  }

  test("Int8Quantize: codes bounded, signs kept, reference formula, scale-invariant") {
    val expr = Int8Quantize(
      BoundReference(0, ArrayType(DoubleType), nullable = false))
    def eval(v: Seq[Double]): Seq[Float] = {
      val out = expr.nullSafeEval(new GenericArrayData(v.toArray))
        .asInstanceOf[ArrayData]
      (0 until out.numElements()).map(out.getFloat)
    }
    for (_ <- 1 to 200) {
      val n = rng.nextInt(32) + 1
      val v = Seq.fill(n)(rng.nextDouble() * 20 - 10)
      val got = eval(v)
      // independent reference
      val maxAbs = v.map(math.abs).max
      val want =
        if (maxAbs == 0.0) Seq.fill(n)(0f)
        else v.map(x => math.floor(x / (maxAbs / 127.0) + 0.5).toFloat)
      assert(got == want)
      assert(got.forall(c => c >= -127f && c <= 127f), s"out of range: $got")
      assert(got.zip(v).forall { case (c, x) =>
        c == 0f || (c > 0) == (x > 0) }, "sign flip")
      // positive rescaling leaves codes unchanged
      assert(eval(v.map(_ * 3.25)) == got)
    }
    assert(eval(Seq(0.0, 0.0)) == Seq(0f, 0f))
  }

  test("NfcNormalize: idempotent, NFC-equivalent, safe on random unicode") {
    def nfc(in: String): String =
      NfcNormalize(Literal(UTF8String.fromString(in), StringType))
        .eval(null).asInstanceOf[UTF8String].toString
    val combining = Array('\u0301', '\u0308', '\u030a', '\u0327')
    (1 to 200).foreach { _ =>
      val sb = new StringBuilder
      (1 to rng.nextInt(20) + 1).foreach { _ =>
        rng.nextInt(4) match {
          case 0 => sb.append(('a' + rng.nextInt(26)).toChar)
          case 1 => sb.append(combining(rng.nextInt(combining.length)))
          case 2 => sb.append("é日ß".charAt(rng.nextInt(3)))
          case _ => sb.append(' ')
        }
      }
      val in = sb.toString
      val out = nfc(in)
      // the JDK reference is the ground truth the expression wraps
      assert(out == java.text.Normalizer
        .normalize(in, java.text.Normalizer.Form.NFC))
      assert(nfc(out) == out) // idempotent
      assert(java.text.Normalizer
        .isNormalized(out, java.text.Normalizer.Form.NFC))
    }
    assert(nfc("") == "")
  }
}
