package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.HammingImpl

/** ScalaCheck properties for the pure operator kernels (SURVEY §5):
  * hamming metric laws and the slice-prefilter soundness claim the
  * reference proves informally in dev/doc/01-barcode-slices.md.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val codeGen: Gen[String] =
    Gen.stringOfN(8, Gen.oneOf(('a' to 'f') ++ ('0' to '9')))

  private def d(a: String, b: String): Int =
    HammingImpl.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  private def slices(b: String): Set[String] =
    (1 until b.length).map(i => s"${i}__${b.substring(i - 1, i + 1)}").toSet

  test("hamming: identity, symmetry, triangle inequality") {
    check(Prop.forAll(codeGen, codeGen, codeGen) { (a, b, c) =>
      d(a, a) == 0 && d(a, b) == d(b, a) && d(a, c) <= d(a, b) + d(b, c)
    })
  }

  test("hamming_lte agrees with hamming at every threshold") {
    check(Prop.forAll(codeGen, codeGen, Gen.choose(0, 8)) { (a, b, k) =>
      HammingImpl.distanceLte(
        UTF8String.fromString(a), UTF8String.fromString(b), k) == (d(a, b) <= k)
    })
  }

  test("slice prefilter soundness: distance < 3 implies shared slice") {
    // the claim the minting join relies on (barcode-distance-check.sql:38-43):
    // 8-char codes within hamming distance <= 2 share >= 1 positioned 2-gram
    val mutate: Gen[(String, String)] = for {
      a <- codeGen
      n <- Gen.choose(0, 2)
      positions <- Gen.pick(n, 0 until 8)
      chars <- Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ ('0' to '9')))
    } yield {
      val sb = a.toCharArray
      positions.zip(chars).foreach { case (p, ch) => sb(p) = ch }
      (a, new String(sb))
    }
    check(Prop.forAll(mutate) { case (a, b) =>
      d(a, b) > 2 || slices(a).intersect(slices(b)).nonEmpty
    })
  }

  test("unequal lengths: distance is sentinel, lte is false") {
    assert(d("abc", "abcd") == -1)
    assert(!HammingImpl.distanceLte(
      UTF8String.fromString("abc"), UTF8String.fromString("abcd"), 8))
  }

  test("hamming handles non-ascii strings via the char path") {
    assert(d("héllo", "hállo") == 1)
    assert(d("日本語", "日本話") == 1)
    assert(d("日本語", "日本語") == 0)
  }

  test("seededHash60 family: in-range, seed-sensitive, base-preserving") {
    // pure JVM model of operators/Dedup.seededHash60: mix(base ^ C_s)
    def model(base: Long, s: Int): Long = {
      val x = base ^ graft.operators.Dedup.seedConst(s)
      x ^ (x >>> 31)
    }
    val base60: Gen[Long] = Gen.choose(0L, (1L << 60) - 1)
    // stays in 60 bits — no sign surprises in either engine
    check(Prop.forAll(base60, Gen.choose(0, 15)) { (b, s) =>
      val h = model(b, s)
      h >= 0 && h < (1L << 60)
    })
    // x -> x ^ (x >>> 31) is a bijection, so distinct bases never collide
    // under the same seed (rank order is permuted, never merged)
    check(Prop.forAll(base60, base60, Gen.choose(0, 15)) { (a, b, s) =>
      a == b || model(a, s) != model(b, s)
    })
  }

  test("seedConst matches the md5('seed<s>') prefix definition") {
    // independently recompute: first 15 hex chars of md5("seed3")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("seed3".getBytes("UTF-8"))
    val expected = java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
    assert(graft.operators.Dedup.seedConst(3) == expected)
    assert((0 until 16).map(graft.operators.Dedup.seedConst).distinct.size == 16)
  }
}
