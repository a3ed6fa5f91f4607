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
}
