package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.IvfIndex.FixedPointVectorSum

/** Property pin for the determinism claim behind the trained-IVF oracle
  * (s04): the fixed-point vector sum must be invariant under row order and
  * partition shape — any shuffle/merge topology yields the identical
  * accumulator, hence bit-identical centroids. */
class FixedPointSumPropertySpec extends AnyFunSuite with Matchers {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).foreach(f)
    }

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-10f, 10f)).map(_.toSeq)

  private val batchGen: Gen[List[Seq[Float]]] =
    Gen.chooseNum(1, 20).flatMap(Gen.listOfN(_, vecGen))

  private def reduceAll(vs: Seq[Seq[Float]]): Seq[Long] =
    FixedPointVectorSum.finish(
      vs.foldLeft(FixedPointVectorSum.zero)(FixedPointVectorSum.reduce))

  test("sum is invariant under permutation and partitioning") {
    forAll(batchGen) { vs =>
      val expected = reduceAll(vs)
      // reversed order
      reduceAll(vs.reverse) shouldBe expected
      // random-ish split + merge (two partitions)
      val (a, b) = vs.splitAt(vs.length / 2)
      val merged = FixedPointVectorSum.merge(
        vs.foldLeft(FixedPointVectorSum.zero)((acc, _) => acc), // empty buffer path
        FixedPointVectorSum.merge(
          a.foldLeft(FixedPointVectorSum.zero)(FixedPointVectorSum.reduce),
          b.foldLeft(FixedPointVectorSum.zero)(FixedPointVectorSum.reduce)))
      FixedPointVectorSum.finish(merged) shouldBe expected
      // merge in the opposite order
      val merged2 = FixedPointVectorSum.merge(
        b.foldLeft(FixedPointVectorSum.zero)(FixedPointVectorSum.reduce),
        a.foldLeft(FixedPointVectorSum.zero)(FixedPointVectorSum.reduce))
      FixedPointVectorSum.finish(merged2) shouldBe expected
    }
  }

  test("scaling is exact: component sums equal sequential integer math") {
    forAll(batchGen) { vs =>
      val got = reduceAll(vs)
      val dim = vs.map(_.length).max
      val want = (0 until dim).map { i =>
        vs.map(v => if (i < v.length)
          math.floor(v(i).toDouble * FixedPointVectorSum.S).toLong else 0L).sum
      }
      got shouldBe want
    }
  }
}
