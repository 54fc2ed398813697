package graft.ops

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.{Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-10 algorithm LAWS — the theorems the
  * hash-gated flags of heavy_hitters / changepoint_cusum /
  * weighted_sample rely on, checked on random inputs against the exact
  * brute-force answer. Pure driver-side math (the same code the
  * operators run where it's shared), no Spark session. */
class SketchLawsSpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)

  test("space-saving merge law: freq > N/k always found, error ≤ N/k, under ANY partitioning") {
    // zipf-ish streams over a small domain so heavy items exist
    val genStream = Gen.nonEmptyListOf(
      Gen.frequency(5 -> Gen.choose(0L, 3L), 3 -> Gen.choose(0L, 20L),
        2 -> Gen.choose(0L, 200L)))
    val genK = Gen.choose(2, 12)
    val genCuts = Gen.listOfN(3, Gen.choose(0.0, 1.0))
    val prop = forAll(genStream, genK, genCuts) { (xs, k, cuts) =>
      val n = xs.length.toLong
      val exact = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      // arbitrary partition split at the random cut points
      val bounds = (cuts.map(c => (c * xs.length).toInt) :+ 0 :+ xs.length)
        .distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      val merged = parts
        .flatMap(p => Sketches.spaceSavingSummary(p.iterator, k))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      exact.forall { case (item, f) =>
        val found = merged.contains(item)
        val inBound = merged.get(item)
          .forall(est => math.abs(est - f) * k <= n)
        // the heavy_hitters contract: guaranteed found above N/k, and
        // any kept estimate is within N/k of exact
        (f * k <= n || (found && inBound)) && inBound
      }
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("CUSUM closed form == sequential recurrence on random integer series") {
    val genSeries = Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))
    val prop = forAll(genSeries) { ds =>
      val prefix = ds.scanLeft(0L)(_ + _).tail
      val closedPos = prefix.zipWithIndex.map { case (p, i) =>
        p - math.min(0L, prefix.take(i + 1).min)
      }
      val closedNeg = prefix.zipWithIndex.map { case (p, i) =>
        math.max(0L, prefix.take(i + 1).max) - p
      }
      var sPos = 0L
      var sNeg = 0L
      ds.indices.forall { i =>
        sPos = math.max(0L, sPos + ds(i))
        sNeg = math.max(0L, sNeg - ds(i))
        closedPos(i) == sPos && closedNeg(i) == sNeg
      }
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("quantized priority never inverts the exact w/u order (weighted_sample law)") {
    val gen = Gen.zip(Gen.choose(1L, 1L << 20), Gen.choose(1L, (1L << 32) + 1))
    val prop = forAll(gen, gen) { case ((w1, u1), (w2, u2)) =>
      val q1 = w1 * 8589934592L / u1
      val q2 = w2 * 8589934592L / u2
      // if the quantized keys order strictly, the exact rationals agree
      (q1 <= q2 || BigInt(w1) * u2 > BigInt(w2) * u1) &&
        (q2 <= q1 || BigInt(w2) * u1 > BigInt(w1) * u2)
    }
    assert(SCTest.check(params, prop).passed)
  }
}
