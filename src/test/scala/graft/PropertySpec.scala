package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure expression logic (SURVEY.md §5):
  * checked on the scalar twins of the Column expressions — same arithmetic,
  * no session needed, thousands of cases per property. */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (scalatestplus bridge is not
    * on the offline classpath; raw ScalaCheck is). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // forAll bridges: run the assertion body, count as pass if it doesn't throw
  private def forAll[A](g1: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(g1) { a => f(a); true })
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAll(g1, g2) { (a, b) => f(a, b); true })
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    check(Prop.forAll(g1, g2, g3) { (a, b, c) => f(a, b, c); true })
  private def forAll[A, B, C, D](g1: Gen[A], g2: Gen[B], g3: Gen[C], g4: Gen[D])(
      f: (A, B, C, D) => Unit): Unit =
    check(Prop.forAll(g1, g2, g3, g4) { (a, b, c, d) => f(a, b, c, d); true })

  // scalar twins of Exprs.minmaxNorm / clamp (kafka_to_metrics.py:478-481)
  private def clamp(x: Double, lo: Double, hi: Double) = math.min(math.max(x, lo), hi)
  private def minmaxNorm(x: Double, lo: Double, hi: Double): Double =
    if (hi - lo <= 1e-9) 0.5 else clamp((x - lo) / (hi - lo), 0.0, 1.0)

  private val finite = Gen.chooseNum(-1e6, 1e6)

  test("minmaxNorm is always in [0,1]") {
    forAll(finite, finite, finite) { (x: Double, a: Double, b: Double) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val n = minmaxNorm(x, lo, hi)
      assert(n >= 0.0 && n <= 1.0)
    }
  }

  test("minmaxNorm is monotone in x for a fixed non-degenerate range") {
    forAll(finite, finite, Gen.chooseNum(1.0, 1e6)) { (x: Double, lo: Double, w: Double) =>
      val hi = lo + w
      assert(minmaxNorm(x, lo, hi) <= minmaxNorm(x + 1.0, lo, hi))
    }
  }

  test("season-score weights are a convex combination -> score in [0,100]") {
    // score = 100·(0.40·p + 0.35·w + 0.15·c + 0.10·r), each index in [0,1]
    val idx = Gen.chooseNum(0.0, 1.0)
    forAll(idx, idx, idx, idx) { (p: Double, w: Double, c: Double, r: Double) =>
      val score = 100.0 * (0.40 * p + 0.35 * w + 0.15 * c + 0.10 * r)
      assert(score >= 0.0 && score <= 100.0)
    }
  }

  test("seasonOf totality: every month maps to exactly one season") {
    val seasons = Map(12 -> "winter", 1 -> "winter", 2 -> "winter",
      3 -> "spring", 4 -> "spring", 5 -> "spring",
      6 -> "summer", 7 -> "summer", 8 -> "summer",
      9 -> "autumn", 10 -> "autumn", 11 -> "autumn")
    forAll(Gen.chooseNum(1, 12)) { (m: Int) => assert(seasons.contains(m)) }
  }

  test("minhash permutation stays in [0, P) and never overflows") {
    import graft.functions.Hashing.MinhashPrime
    val coefPrime = 1073741789L
    forAll(Gen.chooseNum(0L, (1L << 60) - 1), Gen.chooseNum(0, 127)) { (h: Long, i: Int) =>
      val ai = (2654435761L * (i + 1) + 1) % coefPrime + 1
      val bi = (40503L * (i + 7) + 2654435769L) % MinhashPrime
      val x = h % MinhashPrime
      // exact arithmetic check against BigInt (no Long overflow anywhere)
      val viaLong = (x * ai + bi) % MinhashPrime
      val viaBig = ((BigInt(x) * ai + bi) mod BigInt(MinhashPrime)).toLong
      assert(viaLong === viaBig)
      assert(viaLong >= 0L && viaLong < MinhashPrime)
    }
  }

  test("jaccard bounds: 0 <= |A∩B| / |A∪B| <= 1, 1 iff equal sets") {
    val sets = Gen.containerOf[Set, Int](Gen.chooseNum(0, 50))
    forAll(sets, sets) { (a: Set[Int], b: Set[Int]) =>
      val union = (a ++ b).size
      val j = if (union == 0) 0.0 else (a & b).size.toDouble / union
      assert(j >= 0.0 && j <= 1.0)
      if (a == b && a.nonEmpty) assert(j === 1.0)
    }
  }

  test("greedy radius dedup invariants: kept set is independent within radius, maximal-greedy") {
    val pts = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)))
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    forAll(pts, Gen.chooseNum(0.05, 0.5)) { (ps: List[(Double, Double)], r: Double) =>
      val kept = ps.zipWithIndex.foldLeft(List.empty[((Double, Double), Int)]) {
        case (acc, (p, i)) =>
          if (acc.forall { case (k, _) => dist(k, p) > r }) acc :+ ((p, i)) else acc
      }
      // pairwise independence of kept
      for (Seq((p1, _), (p2, _)) <- kept.combinations(2))
        assert(dist(p1, p2) > r)
      // every dropped point is within r of an earlier kept point
      val keptIdx = kept.map(_._2).toSet
      ps.zipWithIndex.filterNot { case (_, i) => keptIdx(i) }.foreach { case (p, i) =>
        assert(kept.exists { case (k, ki) => ki < i && dist(k, p) <= r })
      }
    }
  }
}
