package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler.jw

/** [[graft.functions.JaroWinkler]] kernel semantics. The q248 oracle
  * already pins the kernel against DuckDB's independent
  * `jaro_winkler_similarity` over every blocked vocabulary pair at two
  * SFs; this spec pins the LITERATURE anchor values, the probed edge
  * rules (empty inputs, window 0, integer transposition halving), and
  * the metric's structural properties on random strings. */
class JaroWinklerSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-12

  test("literature anchor values (Winkler 1990 / common test vectors)") {
    assert(approx(jw("martha", "marhta"), 0.9611111111111111))
    assert(approx(jw("dixon", "dicksonx"), 0.8133333333333332))
    assert(approx(jw("jellyfish", "smellyfish"), 0.8962962962962964))
    assert(approx(jw("dwayne", "duane"), 0.8400000000000001))
    assert(approx(jw("crate", "trace"), 0.7333333333333334))
    assert(approx(jw("abc", "abc"), 1.0))
  }

  test("probed edge semantics: empties, window 0, integer transpositions") {
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0 && jw("a", "") == 0.0)
    // window = max(max(2,2)/2 - 1, 0) = 0: same-index matches only
    assert(jw("ab", "ba") == 0.0)
    // 3-cycle gives 3 positional mismatches -> t = 3/2 = 1 (INTEGER),
    // j = (1 + 1 + 5/6)/3; boost l=0 (first chars differ)
    assert(approx(jw("abcdef", "bcadef"), (2.0 + 5.0 / 6.0) / 3.0))
    // boost threshold is strict >0.7 with prefix cap 4
    assert(approx(jw("aaa", "aaaa"), 0.9416666666666667))
    assert(approx(jw("duplicate", "duplicat"), 0.9777777777777777))
  }

  test("structural properties on random strings: symmetry, range, " +
      "identity, and the boost never lowers a score") {
    val gen = Gen.listOfN(300, for {
      n1 <- Gen.choose(0, 12)
      n2 <- Gen.choose(0, 12)
      a <- Gen.listOfN(n1, Gen.oneOf('a', 'b', 'c', 'd'))
      b <- Gen.listOfN(n2, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield (a.mkString, b.mkString))
    gen.pureApply(Gen.Parameters.default, Seed(31L)).foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range on ($a, $b)")
      assert(s == jw(b, a), s"symmetry on ($a, $b)")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"identity on $a")
      // a shared 4-char prefix can only raise the score of the suffix pair
      // when the suffix jaro clears the boost bar
      val (pa, pb) = ("wxyz" + a, "wxyz" + b)
      if (a.nonEmpty && b.nonEmpty && jw(pa, pb) > 0.7)
        assert(jw(pa, pb) >= jw(a, b) - 1e-12, s"prefix boost on ($a, $b)")
    }
  }
}
