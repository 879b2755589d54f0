package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Utf8Audit

/** Property tests for the UTF-8 audit kernel — adversarial byte layouts
  * the corpus-derived q234 cannot force: random codepoint mixes across
  * all four sequence lengths, every error class at every position,
  * boundary codepoints, truncation sweeps, and the crafted-stall check
  * (the MediaProbe r10 lesson). Pure JVM: the kernel's shared parse
  * method is the single definition of truth for eval and codegen. */
class Utf8AuditPropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default

  private def counts(b: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val p = Utf8Audit.parse(b)
    (p >> 32, (p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255)
  }

  test("property: 200 random valid strings count exactly their codepoints") {
    // codepoints drawn from all four encoded lengths, including the
    // boundary values where lead-byte classes flip (U+007F/U+0080,
    // U+07FF/U+0800, U+FFFF/U+10000, U+10FFFF) and excluding surrogates
    val cpGen = Gen.frequency(
      4 -> Gen.choose(0x20, 0x7F),
      3 -> Gen.choose(0x80, 0x7FF),
      2 -> Gen.oneOf(Gen.choose(0x800, 0xD7FF), Gen.choose(0xE000, 0xFFFF)),
      1 -> Gen.choose(0x10000, 0x10FFFF),
      1 -> Gen.oneOf(0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x10FFFF))
    val gen = Gen.listOfN(200, Gen.listOfN(40, cpGen))
    gen.pureApply(params, Seed(23L)).zipWithIndex.foreach { case (cps, i) =>
      val s = new String(cps.toArray, 0, cps.size)
      val b = s.getBytes(StandardCharsets.UTF_8)
      val got = counts(b)
      assert(got == ((cps.size.toLong, 0L, 0L, 0L, 0L)),
        s"case $i: ${cps.take(8).map(c => f"U+$c%04X")}... -> $got")
    }
  }

  test("every error class is classified once, with clean resync") {
    def hx(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // overlong: C0 80 (2-byte NUL), E0 80 80 (3-byte), F0 80 80 80 (4-byte)
    assert(counts(hx("C08041")) == ((1L, 1L, 0L, 0L, 0L)))
    assert(counts(hx("E0808041")) == ((1L, 1L, 0L, 0L, 0L)))
    assert(counts(hx("F080808041")) == ((1L, 1L, 0L, 0L, 0L)))
    // surrogate range: ED A0 80 = U+D800 (CESU-8 leakage)
    assert(counts(hx("EDA08041")) == ((1L, 0L, 1L, 0L, 0L)))
    // ED 9F BF = U+D7FF is VALID (just below the surrogate block)
    assert(counts(hx("ED9FBF")) == ((1L, 0L, 0L, 0L, 0L)))
    // above U+10FFFF: F4 90 80 80; invalid leads F5/FF; lone continuation
    assert(counts(hx("F490808041")) == ((1L, 0L, 0L, 0L, 1L)))
    assert(counts(hx("F541")) == ((1L, 0L, 0L, 0L, 1L)))
    assert(counts(hx("FF41")) == ((1L, 0L, 0L, 0L, 1L)))
    assert(counts(hx("8041")) == ((1L, 0L, 0L, 0L, 1L)))
    // truncation: lead then EOF / lead then non-continuation
    assert(counts(hx("C3")) == ((0L, 0L, 0L, 1L, 0L)))
    assert(counts(hx("E282")) == ((0L, 0L, 0L, 1L, 0L)))
    assert(counts(hx("F0908D")) == ((0L, 0L, 0L, 1L, 0L)))
    assert(counts(hx("E24141")) == ((2L, 0L, 0L, 1L, 0L)))
    // a malformed sequence consumes its continuation run ONCE: the
    // trailing continuations must not double-count as lone conts
    assert(counts(hx("F58080804180")) == ((1L, 0L, 0L, 0L, 2L)))
  }

  test("truncation sweep of a mixed string never throws, always advances") {
    val s = "aé€𐀀z" // 1-, 2-, 3-, 4-byte + ASCII
    val full = s.getBytes(StandardCharsets.UTF_8) ++
      Array[Byte](0xC0.toByte, 0x80.toByte) ++
      Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte)
    (0 until full.length).foreach { n =>
      Utf8Audit.parse(full.take(n)) // must not throw
    }
    // the full buffer's counts are exact (5 codepoints — the 4-byte
    // U+10000 is a surrogate PAIR in the JVM string but ONE sequence)
    assert(counts(full) == ((5L, 1L, 1L, 0L, 0L)))
  }

  test("property: 150 random byte soups terminate with counts covering " +
      "every byte exactly once") {
    // Every classified item consumes >= 1 byte and each of the 1/2/3/4
    // classes has a byte-length ceiling, so valid + errors is bounded
    // below by n/4 — a structural no-stall/no-double-count invariant
    // that holds for ARBITRARY bytes, not just crafted cases.
    val gen = Gen.listOfN(150, Gen.listOfN(64, Gen.choose(0, 255)))
    gen.pureApply(params, Seed(29L)).zipWithIndex.foreach { case (bs, i) =>
      val b = bs.map(_.toByte).toArray
      val (v, o, s, t, bad) = counts(b)
      val items = v + o + s + t + bad
      assert(items >= b.length / 4 && items <= b.length,
        s"case $i: $items items over ${b.length} bytes")
    }
  }
}
