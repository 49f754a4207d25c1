package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{PolyHashString, ShinglePolyHashes}

/** Property-based specs for the portable text-hash kernels — the
  * arithmetic DuckDB oracles replay bit-for-bit. The reference
  * implementations here are the straightforward String-level folds the
  * oracle SQL encodes; the kernels are byte-level single-pass fusions,
  * and these properties pin that the fusion never diverges.
  */
class TextPropertiesSpec extends AnyFunSuite {

  private val Base = 131L
  private val P = graft.operators.Dedup.P

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300).withInitialSeed(7L), p)
    assert(res.passed, s"$name: $res")
  }

  /** The String-level fold the oracle expresses: acc = (acc·B + cp) mod P
    * over codepoints.
    */
  private def naivePolyHash(s: String): Long = {
    var acc = 0L
    s.codePoints().forEach(cp => acc = (acc * Base + cp) % P)
    acc
  }

  // characters spanning 1–4 UTF-8 bytes, no unpaired surrogates (a Scala
  // String with lone surrogates has no canonical UTF-8 form to agree on)
  private val charGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    1 -> Gen.oneOf(" ", "\t", "\n", "\r", "\f", ""),
    1 -> Gen.oneOf("é", "ß", "ñ"),              // 2-byte
    1 -> Gen.oneOf("中", "文", "€", "한"),       // 3-byte
    1 -> Gen.oneOf("𝄞", "😀", "𐍈"))             // 4-byte (surrogate PAIRS)
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  test("byte-level polyhash equals the codepoint-fold the oracle replays") {
    check("polyhash") {
      Prop.forAllNoShrink(textGen) { s =>
        PolyHashString.hash(UTF8String.fromString(s), Base, P) == naivePolyHash(s)
      }
    }
  }

  test("fused shingle hasher equals split(\\\\s+,-1) + token-hash + window-fold") {
    def naiveShingles(s: String, n: Int): Seq[Long] = {
      val toks = s.split("\\s+", -1).toSeq
      val th = toks.map(naivePolyHash)
      if (th.length < n) Seq.empty
      else th.sliding(n).map(_.foldLeft(0L)((acc, h) => (acc * Base + h) % P)).toSeq
    }
    check("shingles") {
      Prop.forAllNoShrink(textGen, Gen.oneOf(1, 2, 3, 5)) { (s, n) =>
        val got = ShinglePolyHashes.shingles(UTF8String.fromString(s), n, Base, P).toSeq
        got == naiveShingles(s, n)
      }
    }
  }

  test("wide shingle hasher: hi half equals the plain fold, lo folds squared " +
      "token hashes with base 137 — the oracle's exact expression") {
    def naiveWide(s: String, n: Int): Seq[Long] = {
      val th = s.split("\\s+", -1).toSeq.map(naivePolyHash)
      if (th.length < n) Seq.empty
      else th.sliding(n).map { w =>
        val hi = w.foldLeft(0L)((acc, h) => (acc * Base + h) % P)
        val lo = w.foldLeft(0L)((acc, h) => (acc * 137L + (h * h) % P) % P)
        (hi << 31) | lo
      }.toSeq
    }
    check("wideShingles") {
      Prop.forAllNoShrink(textGen, Gen.oneOf(1, 2, 3, 5)) { (s, n) =>
        val got = ShinglePolyHashes
          .wideShingles(UTF8String.fromString(s), n, Base, 137L, P).toSeq
        got == naiveWide(s, n)
      }
    }
  }

  test("char entropy equals the codepoint-histogram formula the oracle replays") {
    // the String-level reference: counts over codePoints(), -Σ p·log2(p)
    def naive(s: String): Double = {
      val counts = new scala.collection.mutable.HashMap[Int, Int]()
      s.codePoints().forEach(cp => counts(cp) = counts.getOrElse(cp, 0) + 1)
      val n = counts.values.sum.toDouble
      if (n == 0) 0.0
      else -counts.values.map { c => val p = c / n; p * math.log(p) / math.log(2.0) }.sum
    }
    check("entropy") {
      Prop.forAllNoShrink(textGen) { s =>
        val got = graft.functions.CharEntropy.entropy(UTF8String.fromString(s))
        math.abs(got - naive(s)) < 1e-9
      }
    }
    // DuckDB-pinned values (checked against entropy() directly):
    // 'aab' → 0.9183, 'héllo' → 1.9219 at 4 decimals
    def at4(s: String) =
      math.round(graft.functions.CharEntropy.entropy(UTF8String.fromString(s)) * 1e4) / 1e4
    assert(at4("aab") == 0.9183)
    assert(at4("héllo") == 1.9219)
    assert(graft.functions.CharEntropy.entropy(UTF8String.fromString("")) == 0.0)
  }

  test("affine minhash families are distinct and stay in [0, P)") {
    // the families the sampling/sharding/minhash oracles embed as literals
    val fams = (0 until 8).map(graft.operators.Dedup.affine)
    assert(fams.distinct.length == fams.length)
    check("affine") {
      Prop.forAllNoShrink(Gen.chooseNum(0L, Long.MaxValue - 1), Gen.oneOf(0 until 8)) {
        (x, f) =>
          val (a, b) = graft.operators.Dedup.affine(f)
          val h = (a * (x % P) + b) % P
          h >= 0L && h < P
      }
    }
  }
}
