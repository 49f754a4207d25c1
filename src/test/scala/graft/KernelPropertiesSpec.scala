package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.VectorOps

/** Property-based specs (scalacheck) for the pure RaBitQ kernels — the
  * randomized generalization of the example-based VectorOpsSpec units.
  * Each property is the algebraic contract the pipeline relies on:
  * padding is an isometry, rotation is an isometry, quantization is
  * bounded with exact code sums, bit-plane decomposition is lossless
  * w.r.t. the asymmetric dot product, binarization counts signs.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withInitialSeed(42L), p)
    assert(res.passed, s"$name: $res")
  }

  private val dimGen = Gen.oneOf(64, 128, 192)
  private def vecGen(dim: Int): Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-100f, 100f))
  private def shortVecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 130).flatMap(vecGen)

  test("pad is an isometry: preserves the prefix, zero-extends, preserves pairwise L2") {
    check("pad") {
      Prop.forAllNoShrink(shortVecGen, shortVecGen) { (a, b) =>
        val m = 64
        val pa = VectorOps.pad(a, m); val pb = VectorOps.pad(b, m)
        val okLen = pa.length % m == 0 && pa.length >= a.length
        val okPrefix = pa.take(a.length).sameElements(a) && pa.drop(a.length).forall(_ == 0f)
        // l2sq already zero-pads the shorter arg, so compare directly
        val okDist = math.abs(VectorOps.l2sq(pa, pb) - VectorOps.l2sq(a, b)) < 1e-3
        okLen && okPrefix && okDist
      }
    }
  }

  test("seeded orthogonal rotation preserves L2 norms and inner products") {
    // one matrix per dim is enough — the property quantifies over vectors
    val mats = Map(64 -> operators.RabitqIndex.randomOrthogonal(64, 7L),
      128 -> operators.RabitqIndex.randomOrthogonal(128, 8L))
    check("rotate") {
      Prop.forAllNoShrink(Gen.oneOf(64, 128).flatMap(d => vecGen(d).map((d, _)))) { case (d, v) =>
        val p = mats(d)
        val rv = VectorOps.rotate(p, v)
        val nv = VectorOps.norm(v); val nrv = VectorOps.norm(rv)
        // relative tolerance: norms can be ~1e3, f32 matrix entries
        math.abs(nrv - nv) <= 1e-3 * math.max(1.0, nv)
      }
    }
    check("rotate-ip") {
      Prop.forAllNoShrink(vecGen(64), vecGen(64)) { (a, b) =>
        val p = mats(64)
        val ip = VectorOps.dot(a, b)
        val rip = VectorOps.dot(VectorOps.rotate(p, a), VectorOps.rotate(p, b))
        // the absolute f32 error scales with ‖a‖·‖b‖ (near-orthogonal
        // vectors have |a·b| ≈ 0 but full-magnitude rounding), so the
        // tolerance must too — NOT with |a·b|
        math.abs(rip - ip) <= 1e-4 * (1.0 + VectorOps.norm(a) * VectorOps.norm(b))
      }
    }
  }

  test("quantizeQuery: codes in [0,15], exact Σq, per-coordinate error ≤ one level") {
    val biasGen = Gen.containerOfN[Array, Float](64, Gen.chooseNum(0f, 0.999f))
    check("quantize") {
      Prop.forAllNoShrink(vecGen(64), biasGen) { (res, bias) =>
        val lb = res.min; val ub = res.max
        val (q, s) = VectorOps.quantizeQuery(res, lb, ub, bias)
        val mul = if (ub > lb) VectorOps.QuantLevels / (ub - lb).toDouble else 0.0
        val okRange = q.forall(c => c >= 0 && c <= VectorOps.QuantLevels)
        val okSum = s == q.map(_.toInt).sum
        // floor(x + bias) with bias in [0,1) is within 1 level of x
        val okErr = res.indices.forall { i =>
          math.abs(q(i) - (res(i) - lb) * mul) <= 1.0 + 1e-6
        }
        okRange && okSum && okErr
      }
    }
  }

  test("bit-plane decomposition is lossless: asymDot(planes) == naive Σ bit·q") {
    val codesGen = for {
      dim <- dimGen
      q <- Gen.containerOfN[Array, Byte](dim, Gen.chooseNum(0, 15).map(_.toByte))
      code <- Gen.containerOfN[Array, Long](dim / 64, Gen.long)
    } yield (code, q)
    check("asymdot") {
      Prop.forAllNoShrink(codesGen) { case (code, q) =>
        VectorOps.asymDot(code, VectorOps.bitPlanes(q)) == VectorOps.asymDotNaive(code, q)
      }
    }
  }

  test("fastscan LUT kernel is bit-identical to the plane-popcount kernel") {
    val codesGen = for {
      dim <- dimGen
      q <- Gen.containerOfN[Array, Byte](dim, Gen.chooseNum(0, 15).map(_.toByte))
      code <- Gen.containerOfN[Array, Long](dim / 64, Gen.long)
    } yield (code, q)
    check("fastscan") {
      Prop.forAllNoShrink(codesGen) { case (code, q) =>
        val planes = VectorOps.bitPlanes(q)
        VectorOps.asymDotLut(code, VectorOps.buildLut(planes)) ==
          VectorOps.asymDot(code, planes)
      }
    }
  }

  test("binarizeU64: popcount equals positive-coordinate count, signSum consistent") {
    check("binarize") {
      Prop.forAllNoShrink(dimGen.flatMap(vecGen)) { v =>
        val code = VectorOps.binarizeU64(v)
        val pos = v.count(_ > 0f)
        VectorOps.popcount(code) == pos &&
          VectorOps.signSum(code, v.length) == 2 * pos - v.length
      }
    }
  }

  test("factors: cds is the residual's squared norm, error bound non-negative") {
    check("factors") {
      Prop.forAllNoShrink(vecGen(64)) { res =>
        val (ip, ppc, err, cds) = VectorOps.factors(res)
        val okCds = math.abs(cds - VectorOps.dot(res, res)) <= 1e-2 * math.max(1.0, cds)
        val okErr = err >= 0f
        // ppc = ip · signSum by construction
        val okPpc = math.abs(ppc - ip * VectorOps.signSum(
          VectorOps.binarizeU64(res), res.length)) <= 1e-2f * math.max(1f, math.abs(ppc))
        okCds && okErr && okPpc
      }
    }
  }

  test("nearest-centroid kernel equals the naive argmin, ties toward smaller cid") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    check("nearestCentroid") {
      val gen = for {
        dim <- Gen.oneOf(8, 32, 64)
        k <- Gen.chooseNum(1, 6)
        cents <- Gen.listOfN(k, vecGen(dim))
        v <- vecGen(dim)
        dupFirst <- Gen.oneOf(true, false)
      } yield (dim, cents.toArray, v, dupFirst)
      Prop.forAllNoShrink(gen) { case (dim, cents0, v, dupFirst) =>
        // optionally append an exact copy of centroid 0 under a LARGER
        // cid — the strict-< argmin must keep the smaller one
        val cents = if (dupFirst) cents0 :+ cents0(0).clone() else cents0
        val cids = cents.indices.map(i => (i + 1) * 10L).toArray
        val got = graft.functions.NearestCentroid.assign(
          ArrayData.toArrayData(v), cents.flatten, cids)
        var best = 0
        var bestD = Double.MaxValue
        cents.indices.foreach { c =>
          val d = VectorOps.l2sq(v, cents(c))
          if (d < bestD) { bestD = d; best = c }
        }
        got == cids(best) && (!dupFirst || got != cids.last ||
          VectorOps.l2sq(v, cents(0)) != bestD)
      }
    }
  }

  test("two-level nearest-centroid kernel is a fixed point on the centroids themselves") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    // querying WITH centroid i must return cid(i): its nearest super is
    // the one it was assigned to (same strict-< scan order as the CSR
    // build), and within that member list its self-distance is 0
    check("nearestCentroidHier") {
      val gen = for {
        dim <- Gen.oneOf(8, 32)
        k <- Gen.chooseNum(2, 10)
        cents <- Gen.listOfN(k, vecGen(dim))
        nSup <- Gen.chooseNum(1, 4)
        supers <- Gen.listOfN(nSup, vecGen(dim))
      } yield (cents.toArray, supers.toArray)
      Prop.forAllNoShrink(gen) { case (cents, supers) =>
        val cids = cents.indices.map(i => (i + 1) * 7L).toArray
        // CSR member lists from the same strict-< super argmin the
        // kernel runs
        def nearestSup(v: Array[Float]): Int = {
          var best = 0; var bd = Double.MaxValue
          supers.indices.foreach { s =>
            val d = VectorOps.l2sq(v, supers(s)); if (d < bd) { bd = d; best = s }
          }
          best
        }
        val assign = cents.map(nearestSup)
        val members = Array.tabulate(supers.length)(s =>
          cents.indices.filter(assign(_) == s).toArray)
        val offsets = members.scanLeft(0)(_ + _.length)
        cents.indices.forall { i =>
          graft.functions.NearestCentroid.assignHier(
            ArrayData.toArrayData(cents(i)), supers.flatten, offsets,
            members.flatten, cents.flatten, cids) == cids(i)
        }
      }
    }
  }
}
