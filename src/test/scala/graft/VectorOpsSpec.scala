package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps

class VectorOpsSpec extends AnyFunSuite {

  test("pad: no-op when aligned, zero-extends otherwise, preserves L2") {
    val v = Array(1f, 2f, 3f)
    val p = VectorOps.pad(v, 64)
    assert(p.length == 64)
    assert(p.take(3).sameElements(v) && p.drop(3).forall(_ == 0f))
    assert(VectorOps.pad(new Array[Float](64), 64).length == 64)
    // padding never changes distances (SURVEY §5.2)
    val a = Array(1f, -2f, 0.5f); val b = Array(0f, 4f, -1f)
    assert(VectorOps.l2sq(VectorOps.pad(a, 64), VectorOps.pad(b, 64)) == VectorOps.l2sq(a, b))
  }

  test("l2sq handles unequal lengths as zero-padding") {
    assert(VectorOps.l2sq(Array(3f), Array(3f, 4f)) == 16.0)
  }

  test("binarizeU64 bit patterns") {
    val v = new Array[Float](128)
    v(0) = 1f; v(63) = 0.5f; v(64) = -1f; v(127) = 2f
    val code = VectorOps.binarizeU64(v)
    assert(code.length == 2)
    assert(code(0) == ((1L << 0) | (1L << 63)))
    assert(code(1) == (1L << 63))
    assert(VectorOps.popcount(code) == 3)
    assert(VectorOps.signSum(code, 128) == 2 * 3 - 128)
  }

  test("quantizeQuery stays in [0,15] and sums correctly (100 random trials)") {
    val rnd = new java.util.Random(7)
    for (_ <- 0 until 100) {
      val res = Array.fill(64)(rnd.nextFloat() * 10f - 5f)
      val lb = res.min; val ub = res.max
      val bias = Array.fill(64)(0.5f)
      val (q, s) = VectorOps.quantizeQuery(res, lb, ub, bias)
      assert(q.forall(x => x >= 0 && x <= 15))
      assert(s == q.map(_.toInt).sum)
    }
  }

  test("bitPlanes + asymDot == naive integer dot with binary code (100 random trials)") {
    val rnd = new java.util.Random(11)
    for (_ <- 0 until 100) {
      val q = Array.fill(128)(rnd.nextInt(16).toByte)
      val code = VectorOps.binarizeU64(Array.fill(128)(rnd.nextFloat() * 2f - 1f))
      val planes = VectorOps.bitPlanes(q)
      assert(VectorOps.asymDot(code, planes) == VectorOps.asymDotNaive(code, q))
    }
  }

  test("rotate by identity is identity; orthogonal rotation preserves L2") {
    val dim = 64
    val id = Array.tabulate(dim)(i => Array.tabulate(dim)(j => if (i == j) 1f else 0f))
    val v = Array.tabulate(dim)(i => (i % 7 - 3).toFloat)
    assert(VectorOps.rotate(id, v).sameElements(v))

    val p = graft.operators.RabitqIndex.randomOrthogonal(dim, seed = 7L)
    val w = Array.tabulate(dim)(i => (math.sin(i.toDouble)).toFloat)
    val rv = VectorOps.rotate(p, v); val rw = VectorOps.rotate(p, w)
    val before = VectorOps.l2sq(v, w); val after = VectorOps.l2sq(rv, rw)
    assert(math.abs(before - after) / before < 1e-4)
  }

  test("randomOrthogonal is deterministic per seed") {
    val a = graft.operators.RabitqIndex.randomOrthogonal(64, 42L)
    val b = graft.operators.RabitqIndex.randomOrthogonal(64, 42L)
    val c = graft.operators.RabitqIndex.randomOrthogonal(64, 43L)
    assert(a.flatMap(_.toList).sameElements(b.flatMap(_.toList)))
    assert(!a.flatMap(_.toList).sameElements(c.flatMap(_.toList)))
  }

  test("factors: formulas on a known residual") {
    val dim = 64
    val res = Array.tabulate(dim)(i => if (i % 2 == 0) 1f else -1f)
    val (fip, fppc, err, cds) = VectorOps.factors(res)
    assert(cds == dim.toFloat)                  // ‖res‖² = 64
    // |res|·sign dot = 64, xNorm = 8, √dim = 8 ⇒ xDot = 1 ⇒ xCOverIp = 8
    // factor_ip = -2/8 · 8 = -2
    assert(math.abs(fip - (-2f)) < 1e-5)
    // signSum = 0 ⇒ factor_ppc = 0
    assert(fppc == 0f)
    // error = 2·1.9/√63 · √(64-64) = 0
    assert(math.abs(err) < 1e-5)
  }

  test("roughDistance is a plausible lower bound vs exact (statistical)") {
    // identity-style check: on random data the rough estimate minus its
    // error bound should rarely exceed the exact distance (ε=1.9 ⇒ high
    // confidence). Build a tiny index by hand.
    val dim = 64
    val rnd = new java.util.Random(123)
    val p = graft.operators.RabitqIndex.randomOrthogonal(dim, 5L)
    val centroid = new Array[Float](dim) // origin centroid
    val bias = graft.operators.RabitqIndex.ditherBias(dim, 5L)
    var violations = 0; val trials = 200
    for (_ <- 0 until trials) {
      val x = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val y = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val xr = VectorOps.rotate(p, x); val yr = VectorOps.rotate(p, y)
      val resX = VectorOps.subtract(xr, centroid)
      val code = VectorOps.binarizeU64(resX)
      val (fip, fppc, err, cds) = VectorOps.factors(resX)
      val resY = VectorOps.subtract(yr, centroid)
      val lb = resY.min; val ub = resY.max
      val (q, sumQ) = VectorOps.quantizeQuery(resY, lb, ub, bias)
      val delta = (ub - lb) / 15f
      val g2 = VectorOps.l2sq(yr, centroid).toFloat
      val ad = VectorOps.asymDot(code, VectorOps.bitPlanes(q))
      val rough = VectorOps.roughDistance(cds, g2, lb, delta, sumQ, fip, fppc, err, ad)
      val exact = VectorOps.l2sq(xr, yr)
      if (rough > exact) violations += 1
    }
    assert(violations.toDouble / trials < 0.05, s"$violations/$trials rough-estimate violations")
  }
}
