package graft

import graft.functions.VectorOps

/** Micro-benchmark for the two rough-distance kernels — plane-popcount
  * (AsymDot, the reference's basic scan analog) vs the fastscan LUT path
  * (buildLut + asymDotLut, the reference README's unchecked fastscan box)
  * — in tight primitive loops, no Spark. This is the honest A/B the q93
  * wiring decision cites in PLANS.md: fastscan's SIMD win (32 codes per
  * register shuffle) has no scalar-JVM equivalent, so whether a
  * byte-indexed L1 table beats 4 AND+POPCNT passes here is an empirical
  * question, not a foregone conclusion.
  *
  * Usage: sbt "runMain graft.KernelBench [dim] [nCodes] [rounds]"
  * (defaults 64 / 100000 / 5; dims must be multiples of 64).
  * Prints one JSON line with codes/sec per kernel, LUT build cost, and
  * the checksum equality that keeps the loops un-dead-code-eliminated.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val dim = args.lift(0).map(_.toInt).getOrElse(64)
    val nCodes = args.lift(1).map(_.toInt).getOrElse(100000)
    val rounds = args.lift(2).map(_.toInt).getOrElse(5)
    require(dim % 64 == 0, s"dim $dim not a multiple of 64")
    val w = dim / 64

    val rnd = new java.util.Random(42)
    val codes = Array.fill(nCodes)(Array.fill(w)(rnd.nextLong()))
    val q = Array.fill(dim)((rnd.nextInt(16)).toByte)
    val planes = VectorOps.bitPlanes(q)

    // one timed LUT build (amortized once per probe in the real pipeline)
    val tb0 = System.nanoTime()
    val lut = VectorOps.buildLut(planes)
    val buildUs = (System.nanoTime() - tb0) / 1e3

    def time(f: () => Long): (Double, Long) = {
      var best = Double.MaxValue; var sum = 0L
      // untimed warmup pass so both kernels measure steady-state JIT
      sum = f()
      var r = 0
      while (r < rounds) {
        val t0 = System.nanoTime()
        sum = f()
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
        r += 1
      }
      (nCodes / best, sum)
    }

    val (planesRate, sumP) = time { () =>
      var s = 0L; var i = 0
      while (i < nCodes) { s += VectorOps.asymDot(codes(i), planes); i += 1 }
      s
    }
    val (lutRate, sumL) = time { () =>
      var s = 0L; var i = 0
      while (i < nCodes) { s += VectorOps.asymDotLut(codes(i), lut); i += 1 }
      s
    }
    require(sumP == sumL, s"kernel mismatch: $sumP != $sumL")

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    println(s"""{"metric":"asymdot_kernels","dim":$dim,"n_codes":$nCodes,""" +
      s""""planes_codes_per_sec":${fmt(planesRate)},"lut_codes_per_sec":${fmt(lutRate)},""" +
      s""""lut_over_planes":${fmt(lutRate / planesRate)},"lut_build_us":${fmt(buildUs)},""" +
      s""""checksum":$sumP}""")
  }
}
