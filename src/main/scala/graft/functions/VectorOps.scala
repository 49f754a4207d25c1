package graft.functions

/** Pure-Scala vector kernels for the RaBitQ-style index.
  *
  * Math follows the RaBitQ paper (Gao & Long, SIGMOD 2024) as realized by
  * the reference implementation (binarization `/root/reference/src/utils.rs:53-97`,
  * factors `/root/reference/src/rabitq.rs:205-229`, asymmetric dot
  * `/root/reference/src/utils.rs:101-135`, quantization
  * `/root/reference/src/utils.rs:194-232`) — re-derived here, not copied.
  * All kernels are deterministic (no RNG; dither bias is caller-supplied)
  * so the index build is reproducible and oracle-able.
  *
  * These run inside executor tasks via UDFs; they are allocation-light and
  * branch-free where it matters (popcount via Long.bitCount → POPCNT).
  */
object VectorOps {

  /** Zero-pad to the next multiple of `m` (B1). No-op if already aligned. */
  def pad(v: Array[Float], m: Int): Array[Float] = {
    val d = v.length
    val target = ((d + m - 1) / m) * m
    if (target == d) v
    else {
      val out = new Array[Float](target)
      System.arraycopy(v, 0, out, 0, d)
      out
    }
  }

  /** Exact squared L2 distance, f64 arithmetic throughout (Q13). */
  def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    // unmatched tail (padding vs unpadded): treat missing entries as 0.
    // Square in f64 like the main loop (and like L2SqF32's codegen) —
    // an f32 square here loses ~1e-3 absolute per tail element at
    // magnitude ~100, which the pad-isometry property caught.
    var j = n
    val la = a.length; val lb = b.length
    while (j < la) { val d = a(j).toDouble; s += d * d; j += 1 }
    j = n
    while (j < lb) { val d = b(j).toDouble; s += d * d; j += 1 }
    s
  }

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  def subtract(a: Array[Float], b: Array[Float]): Array[Float] = {
    val out = new Array[Float](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) - b(i); i += 1 }
    out
  }

  /** Sign-binarize a residual into packed u64 words, 64 dims/word (B8).
    * Bit i of word i/64 is set iff v(i) > 0. Requires dim % 64 == 0
    * (callers pad first).
    */
  def binarizeU64(v: Array[Float]): Array[Long] = {
    require(v.length % 64 == 0, s"dim ${v.length} not a multiple of 64")
    val out = new Array[Long](v.length / 64)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) out(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    out
  }

  def popcount(code: Array[Long]): Int = {
    var s = 0
    var i = 0
    while (i < code.length) { s += java.lang.Long.bitCount(code(i)); i += 1 }
    s
  }

  /** Σ sign(v_i) with sign ∈ {+1,−1}: 2·popcount − dim. */
  def signSum(code: Array[Long], dim: Int): Int = 2 * popcount(code) - dim

  /** Σ |v_i| — equals <v, sign(v)> used by the normalized IP (B10). */
  def absSum(v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += math.abs(v(i).toDouble); i += 1 }
    s
  }

  /** Number of bits-per-value in the query quantizer (4-bit ⇒ levels 0..15). */
  val ThetaLogDim = 4
  val QuantLevels = 15

  /** 4-bit scalar quantization of a query residual (Q6).
    * q(i) = floor((res(i) − lb) · 15/(ub−lb) + bias(i)) clamped to [0,15].
    * `bias` is the caller-supplied dither in [0,1) (deterministic: we use a
    * seeded stream, persisted with the model — the reference regenerates it
    * per load, `/root/reference/src/rabitq.rs:119`).
    * Returns (codes, Σq).
    */
  def quantizeQuery(res: Array[Float], lb: Float, ub: Float, bias: Array[Float]): (Array[Byte], Int) = {
    val out = new Array[Byte](res.length)
    val mul = if (ub > lb) QuantLevels / (ub - lb).toDouble else 0.0
    var sum = 0
    var i = 0
    while (i < res.length) {
      var q = math.floor((res(i) - lb) * mul + bias(i)).toInt
      if (q < 0) q = 0
      if (q > QuantLevels) q = QuantLevels
      out(i) = q.toByte
      sum += q
      i += 1
    }
    (out, sum)
  }

  /** Decompose 4-bit codes into 4 bit-plane words (Q7): plane j, bit i set
    * iff bit j of q(i) is set. Output length = 4 · dim/64, plane-major.
    */
  def bitPlanes(q: Array[Byte]): Array[Long] = {
    require(q.length % 64 == 0, s"dim ${q.length} not a multiple of 64")
    val wordsPerPlane = q.length / 64
    val out = new Array[Long](ThetaLogDim * wordsPerPlane)
    var i = 0
    while (i < q.length) {
      val v = q(i)
      val word = i >> 6
      val bit = 1L << (i & 63)
      var j = 0
      while (j < ThetaLogDim) {
        if (((v >> j) & 1) != 0) out(j * wordsPerPlane + word) |= bit
        j += 1
      }
      i += 1
    }
    out
  }

  /** Asymmetric binary dot product (Q8):
    * Σ_j (Σ_w popcount(code(w) & plane_j(w))) << j over the 4 planes.
    * Equals <binary_code_bits, quantized_query> as integers.
    */
  def asymDot(code: Array[Long], planes: Array[Long]): Long = {
    val wordsPerPlane = code.length
    var total = 0L
    var j = 0
    while (j < ThetaLogDim) {
      var s = 0L
      var w = 0
      val off = j * wordsPerPlane
      while (w < wordsPerPlane) {
        s += java.lang.Long.bitCount(code(w) & planes(off + w))
        w += 1
      }
      total += s << j
      j += 1
    }
    total
  }

  /** Naive reference for asymDot used by tests: Σ_i bit_i(code)·q(i). */
  def asymDotNaive(code: Array[Long], q: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < q.length) {
      if (((code(i >> 6) >> (i & 63)) & 1L) != 0L) s += q(i)
      i += 1
    }
    s
  }

  /** Fastscan LUT build — the reference README's unchecked "RaBitQ with
    * fastscan" box (`/root/reference/README.md:12`), re-expressed for the
    * JVM. Fastscan (André et al., "Cache locality is not enough", VLDB'15;
    * adopted by the RaBitQ paper's reference implementation) replaces the
    * per-plane popcount passes with query-resident lookup tables indexed
    * by code sub-words. Here: group g covers dims 8g..8g+7 and
    * lut(256·g + b) = Σ_{k: bit k of b set} q(8g+k), so the asymmetric
    * dot becomes ONE pass of byte-indexed adds instead of 4 AND+POPCNT
    * passes. Built once per (query, probe) — dim·32 adds via subset-sum
    * DP — and amortized over every code in the probed cluster; table size
    * is dim·128 B (8 KB at dim 64), L1/L2-resident during the scan.
    */
  def buildLut(planes: Array[Long]): Array[Int] = {
    val w = planes.length / ThetaLogDim
    val lut = new Array[Int](w * 8 * 256)
    val q = new Array[Int](8)
    var g = 0
    while (g < w * 8) {
      val word = g >> 3
      val bitBase = (g & 7) << 3
      var k = 0
      while (k < 8) {
        var v = 0
        var j = 0
        while (j < ThetaLogDim) {
          v |= (((planes(j * w + word) >>> (bitBase + k)) & 1L).toInt) << j
          j += 1
        }
        q(k) = v
        k += 1
      }
      // subset-sum DP: lut(b) = lut(b with lowest bit cleared) + q(lowest)
      val base = g << 8
      var b = 1
      while (b < 256) {
        lut(base + b) = lut(base + (b & (b - 1))) + q(java.lang.Integer.numberOfTrailingZeros(b))
        b += 1
      }
      g += 1
    }
    lut
  }

  /** LUT-based asymmetric dot (fastscan kernel): Σ_g lut(g, byte_g(code)).
    * Identical value to asymDot(code, planes) when lut = buildLut(planes)
    * — both equal Σ_i bit_i(code)·q(i) (property-spec'd).
    */
  def asymDotLut(code: Array[Long], lut: Array[Int]): Long = {
    var total = 0L
    var i = 0
    while (i < code.length) {
      val c = code(i)
      val base = i << 11 // i·8 groups × 256 entries
      var k = 0
      while (k < 8) {
        total += lut(base + (k << 8) + ((c >>> (k << 3)) & 0xFFL).toInt)
        k += 1
      }
      i += 1
    }
    total
  }

  /** Dense mat-vec rotate (B3/Q2): out(j) = Σ_i v(i) · p(i)(j), i.e. v·P
    * with vectors as rows — matches the reference's X·P orientation
    * (`/root/reference/src/rabitq.rs:188`). P is broadcast row-major.
    */
  def rotate(p: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val dim = p.length
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val vi = v(i)
      if (vi != 0f) {
        val row = p(i)
        var j = 0
        while (j < dim) { out(j) += vi * row(j); j += 1 }
      }
      i += 1
    }
    out
  }

  /** RaBitQ per-vector factors (B10/B11). ε = 1.9, default x_dot = 0.8
    * mirror the reference constants (`/root/reference/src/consts.rs:4-6`).
    * Input: rotated residual (x_projected − centroid). Returns
    * (factor_ip, factor_ppc, error_bound, center_distance_square).
    */
  def factors(residual: Array[Float]): (Float, Float, Float, Float) = {
    val dim = residual.length
    val cds = dot(residual, residual)         // ‖x_c‖²
    val xNorm = math.sqrt(cds)
    val sqrtD = math.sqrt(dim.toDouble)
    var xDot = absSum(residual) / (xNorm * sqrtD)   // <x_c, sign(x_c)>/(‖x_c‖√d)
    if (xDot.isNaN || xDot.isInfinite || xDot == 0.0) xDot = 0.8
    val xCOverIp = xNorm / xDot
    val epsilon = 1.9
    val errBase = xCOverIp * xCOverIp - cds
    val errorBound =
      (2.0 * epsilon / math.sqrt(dim - 1.0)) * math.sqrt(math.max(errBase, 0.0))
    val factorIp = (-2.0 / sqrtD) * xCOverIp
    val code = binarizeU64(residual)
    val factorPpc = factorIp * signSum(code, dim)
    (factorIp.toFloat, factorPpc.toFloat, errorBound.toFloat, cds.toFloat)
  }

  /** Rough (lower-bound) distance estimate (Q9):
    * d̂ = cds + g² + lb·factor_ppc + (2·asymdot − Σq)·factor_ip·δ − error_bound·g
    * where g = ‖y − centroid‖ and δ = (ub−lb)/15.
    */
  def roughDistance(
      cds: Float, g2: Float, lb: Float, delta: Float, sumQ: Int,
      factorIp: Float, factorPpc: Float, errorBound: Float, asymdot: Long): Double = {
    val g = math.sqrt(g2.toDouble)
    cds + g2 + lb * factorPpc + (2.0 * asymdot - sumQ) * factorIp * delta - errorBound * g
  }

  /** Deterministic synthetic-vector coordinate in (-1, 1): splitmix64
    * finalizer over (seed, j). The finalizer matters — the raw product is
    * ADDITIVE in the seed, so nearby ids would get near-constant
    * coordinate offsets (highly correlated "random" vectors, cosine tails
    * to 0.9). One shared kernel for every scale/serve smoke generator so
    * the distribution can't silently diverge between harnesses.
    */
  def syntheticNoise(seed: Long, j: Int): Float = {
    var x = seed * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    (x % 10000L).toFloat / 10000f
  }
}
