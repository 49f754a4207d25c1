package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with codegen) for the hot vector kernels —
  * the Spark counterpart of the reference's SIMD distance loops
  * (`/root/reference/src/simd.rs:14-73`). A Scala UDF pays
  * serialize-to-Seq per row; these read the UnsafeArrayData floats in
  * place inside whole-stage codegen, so crossJoin distance scans stay in
  * one generated loop.
  *
  * Semantics match VectorOps exactly (f64 arithmetic, zero-padded tails)
  * so UDF and expression paths are interchangeable.
  */
object VectorExpressions {

  private def checkArrays(e: BinaryExpression, elem: DataType): TypeCheckResult = {
    val ok = Seq(e.left.dataType, e.right.dataType).forall {
      case ArrayType(t, _) => t == elem
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${e.prettyName} expects two array<$elem> arguments, got " +
        s"(${e.left.dataType.simpleString}, ${e.right.dataType.simpleString})")
  }
  private def checkFloatArrays(e: BinaryExpression) = checkArrays(e, FloatType)
  private def checkLongArrays(e: BinaryExpression) = checkArrays(e, LongType)

  /** Squared L2 distance between two float arrays (unequal lengths treated
    * as zero-padded).
    */
  case class L2SqF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays(this)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_l2sq"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val xn = x.numElements(); val yn = y.numElements()
      val n = math.min(xn, yn)
      var s = 0.0
      var i = 0
      while (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s += d * d; i += 1 }
      i = n
      while (i < xn) { val d = x.getFloat(i).toDouble; s += d * d; i += 1 }
      i = n
      while (i < yn) { val d = y.getFloat(i).toDouble; s += d * d; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
        val s = ctx.freshName("s"); val d = ctx.freshName("d")
        s"""
           |int $xn = $a.numElements(); int $yn = $b.numElements();
           |int $n = Math.min($xn, $yn);
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
           |  $s += $d * $d;
           |}
           |for (int $i = $n; $i < $xn; $i++) { double $d = (double) $a.getFloat($i); $s += $d * $d; }
           |for (int $i = $n; $i < $yn; $i++) { double $d = (double) $b.getFloat($i); $s += $d * $d; }
           |${ev.value} = $s;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Cosine similarity in one pass (dot, ‖a‖², ‖b‖² accumulated together);
    * 0.0 when either norm is zero. Final combine is
    * dot / (sqrt(na)·sqrt(nb)) — same association as VectorOps.cosine and
    * the DuckDB oracle formula.
    */
  case class CosineSimF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays(this)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      // tails only contribute to norms
      i = n
      while (i < x.numElements()) { val xi = x.getFloat(i).toDouble; na += xi * xi; i += 1 }
      i = n
      while (i < y.numElements()) { val yi = y.getFloat(i).toDouble; nb += yi * yi; i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $xn = $a.numElements(); int $yn = $b.numElements();
           |int $n = Math.min($xn, $yn);
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.getFloat($i);
           |  double $yi = (double) $b.getFloat($i);
           |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
           |}
           |for (int $i = $n; $i < $xn; $i++) { double $xi = (double) $a.getFloat($i); $na += $xi * $xi; }
           |for (int $i = $n; $i < $yn; $i++) { double $yi = (double) $b.getFloat($i); $nb += $yi * $yi; }
           |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Asymmetric binary dot product (Q8): code words AND 4 bit-plane words,
    * popcount, weighted by plane index. `Long.bitCount` JITs to POPCNT —
    * the portable analog of the reference's AVX2 lookup popcount
    * (`/root/reference/src/simd.rs:326-384`).
    */
  case class AsymDotF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkLongArrays(this)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_asymdot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val code = a.asInstanceOf[ArrayData]; val planes = b.asInstanceOf[ArrayData]
      val w = code.numElements()
      var total = 0L
      var j = 0
      while (j < 4) {
        var s = 0L
        var i = 0
        while (i < w) {
          s += java.lang.Long.bitCount(code.getLong(i) & planes.getLong(j * w + i))
          i += 1
        }
        total += s << j
        j += 1
      }
      total
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val w = ctx.freshName("w"); val s = ctx.freshName("s"); val t = ctx.freshName("t")
        s"""
           |int $w = $a.numElements();
           |long $t = 0L;
           |for (int $j = 0; $j < 4; $j++) {
           |  long $s = 0L;
           |  for (int $i = 0; $i < $w; $i++) {
           |    $s += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($j * $w + $i));
           |  }
           |  $t += $s << $j;
           |}
           |${ev.value} = $t;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Eval/codegen shared fastscan LUT build over ArrayData — see
    * VectorOps.buildLut for the kernel and the reference-box derivation.
    * One primitive copy per PROBE row (|q|·nprobe-sized frame), never on
    * the candidate scan.
    */
  def buildLutData(planes: ArrayData): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(VectorOps.buildLut(planes.toLongArray()))

  /** Fastscan LUT build (unary): 4 bit-plane words → byte-indexed lookup
    * table (array<int>, length words·8·256). Runs once per probe row;
    * AsymDotLutF32 consumes it on the candidate scan.
    */
  case class BuildLutF32(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> bit-planes, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_buildlut"

    override protected def nullSafeEval(p: Any): Any =
      buildLutData(p.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, p => s"graft.functions.VectorExpressions.buildLutData($p)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Asymmetric binary dot via the fastscan LUT: one byte-indexed pass
    * (words·8 lookups) instead of AsymDotF32's 4 AND+POPCNT plane passes.
    * Bit-identical to AsymDotF32(code, planes) when lut =
    * BuildLutF32(planes).
    */
  case class AsymDotLutF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint> code, array<int> lut), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_asymdot_lut"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val code = a.asInstanceOf[ArrayData]; val lut = b.asInstanceOf[ArrayData]
      val w = code.numElements()
      var total = 0L
      var i = 0
      while (i < w) {
        val c = code.getLong(i)
        val base = i << 11
        var k = 0
        while (k < 8) {
          total += lut.getInt(base + (k << 8) + ((c >>> (k << 3)) & 0xFFL).toInt)
          k += 1
        }
        i += 1
      }
      total
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val k = ctx.freshName("k")
        val w = ctx.freshName("w"); val c = ctx.freshName("c")
        val base = ctx.freshName("base"); val t = ctx.freshName("t")
        s"""
           |int $w = $a.numElements();
           |long $t = 0L;
           |for (int $i = 0; $i < $w; $i++) {
           |  long $c = $a.getLong($i);
           |  int $base = $i << 11;
           |  for (int $k = 0; $k < 8; $k++) {
           |    $t += $b.getInt($base + ($k << 8) + (int) (($c >>> ($k << 3)) & 0xFFL));
           |  }
           |}
           |${ev.value} = $t;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Random-hyperplane LSH signature: one long per band, bit i of band b =
    * sign of ⟨embedding, plane(b·bandBits + i)⟩ — the codegen
    * replacement for the Scala UDF `Dedup.embeddingNearDupLSH` used on
    * its banding hot path (a UDF pays a serialize-to-Seq per row; this
    * reads the UnsafeArrayData floats in place). The plane matrix rides
    * in the plan as a referenced flat float[] (row-major, numBands ×
    * bandBits × dim — ~512 KB at 128 planes × 1024 dims, task-closure
    * sized at any corpus scale since planes depend on dim, not n).
    * Arithmetic is exactly `VectorOps.dot` (f64 accumulate over the
    * min length), so signatures are bit-identical to the UDF's.
    */
  case class HyperplaneSigF32(child: Expression, planes: Array[Float],
                              numBands: Int, bandBits: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>, got ${t.simpleString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_hyperplane_sig"

    override protected def nullSafeEval(input: Any): Any =
      HyperplaneSig.sig(input.asInstanceOf[ArrayData], planes, numBands, bandBits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planes, "float[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HyperplaneSig.sig($c, $ref, $numBands, $bandBits);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Nearest-centroid assignment as ONE codegen expression: argmin over
    * k centroids of the f64 squared L2 distance (exactly [[L2SqF32]]'s
    * accumulation), ties broken toward the SMALLER centroid id by
    * iterating ids ascending with a strict `<` — total-ordered and
    * engine-portable (a SQL replay with
    * `row_number() OVER (ORDER BY dist, cid)` agrees exactly). The
    * centroid matrix rides in the plan as a referenced flat float[]
    * (k·dim — metadata-sized like the IVF model), its ids as a long[].
    * Replaces the crossJoin(n×k) + min_by(struct) formulation, whose
    * ObjectHashAggregate paid object-comparison overhead per candidate
    * row (measured 81 s → sub-second at 200k×1024).
    */
  case class NearestCentroidF32(child: Expression, centroids: Array[Float],
                                cids: Array[Long])
      extends UnaryExpression {
    require(cids.length > 0 && centroids.length % cids.length == 0,
      "flat centroid matrix must be k × dim")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>, got ${t.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_nearest_centroid"

    override protected def nullSafeEval(input: Any): Any =
      NearestCentroid.assign(input.asInstanceOf[ArrayData], centroids, cids)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cref = ctx.addReferenceObj("centroids", centroids, "float[]")
      val iref = ctx.addReferenceObj("cids", cids, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NearestCentroid.assign($c, $cref, $iref);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** TWO-LEVEL nearest-centroid assignment: nearest of `branch` super-
    * centroids first, then nearest centroid among that super's members —
    * O((branch + k/branch)·dim) per row instead of O(k·dim). This is the
    * path that keeps assignment LINEAR when k itself scales with n (the
    * semanticDedup pair-scan bound forces k ∝ n, making flat assignment
    * O(n²·dim/const) — quadratic through the back door). Approximate at
    * super-cell boundaries — the same coarse-quantizer approximation
    * every hierarchical IVF accepts (and B5's 2-level k-means already
    * uses for index builds); for near-dup SEMANTICS it only means a
    * boundary vector may compare within a neighboring cell.
    *
    * `memberOffsets`/`memberIdx` encode the CSR member lists per super;
    * members must be ordered by ascending cid within each super so the
    * strict-< argmin resolves ties toward the smaller cid, like the
    * flat kernel.
    */
  case class NearestCentroidHierF32(child: Expression, supers: Array[Float],
                                    memberOffsets: Array[Int], memberIdx: Array[Int],
                                    centroids: Array[Float], cids: Array[Long])
      extends UnaryExpression {
    require(memberOffsets.length >= 2 && memberIdx.length == cids.length,
      "memberOffsets must be CSR over exactly the centroid list")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>, got ${t.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_nearest_centroid_hier"

    override protected def nullSafeEval(input: Any): Any =
      NearestCentroid.assignHier(input.asInstanceOf[ArrayData], supers,
        memberOffsets, memberIdx, centroids, cids)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sref = ctx.addReferenceObj("supers", supers, "float[]")
      val oref = ctx.addReferenceObj("memberOffsets", memberOffsets, "int[]")
      val mref = ctx.addReferenceObj("memberIdx", memberIdx, "int[]")
      val cref = ctx.addReferenceObj("centroids", centroids, "float[]")
      val iref = ctx.addReferenceObj("cids", cids, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.functions.NearestCentroid.assignHier(
           |  $c, $sref, $oref, $mref, $cref, $iref);""".stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column API -------------------------------------------------------
  def l2sq(a: Column, b: Column): Column =
    ColumnShim.column(L2SqF32(ColumnShim.expression(a), ColumnShim.expression(b)))
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimF32(ColumnShim.expression(a), ColumnShim.expression(b)))
  def asymDot(code: Column, planes: Column): Column =
    ColumnShim.column(AsymDotF32(ColumnShim.expression(code), ColumnShim.expression(planes)))
  def buildLut(planes: Column): Column =
    ColumnShim.column(BuildLutF32(ColumnShim.expression(planes)))
  def asymDotLut(code: Column, lut: Column): Column =
    ColumnShim.column(AsymDotLutF32(ColumnShim.expression(code), ColumnShim.expression(lut)))
  def hyperplaneSig(emb: Column, planes: Array[Float], numBands: Int, bandBits: Int): Column =
    ColumnShim.column(
      HyperplaneSigF32(ColumnShim.expression(emb), planes, numBands, bandBits))
  def nearestCentroid(emb: Column, centroids: Array[Float], cids: Array[Long]): Column =
    ColumnShim.column(
      NearestCentroidF32(ColumnShim.expression(emb), centroids, cids))
  def nearestCentroidHier(emb: Column, supers: Array[Float], memberOffsets: Array[Int],
                          memberIdx: Array[Int], centroids: Array[Float],
                          cids: Array[Long]): Column =
    ColumnShim.column(NearestCentroidHierF32(ColumnShim.expression(emb),
      supers, memberOffsets, memberIdx, centroids, cids))

  /** Register as SQL functions (graft_l2sq, graft_cosine, graft_asymdot,
    * graft_buildlut, graft_asymdot_lut, graft_char_entropy,
    * graft_polyhash).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_l2sq", es => L2SqF32(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine", es => CosineSimF32(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_asymdot", es => AsymDotF32(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_buildlut", es => BuildLutF32(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_asymdot_lut", es => AsymDotLutF32(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_char_entropy",
      es => CharEntropy(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_polyhash", es => {
      require(es.length == 1,
        s"graft_polyhash takes exactly 1 argument (base/mod are fixed at 131/1e9+7), got ${es.length}")
      PolyHashString(es.head, 131L, 1000000007L)
    }, "built-in")
  }
}

/** Shared kernel for [[VectorExpressions.HyperplaneSigF32]] — called from
  * both the interpreted and generated paths (the CharEntropy pattern:
  * one static method, no virtual dispatch, no per-row serialization).
  */
object HyperplaneSig {
  def sig(emb: ArrayData, planes: Array[Float], numBands: Int, bandBits: Int): ArrayData = {
    val dim = planes.length / (numBands * bandBits)
    val n = math.min(dim, emb.numElements())
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var bits = 0L
      var i = 0
      while (i < bandBits) {
        val off = (b * bandBits + i) * dim
        var s = 0.0
        var j = 0
        while (j < n) { s += emb.getFloat(j).toDouble * planes(off + j); j += 1 }
        if (s > 0) bits |= (1L << i)
        i += 1
      }
      out(b) = bits
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Shared kernel for [[VectorExpressions.NearestCentroidF32]] — called
  * from both the interpreted and generated paths. `cids` must be sorted
  * ascending (strict `<` then resolves ties toward the smaller id).
  */
object NearestCentroid {
  def assign(emb: ArrayData, centroids: Array[Float], cids: Array[Long]): Long = {
    val k = cids.length
    val dim = centroids.length / k
    val n = math.min(dim, emb.numElements())
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      var j = 0
      while (j < n) {
        val d = emb.getFloat(j).toDouble - centroids(off + j).toDouble
        s += d * d
        j += 1
      }
      // zero-padded tail, matching L2SqF32's unequal-length semantics
      j = n
      while (j < dim) { val d = centroids(off + j).toDouble; s += d * d; j += 1 }
      j = n
      while (j < emb.numElements()) { val d = emb.getFloat(j).toDouble; s += d * d; j += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    cids(best)
  }

  private def d2(emb: ArrayData, flat: Array[Float], off: Int, dim: Int): Double = {
    val n = math.min(dim, emb.numElements())
    var s = 0.0
    var j = 0
    while (j < n) {
      val d = emb.getFloat(j).toDouble - flat(off + j).toDouble
      s += d * d
      j += 1
    }
    j = n
    while (j < dim) { val d = flat(off + j).toDouble; s += d * d; j += 1 }
    j = n
    while (j < emb.numElements()) { val d = emb.getFloat(j).toDouble; s += d * d; j += 1 }
    s
  }

  /** Two-level assignment (see NearestCentroidHierF32): nearest super,
    * then nearest member centroid within it.
    */
  def assignHier(emb: ArrayData, supers: Array[Float], memberOffsets: Array[Int],
                 memberIdx: Array[Int], centroids: Array[Float],
                 cids: Array[Long]): Long = {
    val nSup = memberOffsets.length - 1
    val sdim = supers.length / nSup
    var bestS = -1
    var bestSD = Double.MaxValue
    var s = 0
    while (s < nSup) {
      // a super that lost all members in the Lloyd fit can never yield a
      // centroid — skip it so the member scan below is always non-empty
      if (memberOffsets(s + 1) > memberOffsets(s)) {
        val d = d2(emb, supers, s * sdim, sdim)
        if (d < bestSD) { bestSD = d; bestS = s }
      }
      s += 1
    }
    val dim = centroids.length / cids.length
    var best = memberIdx(memberOffsets(bestS))
    var bestD = Double.MaxValue
    var m = memberOffsets(bestS)
    while (m < memberOffsets(bestS + 1)) {
      val c = memberIdx(m)
      val d = d2(emb, centroids, c * dim, dim)
      if (d < bestD) { bestD = d; best = c }
      m += 1
    }
    cids(best)
  }
}
