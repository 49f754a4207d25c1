package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable polynomial string hash
  * (base-B fold of Unicode CODEPOINTS mod P) that anchors every
  * oracle-replayable signature pipeline (minhash shingles, simhash token
  * votes, rolling fingerprints).
  *
  * Replaces the interpreted `aggregate(filter(split(s, "")), ascii(c))`
  * HOF chain, which allocated a per-character array and evaluated a
  * lambda per char with no codegen. Arithmetic is identical: Spark's
  * `split(s, "")` is codepoint-aware and `ascii(c)` returns
  * `codePointAt(0)`, and DuckDB's `ascii(substring(tok, i, 1))` is
  * likewise codepoint-based — so the fold walks UTF-8 bytes and decodes
  * codepoints directly (no String copy, surrogate pairs fold as ONE
  * step). Inside a higher-order `transform` the expression still runs
  * via eval() — a tight byte loop — and outside HOFs it participates in
  * whole-stage codegen (both paths call the same static `hash`).
  */
case class PolyHashString(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHashString.hash(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHashString.hash($c, ${base}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHashString {
  /** Codepoint fold over the raw UTF-8 bytes — no String allocation.
    * Called from both the interpreted and generated paths.
    */
  def hash(s: UTF8String, base: Long, mod: Long): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b < 0x80) { cp = b }
      else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
      else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
      else if ((b & 0xF8) == 0xF0) { cp = b & 0x07; len = 4 }
      else { cp = b } // invalid lead (0x80–0xBF, 0xF8–0xFF): lone raw byte
      if (i + len > n) { len = 1; cp = b } // truncated tail: lone raw byte
      var j = 1
      while (j < len) { cp = (cp << 6) | (s.getByte(i + j) & 0x3F); j += 1 }
      acc = (acc * base + cp) % mod
      i += len
    }
    acc
  }
}

/** Fused word-shingle hasher: whitespace-tokenize, polynomial-hash each
  * token (codepoint fold, like [[PolyHashString]]), then fold each
  * n-token window into one shingle hash — all in a single expression
  * pass over the string, no intermediate token/string arrays.
  *
  * Replaces the `transform(split(...), polyHash) → transform(sequence,
  * window-fold)` HOF chain in `Dedup.minhashPairs` with identical
  * arithmetic (asserted by spec, and by the unchanged q20 DuckDB
  * oracle): token separator class matches Java regex `\s+`
  * ([ \t\n\x0B\f\r] — the corpus is pre-trimmed/lowered by the caller),
  * shingle fold is acc = (acc·base + tokHash) mod `mod` over the
  * window. Returns array<long> of (numTokens − n + 1) hashes; empty
  * when the text has fewer than n tokens.
  */
case class ShinglePolyHashes(child: Expression, n: Int, base: Long, mod: Long)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_polyhash"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = ShinglePolyHashes.shingles(input.asInstanceOf[UTF8String], n, base, mod)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.ShinglePolyHashes.shingles($c, $n, ${base}L, ${mod}L));
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglePolyHashes {
  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Token polyhashes then n-window shingle folds, single byte pass.
    * Tokenization matches Spark's `split(s, "\\s+")` (limit −1) exactly,
    * INCLUDING boundary empty tokens: leading whitespace yields a
    * leading "" token (hash 0), trailing whitespace a trailing one, and
    * "" yields [""], because Spark's trim strips only ASCII spaces — a
    * doc bounded by \t/\n survives trim and the replaced chain (and the
    * DuckDB oracle) fold that empty token.
    *
    * Malformed UTF-8 never swallows a separator: a lead byte is only
    * honored when its continuation bytes are genuine (0b10xxxxxx);
    * otherwise the single byte folds alone — unlike a naive decoder
    * that would consume the following whitespace into a bogus
    * codepoint and merge two tokens.
    */
  def shingles(s: UTF8String, n: Int, base: Long, mod: Long): Array[Long] = {
    val th = tokenHashes(s, base, mod)
    val t = th.length
    if (t < n) Array.empty[Long]
    else Array.tabulate(t - n + 1) { k =>
      var h = 0L
      var j = 0
      while (j < n) { h = (h * base + th(k + j)) % mod; j += 1 }
      h
    }
  }

  /** WIDE (~61-bit) shingle values for the corpus-scale near-dup paths:
    * per window, hi = the base-`base` fold of the token hashes (exactly
    * [[shingles]]) and lo = a base-`base2` fold of the SQUARED token
    * hashes (th² mod P), packed as hi·2³¹ + lo. Two different small-base
    * LINEAR folds do NOT give independent hashes over low-entropy token
    * alphabets — both are linear in the same digit-difference lattice,
    * so unrelated windows that collide under one base collide under the
    * other ~10¹¹× more often than chance (measured: every mod-P
    * candidate collision at n = 10⁶ was a simultaneous 131/137
    * collision). Squaring mod P before the second fold breaks that
    * linearity (Δ(th²) = Δth·(th+th′) carries a pair-dependent factor),
    * making joint collisions ~1/P² as intended, while every intermediate
    * stays inside i64 (th² < 1.1e18) so DuckDB replays it exactly.
    */
  def wideShingles(s: UTF8String, n: Int, base: Long, base2: Long, mod: Long): Array[Long] = {
    val th = tokenHashes(s, base, mod)
    val t = th.length
    if (t < n) Array.empty[Long]
    else Array.tabulate(t - n + 1) { k =>
      var hi = 0L
      var lo = 0L
      var j = 0
      while (j < n) {
        val x = th(k + j)
        hi = (hi * base + x) % mod
        lo = (lo * base2 + (x * x) % mod) % mod
        j += 1
      }
      (hi << 31) | lo // both < P < 2^31 → value < 2^61
    }
  }

  /** Token polyhash scan shared by [[shingles]] and [[wideShingles]] —
    * one byte pass, no String allocation.
    */
  def tokenHashes(s: UTF8String, base: Long, mod: Long): Array[Long] = {
    val nb = s.numBytes()
    val toks = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    var acc = 0L
    var inTok = false
    def emit(): Unit = { toks += acc; acc = 0L }
    if (nb == 0) emit() // "" → [""], like split
    else {
      if (isWs(s.getByte(0) & 0xFF)) emit() // leading boundary empty token
      while (i < nb) {
        val b = s.getByte(i) & 0xFF
        if (b < 0x80 && isWs(b)) {
          if (inTok) { emit(); inTok = false }
          i += 1
        } else {
          inTok = true
          var cp = 0
          var len = 1
          if (b < 0x80) { cp = b }
          else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
          else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
          else if ((b & 0xF8) == 0xF0) { cp = b & 0x07; len = 4 }
          if (i + len > nb) len = 1
          var j = 1
          var valid = true
          while (valid && j < len) {
            if ((s.getByte(i + j) & 0xC0) != 0x80) valid = false else j += 1
          }
          if (!valid || len == 1) { cp = b; len = 1 }
          else { j = 1; while (j < len) { cp = (cp << 6) | (s.getByte(i + j) & 0x3F); j += 1 } }
          acc = (acc * base + cp) % mod
          i += len
        }
      }
      if (inTok) emit() // trailing real token
      if (isWs(s.getByte(nb - 1) & 0xFF)) emit() // trailing boundary empty token
    }
    toks.result()
  }
}

/** Fused tokenize → token-hash → wide two-component window fold (see
  * [[ShinglePolyHashes.wideShingles]]) — same single byte pass as
  * ShinglePolyHashes, emitting ~61-bit collision-resistant shingle values
  * for the minhash scale path.
  */
case class ShingleWideHashes(child: Expression, n: Int, base: Long, base2: Long,
                             mod: Long)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_widehash"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = ShinglePolyHashes.wideShingles(input.asInstanceOf[UTF8String], n, base, base2, mod)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.ShinglePolyHashes.wideShingles($c, $n, ${base}L, ${base2}L, ${mod}L));
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Apply ONE learned BPE merge (a, b) → a·b over a symbol array in a
  * single left-to-right greedy scan (the standard BPE application
  * order: "aaa" under merge (a,a) becomes [aa, a]). The merge pair
  * rides in the plan as reference objects, so a k-merge tokenizer is k
  * nested copies of this expression — all inside whole-stage codegen,
  * no UDF, no per-row lambda. Used by `operators/BpeTrain` for both the
  * training loop (one merge appended per iteration over the compressed
  * word table) and corpus segmentation.
  */
case class MergePair(child: Expression, a: UTF8String, b: UTF8String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge"

  override protected def nullSafeEval(input: Any): Any =
    MergePair.merge(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeMergeA", a, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("bpeMergeB", b, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MergePair.merge($c, $aRef, $bRef);\n")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MergePair {
  def merge(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            a: UTF8String, b: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    val ab = UTF8String.concat(a, b)
    var i = 0
    while (i < n) {
      if (i + 1 < n && a.equals(arr.getUTF8String(i)) && b.equals(arr.getUTF8String(i + 1))) {
        out.add(ab); i += 2
      } else { out.add(arr.getUTF8String(i)); i += 1 }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[UTF8String](out.size())))
  }
}

/** Shannon entropy (log base 2) of a string's CODEPOINT multiset — the
  * classic gibberish/boilerplate quality signal (low entropy = repeated
  * characters/padding, high = encrypted/binary junk). One byte pass, no
  * allocation for ASCII (128-slot table; rare higher codepoints spill to
  * a small map), row-local and codegen-resident like the other text
  * kernels. Matches DuckDB's `entropy(unnest(string_split(text, '')))`
  * per-character semantics (codepoint-aware, log2), which is exactly how
  * the q96 oracle replays it.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.entropy($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  private val Log2 = math.log(2.0)

  /** −Σ (c/n)·log2(c/n) over codepoint counts; 0.0 for the empty string.
    * Decoder matches [[PolyHashString.hash]] (malformed tails fold as
    * lone bytes). Summation order is fixed (ASCII slots ascending, then
    * spill-map insertion order) so results are bit-stable run to run.
    */
  def entropy(s: UTF8String): Double = {
    val nb = s.numBytes()
    if (nb == 0) return 0.0
    val ascii = new Array[Int](128)
    var spill: java.util.LinkedHashMap[Int, Array[Int]] = null
    var total = 0
    var i = 0
    while (i < nb) {
      val b = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b < 0x80) { cp = b }
      else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
      else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
      else if ((b & 0xF8) == 0xF0) { cp = b & 0x07; len = 4 }
      else { cp = b } // invalid lead (0x80–0xBF, 0xF8–0xFF): lone raw byte
      if (i + len > nb) { len = 1; cp = b } // truncated tail: lone raw byte
      var j = 1
      while (j < len) { cp = (cp << 6) | (s.getByte(i + j) & 0x3F); j += 1 }
      if (cp < 128) ascii(cp) += 1
      else {
        if (spill == null) spill = new java.util.LinkedHashMap[Int, Array[Int]]()
        val cell = spill.get(cp)
        if (cell == null) spill.put(cp, Array(1)) else cell(0) += 1
      }
      total += 1
      i += len
    }
    val n = total.toDouble
    var h = 0.0
    var k = 0
    while (k < 128) {
      val c = ascii(k)
      if (c > 0) { val p = c / n; h -= p * math.log(p) / Log2 }
      k += 1
    }
    if (spill != null) {
      val it = spill.values().iterator()
      while (it.hasNext) { val p = it.next()(0) / n; h -= p * math.log(p) / Log2 }
    }
    h
  }
}

object TextExpressions {
  def polyHash(s: Column, base: Long, mod: Long): Column =
    ColumnShim.column(PolyHashString(ColumnShim.expression(s), base, mod))
  def shinglePolyHashes(s: Column, n: Int, base: Long, mod: Long): Column =
    ColumnShim.column(ShinglePolyHashes(ColumnShim.expression(s), n, base, mod))
  def shingleWideHashes(s: Column, n: Int, base: Long, base2: Long, mod: Long): Column =
    ColumnShim.column(ShingleWideHashes(ColumnShim.expression(s), n, base, base2, mod))
  def charEntropy(s: Column): Column =
    ColumnShim.column(CharEntropy(ColumnShim.expression(s)))
  def mergePair(syms: Column, a: String, b: String): Column =
    ColumnShim.column(MergePair(ColumnShim.expression(syms),
      UTF8String.fromString(a), UTF8String.fromString(b)))
}
