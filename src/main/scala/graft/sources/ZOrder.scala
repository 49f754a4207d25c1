package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the third leg of the layout triad
  * alongside `partitionBy(cluster_id)` (partition PRUNING, B12) and
  * `Bucketed` (join CO-LOCATION, q79): writing a table sorted by the
  * interleaved key clusters rows that are close in EVERY keyed dimension
  * into the same parquet row groups, so min/max row-group statistics
  * prune scans with predicates on ANY of the dimensions — the
  * data-skipping layout Delta/Iceberg expose as OPTIMIZE ZORDER, built
  * here from plain column arithmetic.
  *
  * Shape at 100 TB: the key is a pure per-row codegen expression (no
  * shuffle of its own); the one-time clustered write is a single
  * `repartitionByRange(key)` + `sortWithinPartitions(key)` — the same
  * "shuffle once at ingest, never again" trade as bucketing. A sort by
  * (a, b) clusters only the leading column; the Morton key keeps both
  * dimensions selective at once (each additional bit halves the key
  * range in alternating dimensions).
  *
  * Values are first normalized to `bits`-wide integers by affine min/max
  * scaling — floor((v − min) · 2^bits / (max − min + 1)) — with the
  * bounds supplied by the caller (at scale: a broadcast 1-row aggregate,
  * the q81 pattern; bounds are data, not config, so they never go
  * stale). Normalization + interleave are exact integer arithmetic,
  * DuckDB-replayable bit for bit (`zorderOracleSql` emits the identical
  * formula — single source of truth for the q84 oracle).
  */
object ZOrder {

  /** Max bits per dimension for the 2-dim key: 2 × 31 keeps the
    * interleaved key inside a signed 64-bit long. The n-dim forms take
    * `maxBits(d) = 63 / d` per dimension.
    */
  val MaxBits = 31

  /** Max bits per dimension for a d-dimensional key (d·bits ≤ 63). */
  def maxBits(dims: Int): Int = 63 / dims

  /** Normalize `v` from [min, max] to an integer in [0, 2^bits). The
    * `least` clamp guards the f64 rounding edge (the q81 `least` rule): at
    * value ranges approaching 2^50, (max−min)·2^bits/(max−min+1) can round
    * up to exactly 2^bits, whose bit `bits` the interleave never inspects —
    * without the clamp the max value's key would silently collapse toward
    * 0 in that dimension.
    */
  def normalize(v: Column, minV: Column, maxV: Column, bits: Int): Column =
    least(lit((1L << bits) - 1),
      floor((v - minV).cast("double") * (1L << bits).toDouble /
        (maxV - minV + lit(1L)).cast("double")).cast("long"))

  /** d-dimensional Morton key over pre-normalized `bits`-wide integers:
    * bit i of dimension j lands at position i·d + j (dimension 0 owns the
    * least-significant lane, matching Delta/Iceberg's column order
    * convention where the FIRST zorder column varies fastest). The bit
    * positions are Scala-level constants, so the whole key is a flat sum
    * of shift/mask terms inside one codegen stage.
    */
  def interleaveN(cols: Seq[Column], bits: Int): Column = {
    val d = cols.length
    require(d >= 1, "at least one dimension required")
    require(bits >= 1 && bits <= maxBits(d),
      s"bits must be in [1, ${maxBits(d)}] for $d dims, got $bits")
    (for (i <- 0 until bits; j <- 0 until d) yield
      shiftleft(shiftright(cols(j), i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_ + _)
  }

  /** Two-dimensional Morton key (the d=2 case of `interleaveN`): bit i
    * of `a` lands at position 2i, bit i of `b` at 2i + 1.
    */
  def interleave(a: Column, b: Column, bits: Int): Column =
    interleaveN(Seq(a, b), bits)

  /** Normalized Morton key of two columns given their (broadcastable)
    * bounds.
    */
  def zorderKey(a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column, bits: Int): Column =
    interleave(normalize(a, aMin, aMax, bits),
      normalize(b, bMin, bMax, bits), bits)

  /** Normalized d-dimensional Morton key: each element of `dims` is
    * (value, min, max) with the bounds typically columns of a broadcast
    * 1-row aggregate.
    */
  def zorderKeyN(dims: Seq[(Column, Column, Column)], bits: Int): Column =
    interleaveN(dims.map { case (v, mn, mx) => normalize(v, mn, mx, bits) }, bits)

  /** One-time clustered write: range-partition then sort by the Morton
    * key so row-group min/max stats are selective on both dimensions.
    */
  def zorderWrite(df: DataFrame, key: Column, path: String,
      partitions: Int): Unit =
    df.withColumn("zkey", key)
      .repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)

  /** The identical normalization as ANSI SQL — `mn`/`mx` are SQL
    * expressions (typically columns of a joined 1-row bounds CTE, the
    * SQL analog of the Spark side's broadcast bounds aggregate).
    */
  def normSql(v: String, mn: String, mx: String, bits: Int): String =
    s"least(CAST(${(1L << bits) - 1} AS BIGINT), " +
      s"CAST(floor(CAST($v - $mn AS DOUBLE) * ${(1L << bits).toDouble} / " +
      s"CAST($mx - $mn + 1 AS DOUBLE)) AS BIGINT))"

  /** The identical d-dim interleave as ANSI SQL over already-normalized
    * integer expressions — generated from the same bit positions as
    * `interleaveN`, so the q84/q86 oracles can never drift from the
    * Scala expression.
    */
  def interleaveSqlN(ns: Seq[String], bits: Int): String = {
    val d = ns.length
    (for (i <- 0 until bits; j <- 0 until d) yield
      s"(((${ns(j)} >> $i) & 1) << ${i * d + j})").mkString(" + ")
  }

  /** The 2-dim SQL interleave (the d=2 case of `interleaveSqlN`). */
  def interleaveSql(na: String, nb: String, bits: Int): String =
    interleaveSqlN(Seq(na, nb), bits)
}
