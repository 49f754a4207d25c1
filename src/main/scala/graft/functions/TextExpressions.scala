package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable polynomial string hash
  * (base-B fold of character values mod P) that anchors every
  * oracle-replayable signature pipeline (minhash shingles, simhash token
  * votes, rolling fingerprints).
  *
  * Replaces the interpreted `aggregate(filter(split(s, "")), ...)` HOF
  * chain, which allocates a per-character array and evaluates a lambda
  * per char with no codegen. Arithmetic is IDENTICAL: iterate UTF-16
  * code units (what Spark's `split(s, "") → ascii(c)` produced — for
  * the ASCII corpora both equal DuckDB's codepoint semantics),
  * acc = (acc·base + char) mod P. Inside a higher-order `transform`
  * the expression still runs via eval() — a tight char loop instead of
  * the Column machinery — and outside HOFs it participates in
  * whole-stage codegen.
  */
case class PolyHashString(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      acc = (acc * base + s.charAt(i).toLong) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |int $n = $s.length();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * ${base}L + (long) $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def polyHash(s: Column, base: Long, mod: Long): Column =
    ColumnShim.column(PolyHashString(ColumnShim.expression(s), base, mod))
}
