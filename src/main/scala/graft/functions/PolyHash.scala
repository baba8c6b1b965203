package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial rolling hash:
  * `h = (h·31 + codepoint) mod 1e9+7` over the string's characters —
  * the engine-independent hash underpinning MinHash/SimHash/n-gram
  * dedup signatures ([[graft.ext.TextAnalysis.polyHash]] semantics,
  * which the DuckDB oracles mirror with `list_reduce`). This runs once
  * per shingle per document — the hottest scalar in the dedup
  * pipeline — so it is a real Expression with `doGenCode`, not an
  * interpreted `aggregate(split(...))` chain.
  */
final case class PolyHash(child: Expression, mult: Int = 31)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c, $mult)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  private val P = 1000000007L

  /** matches `aggregate(split(s,""), 0L, (h,ch) -> (h*31+ascii(ch)) % P)`:
    * `ascii` yields the first CODE POINT of each single-char split, so
    * iterate code points, not UTF-16 chars
    */
  def hash(s: UTF8String, mult: Int): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def hash(s: UTF8String): Long = hash(s, 31)

  def apply(c: Column): Column = apply(c, 31)

  def apply(c: Column, mult: Int): Column =
    GraftExprBridge.column(PolyHash(GraftExprBridge.expression(c), mult))
}
