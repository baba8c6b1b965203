package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd token n-gram hasher: the polynomial hash of every
  * `n`-token shingle of the space-split text, in one pass per row.
  *
  * Semantically EXACTLY `transform(shingles(text, n), s => polyHash(s))`
  * (`wide = true` ↦ `polyHashWide`), which the DuckDB oracles mirror —
  * but evaluated natively. The higher-order-function formulation
  * re-evaluates every free subexpression inside its lambda PER ELEMENT
  * (the `split` behind `toks` runs once per gram, and any consumer
  * nesting the result in another lambda re-runs the whole gram pipeline
  * per window), turning a linear map into O(n²) interpreted work per
  * row — measured 15 ms/row on 54-token documents. This expression is
  * O(chars·n) with zero allocation per gram: because tokens are joined
  * by single spaces, each gram string IS a substring of the original
  * text, so the fold runs over `[tokenStart(i), tokenEnd(i+n-1))`
  * directly.
  */
final case class GramHashes(child: Expression, n: Int,
                            wide: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes expects string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], n, wide)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashes.compute($c, $n, $wide)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  private val P = 1000000007L

  /** `split(text, " ")` boundaries (Java split, limit −1: consecutive
    * separators yield empty tokens, trailing empties kept) as token
    * start offsets; gram `i` spans `[starts(i), end(i+n-1))` of the
    * original string — single-space joins make the substring identical
    * to `concat_ws(" ", slice(toks, i+1, n))`.
    */
  def compute(s: UTF8String, n: Int, wide: Boolean): ArrayData = {
    val str = s.toString
    var nTok = 1
    var i = 0
    while (i < str.length) { if (str.charAt(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nGrams = math.max(nTok - n + 1, 1)
    val out = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val lastTok = math.min(g + n - 1, nTok - 1)
      val to = if (lastTok == nTok - 1) str.length else starts(lastTok + 1) - 1
      var h31 = 0L
      var h131 = 0L
      var j = from
      while (j < to) {
        val cp = str.codePointAt(j)
        h31 = (h31 * 31 + cp) % P
        if (wide) h131 = (h131 * 131 + cp) % P
        j += Character.charCount(cp)
      }
      out(g) = if (wide) h31 * P + h131 else h31
      g += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    GraftExprBridge.column(GramHashes(GraftExprBridge.expression(c), n))

  def wide(c: Column, n: Int): Column =
    GraftExprBridge.column(
      GramHashes(GraftExprBridge.expression(c), n, wide = true))
}

/** Native sliding-window minimum over an `array<long>` — the winnowing
  * window step (Schleimer–Wilkerson–Aiken, SIGMOD 2003). Semantically
  * EXACTLY `transform(sequence(1, greatest(size(a) − (w−1), 1)),
  * i => array_min(slice(a, i, w)))` — `max(len − w + 1, 1)` windows,
  * the short-input window clamped to the available elements — but a
  * single O(len) monotonic-deque pass instead of the HOF chain that
  * re-evaluates the input subtree per window position.
  */
final case class SlidingMin(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_min expects array<long>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    SlidingMin.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SlidingMin.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)
}

object SlidingMin {
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val len = arr.numElements()
    // empty input: one window, min of nothing = null (array_min([]))
    if (len == 0) return new GenericArrayData(Array[Any](null))
    val m = math.max(len - w + 1, 1)
    val out = new Array[Long](m)
    // monotonic deque of indices; values ascending from the head
    val dq = new Array[Int](len)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < len) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      // window starting at j covers [j, j+w-1]; once i >= w-1 the
      // window j = i-w+1 is complete — evict indices before j
      if (i >= w - 1) {
        val j = i - w + 1
        while (dq(head) < j) head += 1
        out(j) = arr.getLong(dq(head))
      }
      i += 1
    }
    // short input (len < w): the single clamped window is min of all
    if (len < w) out(0) = arr.getLong(dq(head))
    new GenericArrayData(out)
  }

  def apply(c: Column, w: Int): Column =
    GraftExprBridge.column(SlidingMin(GraftExprBridge.expression(c), w))
}
