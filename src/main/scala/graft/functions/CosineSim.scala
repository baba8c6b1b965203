package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors,
  * rounded to 6 decimals (SURVEY §2.D similarity row; the custom-
  * Expression tier of the extension preference order — a codegen'd
  * scalar beats the `aggregate(zip_with(...))` higher-order-function
  * formulation, which is evaluated interpretively outside whole-stage
  * codegen).
  *
  * Numerics contract (shared with the DuckDB oracles): accumulate
  * dot/norms in doubles over the elements IN INDEX ORDER — a plain
  * sequential fold, bit-identical to the `list_reduce` mirror — then
  * `round(x, 6)` half-up. NULL if either input is null or lengths
  * differ.
  */
final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // each side independently array<float> or array<double> (k-means
  // centroids are double literals; corpus embeddings are floats)
  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isDoubleElem(dt: DataType): Boolean =
    elemType(dt).contains(DoubleType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = isDoubleElem(left.dataType)
    val yd = isDoubleElem(right.dataType)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // propagate like the HOF path
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // zero-norm: Spark's Divide yields NULL on a zero divisor under
    // the engine's ANSI-off config — match the HOF formulation
    if (nx == 0.0 || ny == 0.0) null
    else CosineSim.round6(dot / math.sqrt(nx) / math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = $x.numElements();
        if ($n != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
            if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; }
            else {
              double $xi = (double) $x.${if (isDoubleElem(left.dataType)) "getDouble" else "getFloat"}($i);
              double $yi = (double) $y.${if (isDoubleElem(right.dataType)) "getDouble" else "getFloat"}($i);
              $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
            }
          }
          if (!${ev.isNull}) {
            if ($nx == 0.0 || $ny == 0.0) { ${ev.isNull} = true; }
            else {
              ${ev.value} = graft.functions.CosineSim.round6(
                $dot / java.lang.Math.sqrt($nx) / java.lang.Math.sqrt($ny));
            }
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** round half-up at 6 decimals — matches `functions.round` and the
    * oracle's `round(x, 6)`. NaN/Infinity pass through unchanged (a
    * zero-norm vector yields NaN on the HOF path too; BigDecimal would
    * throw).
    */
  def round6(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def apply(a: Column, b: Column): Column =
    GraftExprBridge.column(
      CosineSim(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
