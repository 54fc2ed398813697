package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: exact quantized dot product of two
  * float-vector columns —
  * `Σ floor(a[i]·1000)·floor(b[i]·1000)` as a BIGINT.
  *
  * This is the similarity-search scoring kernel (llm.Similarity). The
  * composable form (`aggregate`/`zip_with` higher-order functions) is
  * semantically identical but evaluates its lambda interpreted,
  * object-boxed per element; this expression generates a tight primitive
  * java loop inside whole-stage codegen — the (b)-tier of the extension
  * ladder (custom Expression before custom operator), used exactly
  * because the built-in form can't reach codegen.
  *
  * Semantics pinned for oracle parity: float widens to double exactly,
  * ×1000 in double, floor, multiply-accumulate in long — identical to
  * the DuckDB list_transform/list_sum formulation in Similarity.oracleDot.
  * Mismatched lengths score only the common prefix; a null element or
  * null vector yields null.
  */
case class QuantDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quant_dot expects two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "quant_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += math.floor(x.getFloat(i).toDouble * 1000d).toLong *
        math.floor(y.getFloat(i).toDouble * 1000d).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (long) java.lang.Math.floor((double) $x.getFloat($i) * 1000d) *
         |          (long) java.lang.Math.floor((double) $y.getFloat($i) * 1000d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantDot =
    copy(left = newLeft, right = newRight)
}
