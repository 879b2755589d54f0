package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two numeric arrays.
  *
  * The ANN/dedup operators (Similarity.scala) originally computed dot
  * products as `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) ->
  * acc+v)` — semantically right but it materializes an intermediate array
  * per row-pair and walks it through two higher-order-function frames. At
  * brute-force-ANN volume (|vectors| x |queries| pairs) that interpretive
  * overhead dominates. This expression is the same arithmetic as a single
  * fused loop inside whole-stage codegen: no intermediate array, no
  * lambda dispatch.
  *
  * Bit-parity contract: accumulation is a sequential left-to-right fold
  * in double, each element cast to double first — exactly the fold order
  * of the `aggregate(zip_with(...))` formulation and of DuckDB's
  * `list_dot_product` on `DOUBLE[]`, so results stay hash-identical to
  * the oracle.
  *
  * Mixed element widths are allowed (embeddings are `array<float>`, LSH
  * hyperplanes `array<double>`); each side uses its own accessor.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot expects (array<float|double>, array<float|double>), " +
        s"got (${left.dataType}, ${right.dataType})")

  // Null semantics match the fold it replaced (and list_dot_product):
  // length mismatch or a null element yields NULL, never a silently
  // truncated/partial product.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = elemType(left).get == FloatType
    val rf = elemType(right).get == FloatType
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, v: String, i: String): String = t match {
      case FloatType => s"((double) $v.getFloat($i))"
      case _         => s"$v.getDouble($i)"
    }
    val lt = elemType(left).get
    val rt = elemType(right).get
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${getter(lt, a, i)} * ${getter(rt, b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
