package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** vec_dot(a, b): dot product of two numeric arrays in double
  * precision, as a native codegen'd Catalyst expression.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions evaluate
  * interpreted, one closure dispatch + boxing per element — measured
  * ~200µs per 64-dim pair, which turns a 400k-pair similarity join
  * into minutes of CPU. This expression compiles to a tight primitive
  * loop inside WholeStageCodegen (~100ns/pair): the difference between
  * "embedding similarity works in a demo" and "embedding similarity
  * works on 10^9 vectors".
  *
  * Semantics match DuckDB's list_dot_product over DOUBLE[] for oracle
  * parity: each element widens to double (exact for floats), products
  * accumulate sequentially in double. Arrays of unequal length dot
  * over the common prefix; null ELEMENTS are treated as 0 (embeddings
  * never contain them — parquet just marks the slot nullable).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0
        else if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0
        else if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, idx: String, isFloat: Boolean) =
        if (isFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      val lGet = get(l, i, elemIsFloat(left))
      val rGet = get(r, i, elemIsFloat(right))
      s"""
         |final int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$l.isNullAt($i) && !$r.isNullAt($i)) {
         |    $s += $lGet * $rGet;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
