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

/** simhash64(tokens): 64-bit SimHash of an array of strings in one
  * pass — bit i of the result is set iff the sum of ±1 contributions
  * of each token's xxhash64 bit i is positive. Token hashes use
  * Spark's own XXH64 with the builtin xxhash64 seed (42), so the
  * result is bit-identical to the relational formulation
  * (explode × 64 bit rows → two groupBys) while doing 64× less row
  * traffic and zero shuffles. Null tokens are skipped.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val cnt = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          cnt(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |final int[] $cnt = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    final long $h = $xxh.hashUTF8String($c.getUTF8String($i), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $cnt[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($cnt[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** vec_signpack(v, offset): packs the sign bits of 32 consecutive
  * elements of a numeric array into a BIGINT — bit i is set iff
  * v[offset + i] > 0. Two calls (offset 0 and 32) binary-quantize a
  * 64-dim embedding into the pair of Hamming codes q_sim_topk_hamming
  * ranks on; 32-bit halves (rather than one 64-bit word) keep every
  * shift in the oracle's integer range too. The interpreted
  * `aggregate(sequence(...))` formulation allocates the 32-element
  * sequence and boxes the accumulator per row; this compiles to a
  * tight allocation-free primitive loop in WholeStageCodegen.
  * Measured (tools/SignpackBench, 2M cached 64-dim rows, local[4]):
  * ~1.3x over the HOF — modest at this dimensionality because the
  * loop is only 32 iterations; the kernel's main value is keeping the
  * packing pass allocation-free inside the scan stage, where at 10^9
  * vectors the HOF's per-row garbage becomes GC pressure the loop
  * never creates. Null and missing elements contribute a 0 bit.
  */
case class SignPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
      if (!right.foldable) TypeCheckResult.TypeCheckFailure(
        "vec_signpack offset must be a literal")
      else right.eval() match {
        // Negative offsets would index before the array start (raw
        // UnsafeArrayData reads have no bounds checks); offsets near
        // Int.MaxValue would overflow off+31 back to negative.
        case off: Int if off < 0 || off > Int.MaxValue - 31 =>
          TypeCheckResult.TypeCheckFailure(
            s"vec_signpack offset must be in [0, ${Int.MaxValue - 31}], got $off")
        case _ => TypeCheckResult.TypeCheckSuccess
      }
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_signpack needs (array<float|double>, int literal), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_signpack"

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val off = b.asInstanceOf[Int]
    val n = arr.numElements()
    var out = 0L
    var i = 0
    while (i < 32) {
      val j = off + i
      if (j >= 0 && j < n && !arr.isNullAt(j)) {
        val v = if (elemIsFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        if (v > 0.0) out |= (1L << i)
      }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, off) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val get =
        if (elemIsFloat) s"(double) $arr.getFloat($j)"
        else s"$arr.getDouble($j)"
      s"""
         |final int $n = $arr.numElements();
         |long $out = 0L;
         |for (int $i = 0; $i < 32; $i++) {
         |  final int $j = $off + $i;
         |  if ($j >= 0 && $j < $n && !$arr.isNullAt($j) && $get > 0.0) {
         |    $out |= (1L << $i);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignPack =
    copy(left = newLeft, right = newRight)
}
