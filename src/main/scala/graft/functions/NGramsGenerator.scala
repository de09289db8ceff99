package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** ngrams(text, n): native table-valued GENERATOR emitting one row per
  * word n-gram of a whitespace-tokenized string — the generator-class
  * extension point (everything else in graft.functions is a scalar
  * Expression; lake plans cover LogicalPlan/Strategy; this rounds out
  * the remaining Catalyst extension kind).
  *
  * Why a generator instead of `explode(transform(sequence(...)))`: the
  * HOF form materializes the full gram ARRAY per document before the
  * explode copies it out again — at 100 TB of documents that is every
  * gram buffered twice. A Generator streams rows straight out of
  * GenerateExec with one UTF8String allocation per gram and nothing
  * buffered per document.
  *
  * Semantics (pinned in NGramsSpec, bit-equal with the HOF form and
  * the DuckDB oracle): tokens are split on single spaces (consecutive
  * separators yield empty tokens, exactly like `split(text, ' ')` /
  * DuckDB string_split); documents with fewer than n tokens emit
  * nothing; NULL input emits nothing; n must be a foldable positive
  * integer (analysis error otherwise).
  */
case class NGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, n.dataType) match {
      case (StringType, IntegerType) if n.foldable =>
        val nv = n.eval(null)
        if (nv != null && nv.asInstanceOf[Int] > 0)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"ngrams n must be a positive integer literal, got $nv")
      case (c, nn) => TypeCheckResult.TypeCheckFailure(
        s"ngrams needs (string, foldable int), got " +
          s"${c.simpleString} and ${nn.simpleString}")
    }

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)

  @transient private lazy val k: Int = n.eval(null).asInstanceOf[Int]
  @transient private lazy val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) Iterator.empty
    else {
      // -1 keeps trailing empty tokens, matching split(text, ' ')
      val toks = s.split(space, -1)
      if (toks.length < k) Iterator.empty
      else (0 to toks.length - k).iterator.map { i =>
        InternalRow(UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(toks, i, i + k): _*))
      }
    }
  }

  override def prettyName: String = "ngrams"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGrams =
    copy(child = newChildren(0), n = newChildren(1))
}
