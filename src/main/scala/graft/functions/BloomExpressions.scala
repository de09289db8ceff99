package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(filter, value): membership probe of a string
  * against a serialized `org.apache.spark.util.sketch.BloomFilter` —
  * the map-side pre-filter that makes joins against a large-but-
  * sketchable build side scale: the filter bytes ride in the plan as a
  * foldable binary (exactly how Spark's own InjectRuntimeFilter ships
  * its runtime bloom filters), each executor deserializes them once,
  * and the probe is two hash functions per row inside whole-stage
  * codegen — no shuffle, no broadcast-join hash map.
  *
  * Spark has this expression internally (BloomFilterMightContain) but
  * does not expose it to users; this is the public-surface equivalent,
  * hashing the UTF-8 bytes of the value symmetrically with how the
  * engine's builders insert them (`putBinary(utf8)`).
  *
  * False positives are possible by construction (bounded by the fpp
  * the filter was created with); false negatives are not. Callers that
  * need exactness confirm survivors with an exact join — see
  * q_pipe_bloom_decontaminate.
  */
case class BloomMightContain(filter: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = filter
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    (filter.dataType, value.dataType) match {
      case (BinaryType, StringType) if filter.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain needs a foldable (constant) filter — " +
            "a per-row filter would deserialize per row")
      case (f, v) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs (binary, string) inputs, got " +
          s"${f.simpleString} and ${v.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per JVM that evaluates this expression (driver
    * at fold time, each executor at codegen reference time). */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = filter.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: filter bytes are null")
    BloomFilter.readFrom(bytes)
  }

  override def nullSafeEval(f: Any, v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => {
      s"${ev.value} = $ref.mightContainBinary($v.getBytes());"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(filter = newLeft, value = newRight)
}
