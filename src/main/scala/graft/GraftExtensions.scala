package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContain, DotProduct, NGrams, PqAdc, PqEncode, SignPack, SimHash64}

/** Engine extension point, applied via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * public SparkSessionExtensions surface. Registers the native vector
  * kernels so SQL and `call_function` resolve them, and the
  * GraftLake SQL planning rule (reads + row-level UPDATE/DELETE for
  * `graft.<ns>.<table>` relations).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session =>
      graft.lake.sql.GraftSqlResolution(session))
    // plans the bucket-local (storage-partitioned) scan claim — see
    // graft.plans.ClaimHashPartitioned
    ext.injectPlannerStrategy(_ =>
      graft.plans.ClaimHashPartitionedStrategy)
    // distribute filters/projections over the claim so pushdown and
    // column pruning reach the per-bucket parquet scans
    ext.injectOptimizerRule(_ => graft.plans.ClaimPushdown)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "vec_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_signpack"),
      new ExpressionInfo(classOf[SignPack].getCanonicalName, "vec_signpack"),
      (children: Seq[Expression]) => SignPack(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getCanonicalName, "pq_encode"),
      (children: Seq[Expression]) => PqEncode(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGrams].getCanonicalName, "ngrams"),
      (children: Seq[Expression]) => NGrams(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getCanonicalName,
        "bloom_might_contain"),
      (children: Seq[Expression]) =>
        BloomMightContain(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getCanonicalName, "pq_adc"),
      (children: Seq[Expression]) => PqAdc(children.head, children(1))))
  }
}
