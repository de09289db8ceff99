package graft.plans

import org.apache.spark.rdd.{RDD, UnionRDD}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** The storage-partitioned-join primitive: declares that partition i
  * of this node — the i-th child, coalesced to one partition — holds
  * exactly the rows with `pmod(hash(key), children.size) == i`.
  *
  * GraftLake tables clustered `bucket(n, k)` record each data file's
  * bucket-id range as a derived manifest stat, and
  * [[graft.lake.GraftTable.bucketLocalRead]] assembles one child scan
  * per bucket from those stats — the same pre-plan file-group
  * assignment the stats-pruning path uses, applied to layout instead
  * of selection. The bucket transform IS Spark's shuffle function
  * (`pmod(hash(col), n)`, murmur3 seed 42 — ClusterSpec.BucketField),
  * so the claimed `HashPartitioning(key, n)` is literally the layout
  * EnsureRequirements would otherwise shuffle both sides to produce:
  * a join of two co-bucketed reads plans with ZERO Exchange nodes,
  * just per-partition local sorts. At 100 TB this removes the
  * full-table shuffle of BOTH sides of a fact-fact equi-join.
  *
  * The node unions its children's RDDs ITSELF (child i → coalesce(1)
  * → partition i) rather than planning a Union of Coalesce(1) slices:
  * UnionExec under `spark.sql.unionOutputPartitioning` (Spark 4
  * default) zips same-partitioned children, which would merge every
  * SinglePartition slice into ONE partition and break the
  * index-is-bucket-id invariant.
  *
  * Trust contract: the node asserts what the builder guarantees —
  * only construct it over per-bucket slices that provably contain
  * bucket i alone (bucketLocalRead checks every live file's recorded
  * bucket stat, refuses delete files and statless foreign files, and
  * residual-filters files that straddle buckets).
  */
/** `keyAttr` pins the claimed key to the ATTRIBUTE (by exprId) in
  * `output` that actually carries bucketed values; `keyName` is only
  * the human-readable label. Tracking by NAME alone is unsound: a
  * projection can drop the bucketed key while aliasing a DIFFERENT
  * column to its name (`select(other.as("k"))`), and a name-based
  * claim would then bind HashPartitioning to the wrong attribute — a
  * false layout claim that can elide a required Exchange and produce
  * wrong join/aggregate results. The key is an EXPRESSION field (not
  * a bare ExprId) so analyzer/optimizer attribute rewrites — e.g.
  * self-join deduplication re-minting one side's ids — rewrite it in
  * lockstep with the children; `None` (or an attr no longer in
  * `output`) degrades the exec to UnknownPartitioning. */
final case class ClaimHashPartitioned(keyName: String,
    keyAttr: Option[Attribute],
    children: Seq[LogicalPlan]) extends LogicalPlan {
  override def output: Seq[Attribute] = children.head.output
  // like Union, rows are consumed POSITIONALLY from every child under
  // the head's attribute names — declare each child's full output
  // referenced, or ColumnPruning sees children 2..n's attributes as
  // unused and prunes their scans to zero columns (the consumer then
  // reads fields off empty rows)
  override def references: org.apache.spark.sql.catalyst.expressions
    .AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      children.flatMap(_.output))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): ClaimHashPartitioned =
    copy(children = newChildren)
}

final case class ClaimHashPartitionedExec(keyName: String,
    keyAttr: Option[Attribute],
    children: Seq[SparkPlan]) extends SparkPlan {
  override def output: Seq[Attribute] = children.head.output

  override def outputPartitioning: Partitioning =
    // bind by exprId, never by name (see the logical node's scaladoc);
    // column pruning may drop the key (e.g. a bare count()) — the
    // layout claim is then unmakeable AND unneeded
    keyAttr.flatMap(a => output.find(_.exprId == a.exprId))
      .map(key => HashPartitioning(Seq(key), children.size))
      .getOrElse(UnknownPartitioning(children.size))

  override protected def doExecute(): RDD[InternalRow] =
    new UnionRDD(sparkContext, children.map { c =>
      val r = c.execute()
      // coalesce(1) of a 0-partition RDD stays 0-partition and would
      // shift every later bucket's index — pad instead
      if (r.getNumPartitions == 0)
        sparkContext.parallelize(Seq.empty[InternalRow], 1)
      else r.coalesce(1, shuffle = false)
    })

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): ClaimHashPartitionedExec =
    copy(children = newChildren)
}

/** Plans the logical claim 1:1 onto the physical one; injected via
  * GraftExtensions. */
object ClaimHashPartitionedStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ClaimHashPartitioned(k, attr, children) =>
      ClaimHashPartitionedExec(k, attr, children.map(planLater)) :: Nil
    case _ => Nil
  }
}

/** Filters and projections DISTRIBUTE over the claim exactly as over
  * a Union — push them into every per-bucket child so they reach the
  * parquet scans (PushedFilters + pruned ReadSchema). Catalyst's own
  * pushdown rules stop at unknown nodes, so without this a filtered
  * bucket-local read scans every column of every row and filters
  * above — the difference between a stats-pruned column-pruned scan
  * and a full-table read at 100 TB. Injected via GraftExtensions
  * (injectOptimizerRule, so it runs inside the operator-optimization
  * fixpoint alongside CollapseProject and PushDownPredicates).
  *
  * Filtering never invalidates the layout claim (a subset of rows
  * with pmod(hash(key),n)=i still satisfies it). A projection may
  * RENAME the key — the claim's keyName follows the alias (today the
  * alias-aware ProjectExec preserved the partitioning from ABOVE; the
  * pushed form must preserve it from within) — or drop it, in which
  * case the exec already degrades to UnknownPartitioning. */
object ClaimPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  private def rebind(e: Expression, from: Seq[Attribute],
      to: Seq[Attribute]): Expression = {
    val idx = from.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
    e.transform {
      case a: AttributeReference if idx.contains(a.exprId) =>
        to(idx(a.exprId))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case Filter(cond, c: ClaimHashPartitioned) if cond.deterministic =>
        c.copy(children = c.children.zipWithIndex.map { case (ch, i) =>
          // child 0 owns the claim's output attrs: condition as-is
          Filter(if (i == 0) cond else rebind(cond, c.output, ch.output),
            ch)
        })
      case Project(list, c: ClaimHashPartitioned)
          if list.forall(_.deterministic) =>
        // resolve the surviving key by EXPR ID: the projected column
        // is the key iff its underlying attribute IS the claimed one.
        // A different column aliased to the key's name must NOT keep
        // the claim (false-layout hazard); a key that doesn't survive
        // degrades the claim to UnknownPartitioning via keyId = None.
        val newKey = c.keyAttr.flatMap(ka => list.collectFirst {
          case a: AttributeReference if a.exprId == ka.exprId => a
          case al @ Alias(a: AttributeReference, _)
            if a.exprId == ka.exprId => al.toAttribute
        })
        ClaimHashPartitioned(
          newKey.map(_.name).getOrElse(c.keyName), newKey,
          c.children.zipWithIndex.map { case (ch, i) =>
            // child 0 keeps the projection verbatim so the claim's
            // output exprIds are exactly the old Project's; siblings
            // mint fresh alias ids (their outputs are never referenced)
            val bound =
              if (i == 0) list
              else list.map { ne =>
                rebind(ne, c.output, ch.output) match {
                  case a: AttributeReference => a
                  case al: Alias => Alias(al.child, al.name)()
                  case other => Alias(other, ne.name)()
                }
              }
            Project(bound, ch)
          })
    }
}
