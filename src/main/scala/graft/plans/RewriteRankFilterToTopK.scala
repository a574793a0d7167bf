package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite (the extension matrix's `Rule[LogicalPlan]` tier):
  * recognize the ubiquitous top-k-per-group idiom
  *
  *   Project(cols, Filter(rn <= k, Window(row_number() AS rn over
  *     (PARTITION BY keys ORDER BY o), keys, o, child)))
  *
  * where the projection DROPS the rank column, and replace it with the
  * bounded-heap [[TopKPerKeyPlan]] — turning every "keep the best k per
  * key then discard the rank" (including last-wins dedup, k = 1) from a
  * full per-partition sort into a one-pass heap, automatically, with no
  * query rewrite by the user.
  *
  * Fires ONLY when provably equivalent:
  *  - the Window computes exactly ONE expression, a `row_number()` over a
  *    non-empty partition spec (rank/dense_rank admit ties — different
  *    row sets under duplicates — so only row_number is eligible);
  *  - the filter is a sole `rn <= k` / `rn < k` / `rn = 1` comparison
  *    against a literal;
  *  - no surviving expression references the rank attribute (the heap form
  *    does not produce it).
  *
  * Ties in the ordering make BOTH forms pick an arbitrary winner, so the
  * rewrite never loses determinism the window form actually had.
  * Conf-gated: `spark.graft.rewrite.topk=false` restores the window plan.
  *
  * Memory contract: the heap form retains keys × k rows per partition, so
  * a high-cardinality key (near-unique dedup keys, k = 1) retains close to
  * the whole partition — [[TopKPerKeyExec]] bounds that by spilling
  * key-sorted runs past `spark.graft.topk.spillRowThreshold` rows and
  * merge-joining them at the end, so the rewrite stays safe to fire
  * unconditionally (the window form it replaces spills through the sorter
  * in the same regime).
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewrite.topk"

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k >= 1 => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "true") != "true") plan
    else plan.transform {
      case p @ Project(projList,
          Filter(cond, Window(Seq(al @ Alias(WindowExpression(RowNumber(), _), _)),
            partSpec, orderSpec, child, _)))
          if partSpec.nonEmpty && orderSpec.nonEmpty &&
            limitOf(cond, al.toAttribute).isDefined &&
            projList.forall(!_.references.contains(al.toAttribute)) =>
        val k = limitOf(cond, al.toAttribute).get
        Project(projList, TopKPerKeyPlan(partSpec, orderSpec, k, child))
    }
}
