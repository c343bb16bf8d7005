package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, In, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: a UNION ALL whose branches are the same plan except for
  * one equality-literal filter collapses into a single `IN`-filtered
  * branch:
  *
  *   Union(P[c = v1], P[c = v2], ...)  ≡  P[c IN (v1, v2, ...)]
  *
  * Motivation: the multi-stream fan-in pattern (one branch per routed
  * event type over one table — the reference's per-exchange streams,
  * liq-stream `stream.py:169-188`, replayed over a shared source) plans N
  * full scans of the same data, because Spark does not merge identical
  * scans across union branches. At 100 TB that is N full passes for one
  * logical pass of work. Round 1 fixed the library query by hand
  * (`Relational.unionAllStreams`); this rule performs the same rewrite
  * inside Catalyst for any user query of that shape — including after
  * pushdown has moved the filters below projections and added isnotnull
  * conjuncts.
  *
  * Mechanics: each branch must contain exactly one `attr = literal`
  * conjunct (either side) across all its Filter nodes; replacing that
  * literal with a type-default sentinel must make every branch's
  * CANONICALIZED plan identical (same source, same projections, same
  * other predicates — exprId differences normalized). The head branch
  * then carries `attr IN (all literals)` in place of its equality.
  *
  * Soundness: UNION ALL has bag semantics, so the rewrite requires the
  * branch predicates to be pairwise disjoint — guaranteed by all-distinct,
  * non-null literals on the same (positionally canonical) attribute of
  * the same plan. Nondeterministic branches are never merged (evaluation
  * count would change). Branch row interleaving changes, which UNION ALL
  * does not guarantee anyway. A trailing Project re-exposes the Union's
  * output exprIds to parent operators.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`); behavior locked in MergeUnionSpec.
  */
object MergeDisjointFilterUnions extends Rule[LogicalPlan] with PredicateHelper {

  /** The single eq-literal conjunct of a branch: (filter node, attribute,
    * literal). None when absent or ambiguous.
    *
    * The walk descends ONLY through row-preserving operators (Filter /
    * Project / SubqueryAlias). A filter sitting below a non-row-preserving
    * node — Aggregate, Limit, Window, Deduplicate, … — must not be merged:
    * `Union(Agg(F[c='a']), Agg(F[c='b']))` evaluates the aggregate twice
    * (two output rows), while the merged `Agg(F[c IN ('a','b')])` evaluates
    * it once. Anything BELOW the matched filter is fine (the branches are
    * canonically identical there, and with disjoint predicates the bag union
    * of the filtered copies equals the IN-filter of one copy), but the path
    * from the branch root down TO the filter must preserve rows one-for-one. */
  private def findEq(branch: LogicalPlan)
      : Option[(Filter, AttributeReference, Literal)] = {
    def walk(p: LogicalPlan): Seq[(Filter, AttributeReference, Literal)] = p match {
      case f: Filter =>
        splitConjunctivePredicates(f.condition).collect {
          case EqualTo(a: AttributeReference, l: Literal) if l.value != null => (f, a, l)
          case EqualTo(l: Literal, a: AttributeReference) if l.value != null => (f, a, l)
        } ++ walk(f.child)
      case pr: Project       => walk(pr.child)
      case s: SubqueryAlias  => walk(s.child)
      case _                 => Seq.empty // stop: not row-preserving
    }
    val hits = walk(branch)
    if (hits.size == 1) Some(hits.head) else None
  }

  /** Branch with its eq literal replaced by a type-default sentinel — equal
    * canonicalized templates mean the branches differ only in that value. */
  private def template(branch: LogicalPlan, f: Filter, lit: Literal): LogicalPlan =
    branch.transform {
      case node if node eq f =>
        f.copy(condition = f.condition.transform {
          case l: Literal if l eq lit => Literal.default(lit.dataType)
        })
    }

  private def deterministic(p: LogicalPlan): Boolean =
    !p.exists(_.expressions.exists(e => e.exists(!_.deterministic)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u @ Union(children, false, false) if children.size > 1 &&
        children.forall(deterministic) =>
      val eqs = children.map(findEq)
      if (eqs.exists(_.isEmpty)) u
      else {
        val parts = children.zip(eqs.map(_.get))
        val (head, (f0, attr0, lit0)) = parts.head
        val headTemplate = template(head, f0, lit0).canonicalized
        val sameShape = parts.tail.forall { case (b, (f, _, l)) =>
          template(b, f, l).canonicalized == headTemplate
        }
        val lits = parts.map(_._2._3)
        val allDistinct = lits.map(_.value).distinct.size == lits.size
        val sameType = lits.map(_.dataType).distinct.size == 1
        if (!sameShape || !allDistinct || !sameType) u
        else {
          val merged = head.transform {
            case node if node eq f0 =>
              f0.copy(condition = f0.condition.transform {
                case EqualTo(a: AttributeReference, l: Literal) if l eq lit0 =>
                  In(a, lits)
                case EqualTo(l: Literal, a: AttributeReference) if l eq lit0 =>
                  In(a, lits)
              })
          }
          // re-expose the Union's output attribute ids to parent operators
          val projectList: Seq[NamedExpression] =
            u.output.zip(merged.output).map { case (uo, mo) =>
              Alias(mo, uo.name)(exprId = uo.exprId, qualifier = uo.qualifier,
                explicitMetadata = Some(uo.metadata))
            }
          Project(projectList, merged)
        }
      }
  }
}
