package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the global-window top-k anti-pattern — the
  * single-partition sort this repo's reviews keep hunting by hand
  * (q_vocab_topk, round-2 verdict #1), fixed once in the optimizer:
  *
  * {{{
  *   df.withColumn("rn", row_number().over(Window.orderBy(...)))
  *     .filter($"rn" <= k)
  * }}}
  *
  * plans as WindowExec with NO partition spec: every row of the child
  * funnels through one task to be ranked, then all but k are discarded.
  * This rule rewrites the child to `Sort + Limit k` — which the planner
  * executes as TakeOrderedAndProject, a distributed per-partition heap
  * merge — and leaves the Window to rank only the k survivors (bounded,
  * trivially single-partition).
  *
  * Soundness guards: the Window must carry EXACTLY ONE window expression
  * (another global aggregate's value would change under a restricted
  * input), that expression must be row_number() with an empty partition
  * spec and a non-empty order, and the filter must be `rn <= lit` /
  * `rn < lit` (possibly AND-ed with other predicates — the rest of the
  * conjunction is kept and evaluated after ranking, which is sound
  * because rows the original plan would keep all survive the top-k
  * restriction). With ties at the boundary the retained SET is one of
  * the valid top-k sets, exactly as nondeterministic as the original
  * plan's tie resolution. `k` is capped so a pathological filter cannot
  * turn into a giant limit.
  */
object GlobalRowNumberTopK extends Rule[LogicalPlan] {

  /** Largest k worth a TakeOrderedAndProject heap; beyond this the
    * original plan stands. */
  val MaxK = 100000

  private def rowNumberLimit(cond: Expression,
      rnAttr: Attribute): Option[Int] = {
    // the rn bound may sit anywhere in a conjunction
    val conjuncts = splitConjunctivePredicates(cond)
    conjuncts.collectFirst {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _))
        if a.semanticEquals(rnAttr) && k > 0 => k
      case LessThan(a: Attribute, Literal(k: Int, _))
        if a.semanticEquals(rnAttr) && k > 1 => k - 1
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute)
        if a.semanticEquals(rnAttr) && k > 0 => k
      case GreaterThan(Literal(k: Int, _), a: Attribute)
        if a.semanticEquals(rnAttr) && k > 1 => k - 1
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => other :: Nil
    }

  /** Already rewritten (or hand-written scale-safely): the window input
    * is a global Sort under a Limit. Guards idempotence — without it the
    * fixed-point optimizer would wrap a fresh Limit+Sort every pass. */
  private def alreadyLimited(p: LogicalPlan): Boolean = p match {
    case GlobalLimit(_, LocalLimit(_, Sort(_, true, _, _))) => true
    case Sort(_, true, GlobalLimit(_, _), _) => true
    case _ => false
  }

  /** The window's single row_number alias, when the node matches the
    * rewriteable shape. */
  private def globalRowNumber(w: Window): Option[Alias] = w match {
    case Window(Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(Nil, order, _)), _)), Nil, _, _, _)
        if order.nonEmpty && !alreadyLimited(w.child) => Some(a)
    case _ => None
  }

  private def rewrite(w: Window, k: Int): Window =
    w.copy(child = Limit(Literal(k),
      Sort(w.orderSpec, global = true, w.child)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      (for {
        a <- globalRowNumber(w)
        k <- rowNumberLimit(cond, a.toAttribute) if k <= MaxK
      } yield f.copy(child = rewrite(w, k))).getOrElse(f)
    case f @ Filter(cond, p @ Project(_, w: Window)) =>
      (for {
        a <- globalRowNumber(w)
        // the projection must still expose the rank attribute
        if p.projectList.exists(_.toAttribute.semanticEquals(a.toAttribute))
        k <- rowNumberLimit(cond, a.toAttribute) if k <= MaxK
      } yield f.copy(child = p.copy(child = rewrite(w, k)))).getOrElse(f)
  }
}

object GlobalRowNumberTopKRegistration {
  /** Idempotent registration on a live session (the extension path is
    * [[graft.GraftExtensions]]). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .contains(GlobalRowNumberTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GlobalRowNumberTopK
    }
}
