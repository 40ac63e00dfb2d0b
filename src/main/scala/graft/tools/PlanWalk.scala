package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan traversal that sees through AQE. With adaptive execution
  * on (the Spark 4 default), `executedPlan` is an [[AdaptiveSparkPlanExec]]
  * LEAF — `plan.collect` visits exactly one node and any "assert no
  * shuffle/window/cartesian in the plan" check passes vacuously. Every
  * plan assertion in this repo must walk through the wrapper (and through
  * materialized query stages) or it is checking nothing.
  */
object PlanWalk {

  /** Every node of the plan, descending through AdaptiveSparkPlanExec and
    * QueryStageExec boundaries (pre-order), AND into expression-held
    * subquery plans (scalar subqueries, DPP filters) — a shuffle or
    * single-partition window inside a SubqueryExec would otherwise hide
    * from every plan assertion, the same vacuous-walk failure mode this
    * object exists to prevent, one level down.
    */
  def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => a +: collectAll(a.executedPlan)
      case s: QueryStageExec => s +: collectAll(s.plan)
      case o => o +: o.children.flatMap(collectAll)
    }
    self ++ p.subqueries.flatMap(collectAll)
  }

  /** collect-style partial-function matching over the full walk. */
  def collectDeep[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    collectAll(p).collect(pf)
}
