package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer guard against the one plan shape that cannot scale: a Window
  * operator with an EMPTY partition spec funnels every row of its input
  * through a single task (SURVEY.md §4; the q13 vs q13b story — BENCH
  * showed the banded reformulation computes the identical answer with a
  * keyed shuffle instead).
  *
  * The rule never rewrites — it lints. By default a matching plan logs one
  * warning naming the offending window; with
  * `spark.graft.failOnGlobalWindow=true` (the setting a production 100 TB
  * session should run with) planning fails fast with a message pointing at
  * the banded alternative, instead of shipping a job whose wall-clock is
  * one core's throughput.
  *
  * Installed two ways, matching how graft sessions are built:
  * [[graft.functions.GraftExtensions]] injects it for
  * `withExtensions`-built sessions, and
  * [[graft.functions.GraftFunctions.register]] adds it to an existing
  * session via `spark.experimental.extraOptimizations` (the public
  * escape hatch for externally-built sessions — the driver contract).
  */
class GlobalWindowGuard(spark: SparkSession) extends Rule[LogicalPlan]
    with Logging {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty =>
        val what = w.windowExpressions.map(_.name).mkString(", ")
        val msg =
          s"unpartitioned Window over [$what]: every input row is routed " +
            "through ONE task. Partition the window, or reformulate as a " +
            "banded self-join (see CoverageQueries.q13b) for a keyed shuffle."
        if (spark.conf.get("spark.graft.failOnGlobalWindow", "false") == "true")
          throw new IllegalStateException(s"graft global-window guard: $msg")
        else logWarning(s"graft global-window guard: $msg")
      case _ => ()
    }
    plan
  }
}
