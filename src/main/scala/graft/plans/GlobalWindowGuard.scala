package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

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
      // The per-node tag dedupes across everything that would otherwise
      // repeat the warning for one query: fixed-point batch iterations,
      // and the double-instance case where a session built with
      // GraftExtensions also calls register() before its first query (the
      // injected builder — which sets GuardInstalledKey — only runs at
      // first optimizer execution, so register()'s flag check cannot see
      // it yet and appends a second guard; ADVICE r4). Rule application
      // copies tags onto rewritten nodes, so the marker survives batches.
      case w: Window
          if w.partitionSpec.isEmpty &&
            !GlobalWindowGuard.limitBounded(w.child) &&
            w.getTagValue(GlobalWindowGuard.Warned).isEmpty =>
        val what = w.windowExpressions.map(_.name).mkString(", ")
        val msg =
          s"unpartitioned Window over [$what]: every input row is routed " +
            "through ONE task. Partition the window, or reformulate as a " +
            "banded self-join (see CoverageQueries.q13b) for a keyed shuffle."
        // Fail-fast BEFORE tagging (ADVICE r5): optimizedPlan is a lazy val
        // whose failed init re-runs on the next action, so a tag set ahead
        // of the throw would make the SECOND execution of the same Dataset
        // sail past the guard and run the single-task plan it exists to
        // block. Only the warn branch may tag (its job is log dedup).
        if (spark.conf.get("spark.graft.failOnGlobalWindow", "false") == "true")
          throw new IllegalStateException(s"graft global-window guard: $msg")
        w.setTagValue(GlobalWindowGuard.Warned, true)
        logWarning(s"graft global-window guard: $msg")
      case _ => ()
    }
    plan
  }
}

object GlobalWindowGuard {
  /** Marks a Window node already reported by some guard instance. */
  private[plans] val Warned = TreeNodeTag[Boolean]("graft.globalWindowGuard.warned")

  /** SOUND exemption (VERDICT r13 #8, the [list_id] audit firings): an
    * unpartitioned window whose input flows through a GLOBAL limit down
    * an all-UNARY chain is bounded by construction — at most `limit`
    * rows TOTAL reach the single task, model-sized, the right plan. A
    * bare LocalLimit is NOT proof (ADVICE r14): it caps rows per
    * partition only, so numPartitions×limit rows could still feed the
    * window. The walk stops at any multi-child node (a join below could
    * re-inflate a limited side) and at leaves, so every genuinely
    * full-input global window still warns.
    */
  private[plans] def limitBounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit => true
    case u: UnaryNode => limitBounded(u.child)
    case _ => false
  }
}
