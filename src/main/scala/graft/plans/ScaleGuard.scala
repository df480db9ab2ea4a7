package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Fail-fast governance rule for the classic silent scale-killer: a
  * window with an EMPTY partition spec moves every row to one reducer,
  * and Spark only warns at runtime — on a 1000-executor cluster that
  * warning is a wedged stage hours into the job. With
  * `spark.graft.failOnGlobalWindow=true` the plan is rejected at
  * optimization time instead, pointing at the offending window.
  *
  * Off by default: the faithful voting-schema layer reproduces the
  * reference's own global-window SQL shapes deliberately, and a
  * domain-bounded post-aggregate frame can be a legitimate single
  * reducer (use `operators/Ranking.boundedRowNumber` to say so
  * explicitly — it plans a repartition, not a window, and passes this
  * guard). Intended use: enabled in CI and on scheduled 100 TB jobs so
  * an accidental `Window.orderBy(...)` never ships.
  */
case class NoGlobalWindowGuard(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.getOption(ScaleGuard.FailOnGlobalWindow).contains("true")) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          throw new SparkException(
            s"[graft] unpartitioned window would collapse to a single partition " +
              s"(set ${ScaleGuard.FailOnGlobalWindow}=false to allow, or rank " +
              s"through graft.operators.Ranking): ${w.windowExpressions.mkString(", ")}")
        case _ => ()
      }
    }
    plan
  }
}

object ScaleGuard {
  val FailOnGlobalWindow = "spark.graft.failOnGlobalWindow"

  /** Install into a live session (idempotent). `withExtensions` can
    * inject the same rule at construction; `extraOptimizations` is the
    * supported hook for an already-built session.
    */
  def install(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[NoGlobalWindowGuard])
    if (!already) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NoGlobalWindowGuard(spark)
    }
  }
}
