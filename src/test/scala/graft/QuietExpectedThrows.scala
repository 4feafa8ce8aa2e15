package graft

/** Silences the Spark task-failure loggers around an EXPECTED throw
  * (r16 verdict item 6): the suite deliberately fails tasks in several
  * places — ChaosRetrySpec's injected attempt-0 failures, VerifySpec's
  * error-manifest queries, CacheHygieneSpec's exception-release pins —
  * and each one used to land a full `Executor: Exception in task` /
  * `TaskSetManager` stack (e.g. failedExecuteUserDefinedFunctionError)
  * in the suite log, burying real failures. The block raises ONLY the
  * task-failure reporters to OFF and restores them in a finally; the
  * assertion machinery (intercept / error-manifest contents) is
  * unaffected because it consumes the THROWN exception, not the log.
  *
  * Scoped and surgical by design: nothing outside the block changes,
  * and an UNEXPECTED failure inside a quiet block still fails its test
  * through the raised exception — only the duplicate stack print is
  * suppressed.
  */
object QuietExpectedThrows {

  /** The loggers that print task/stage failure stacks in local mode,
    * plus the codegen reporters (PqExprSpec deliberately compiles the
    * replaced 64-KB-blowing expression forest as its red baseline — the
    * janino failure stack and the fallback warning are the expected
    * event there, not news).
    */
  private val noisy = Seq(
    "org.apache.spark.executor.Executor",
    "org.apache.spark.scheduler.TaskSetManager",
    "org.apache.spark.scheduler.DAGScheduler",
    "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
    "org.apache.spark.sql.execution.WholeStageCodegenExec")

  def apply[A](body: => A): A = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val prev: Seq[(String, Level)] = noisy.map { n =>
      n -> LogManager.getLogger(n)
        .asInstanceOf[org.apache.logging.log4j.core.Logger].getLevel
    }
    noisy.foreach(n => Configurator.setLevel(n, Level.OFF))
    try body
    finally prev.foreach { case (n, l) => Configurator.setLevel(n, l) }
  }
}
