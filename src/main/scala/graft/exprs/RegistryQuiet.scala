package graft.exprs

/** Scoped silencer for SimpleFunctionRegistry's "replaced a previously
  * registered function" WARN: cloned sessions (newSession per
  * dashboard/task/download run) INHERIT the parent's registry entries,
  * so every re-registration of our own functions — the 48 shaper types,
  * cosine_sim, shingles3, len — logs a warning about a deliberate,
  * idempotent override. Quieting only around our registration calls
  * (instead of pinning the logger to ERROR process-wide) keeps the
  * warning live for any OTHER createOrReplaceTempFunction in the JVM.
  *
  * The restore pins the prior EFFECTIVE level as an explicit one —
  * behaviorally identical unless the root level changes at runtime,
  * which Spark doesn't do. Registration happens once per session
  * (call sites guard with per-session memos), so the global lock and
  * two Configurator calls are off the per-row hot path.
  */
object RegistryQuiet {
  private val loggerName =
    classOf[org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry].getName

  def quietly[T](f: => T): T = synchronized {
    val prev = org.apache.logging.log4j.LogManager.getLogger(loggerName).getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      loggerName, org.apache.logging.log4j.Level.ERROR)
    try f
    finally org.apache.logging.log4j.core.config.Configurator.setLevel(loggerName, prev)
  }
}
