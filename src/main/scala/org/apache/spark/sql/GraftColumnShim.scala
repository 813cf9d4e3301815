package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters so graft can
  * construct Columns over its native Catalyst expressions (the public
  * Column constructor took an Expression before Spark 4's ColumnNode
  * split; this is the supported classic-module path).
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Flush pending listener-bus events (spec hook: zero-Spark-job
    * assertions must not race async event delivery). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Apply a SparkSessionExtensions' injected functions to a registry
    * (test hook: lets specs prove config-style wiring without cycling a
    * SparkContext, which would kill the suite-shared session). */
  def registerExtensionFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  /** A SIBLING session on the same SparkContext/SharedState with the
    * given extensions applied — what `spark.sql.extensions` does at
    * bootstrap, reachable mid-JVM (the config route only applies at the
    * FIRST session build, so a suite-shared context can't exercise it).
    * Same mechanism as `SparkSession.cloneSession`, with fresh
    * SessionState built from the extensions. */
  def sessionWithExtensions(
      base: SparkSession,
      configure: SparkSessionExtensions => Unit): SparkSession = {
    // the clear/build/restore window mutates JVM-global session slots;
    // serialize it so a concurrent builder can't latch onto the
    // temporary sibling (or find the slots empty)
    val built = sessionBuildLock.synchronized {
      val active = SparkSession.getActiveSession
      val default = SparkSession.getDefaultSession
      // with no registered session, getOrCreate builds a NEW one (reusing
      // the live SparkContext) and applies withExtensions; restore the
      // registrations after so the suite-shared session stays the default
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try
        SparkSession.builder()
          .master(base.sparkContext.master)
          .withExtensions(configure)
          .getOrCreate()
      finally {
        default.foreach(SparkSession.setDefaultSession)
        active.foreach(SparkSession.setActiveSession)
      }
    }
    // the sibling starts from fresh SessionState: carry over the base
    // session's modified runtime SQL confs (timezone, ANSI mode, shuffle
    // partitions, …) so serving queries see the node's configuration
    base.conf.getAll.foreach { case (k, v) =>
      if (built.conf.getOption(k) != Some(v) && built.conf.isModifiable(k))
        try built.conf.set(k, v) catch { case _: Exception => () }
    }
    built
  }

  private[this] val sessionBuildLock = new Object

  /** Analyze + wrap a logical plan as a DataFrame on `session` — the
    * private[sql] `Dataset.ofRows` bridge. Used by the SQL DML commands
    * to analyze their captured source/query subplans at RUN time (so
    * catalog tables inside them resolve through the injected rules). */
  def ofRows(session: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** Re-tag a batch frame as streaming (isStreaming=true) — what a v1
    * `Source.getBatch` must hand back to MicroBatchExecution. The same
    * internalCreateDataFrame path Spark's own FileStreamSource takes;
    * the RDD stays lazy, so no work runs at tag time. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
