package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions so
  * graft's native Catalyst expressions (graft.plans) can be exposed as
  * `Column`s programmatically. Spark 4's unified Column API hides the
  * classic constructors; extension libraries conventionally bridge from
  * inside the sql package. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist` only clears CacheManager entries, and
    * the checkpointed RDD is reachable solely through the plan's
    * `LogicalRDD` scan — without this, every iteration of a loop that
    * checkpoints per round leaks one labels snapshot until session end.
    * No-op for plans that aren't checkpointed-RDD scans and for
    * reliable (file-based) checkpoints, whose RDD is not persisted. */
  def unpersistCheckpointed(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Delete the checkpoint FILES behind a reliably-checkpointed
    * Dataset (no-op for local checkpoints and non-checkpoint plans).
    * Spark never removes non-streaming reliable checkpoints until
    * session end (and then only with cleanCheckpoints=true), so an
    * intermediate snapshot that exists purely to split a timer — like
    * Components' raw edge materialization — would otherwise double
    * the checkpoint-store footprint per call on cluster deployments.
    * Only call this once nothing will read the Dataset again. */
  def removeCheckpointFiles(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical match {
      case lr: execution.LogicalRDD =>
        lr.rdd.getCheckpointFile.foreach { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration)
          try fs.delete(path, true)
          catch { case e: java.io.IOException =>
            System.err.println(
              s"[graft] checkpoint cleanup of $p failed: ${e.getMessage}")
          }
        }
      case _ => ()
    }

  /** Block until the async listener bus has dispatched every posted
    * event, or `timeoutMs` elapses. Returns true when the bus drained,
    * false on timeout. Bench uses this to attribute per-query stage
    * metrics exactly: a fixed post-query sleep silently discarded any
    * stage-completion event that arrived later than the sleep (the
    * round-16 ADVICE finding) — a deterministic drain makes late
    * events impossible rather than merely unlikely. The bus is
    * `private[spark]`, hence this bridge. */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMs: Long): Boolean =
    try {
      spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
      true
    } catch {
      case _: java.util.concurrent.TimeoutException => false
    }
}
