package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-STAGE spill/shuffle attribution for one registered query — the
  * drill-down behind Bench's per-query stage totals (round-16, VERDICT
  * item 1: "profile spill before touching the operators"). Runs the
  * query once on SPARK_GRAFT_SF_DIR under the bench session config and
  * prints one line per completed stage: task count, shuffle read/write,
  * disk/memory spill, and the first line of the stage's callsite — so
  * a super-linear decade growth can be pinned to the exact exchange or
  * sort that pays it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.StageProfile <query>
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    graft.LocalCatalog.reset()
    val query = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: StageProfile <queryName>"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val initialParts = sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", shuffleParts)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initialParts)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AUTO_BROADCAST", "-1"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_ADAPTIVE_BROADCAST", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null) {
          val site = si.details.linesIterator.toSeq.headOption.getOrElse("")
          val secs = (for (a <- si.submissionTime; b <- si.completionTime)
            yield (b - a) / 1e3).getOrElse(-1.0)
          rows.add(f"STAGE ${si.stageId}%4d wall=$secs%7.1f s tasks=${si.numTasks}%5d " +
            f"shr=${m.shuffleReadMetrics.totalBytesRead >> 20}%7d MB " +
            f"shw=${m.shuffleWriteMetrics.bytesWritten >> 20}%7d MB " +
            f"spillD=${m.diskBytesSpilled >> 20}%7d MB " +
            f"spillM=${m.memoryBytesSpilled >> 20}%7d MB  " +
            f"rows=${m.shuffleWriteMetrics.recordsWritten}%12d  ${si.name} @ $site")
        }
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(query)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // drain the async listener bus
    rows.forEach(println)
    println(f"TOTAL wall=$wall%.2f s query=$query sf=$sfDir " +
      s"parts=$shuffleParts initial=$initialParts")
    spark.stop()
  }
}
