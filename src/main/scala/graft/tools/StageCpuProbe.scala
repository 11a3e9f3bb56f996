package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage CPU/wall attribution probe (round-20, VERDICT item 8):
  * runs the named registered queries once under the Bench session
  * config and prints, for every completed stage, its task count,
  * summed executor run/CPU time, GC time and shuffle volumes — the
  * evidence needed to attribute a per-task fixed cost (a query whose
  * total CPU scales with the configured core count is paying per-task
  * setup, not doing more work).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=8|32 \
  *   sbt "runMain graft.tools.StageCpuProbe d40_gram_cap_report"
  */
object StageCpuProbe {
  def main(args: Array[String]): Unit = {
    graft.LocalCatalog.reset()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = {
      val root = java.nio.file.Paths.get(sfDir)
      val walk = java.nio.file.Files.walk(root)
      try walk.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally walk.close()
    }
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val initialParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      math.min(1024L, math.max(cpus.toLong, inputBytes * 8 / (64L << 20))).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initialParts)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AUTO_BROADCAST", "-1"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_ADAPTIVE_BROADCAST", "8m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null) stages.add(
          f"stage=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"run_ms=${m.executorRunTime}%7d cpu_ms=${m.executorCpuTime / 1000000}%7d " +
            f"gc_ms=${m.jvmGCTime}%6d deser_ms=${m.executorDeserializeTime}%6d " +
            f"shw_kb=${m.shuffleWriteMetrics.bytesWritten >> 10}%7d " +
            f"shr_kb=${m.shuffleReadMetrics.totalBytesRead >> 10}%7d  ${si.name}%.90s")
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect() // session warm-up
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      // one untimed warm run so codegen/JIT don't pollute attribution
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      org.apache.spark.sql.GraftColumnBridge.waitListenerBusEmpty(spark, 10000L)
      stages.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftColumnBridge.waitListenerBusEmpty(spark, 10000L)
      println(s"===== $name cpus=$cpus wall=$wall%s =====")
      stages.forEach(println)
    }
    spark.stop()
  }
}
