package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic driver for the pair-index ADVANCE path — not part of the
  * library surface. Materializes an 80% corpus index, advances it with
  * the other 20%, and attributes cost two ways: driver-side phase
  * wall/CPU (with `SPARK_GRAFT_ADV_DEBUG=1` the operator's internal
  * phases also print), and per-stage executor CPU keyed by job
  * description (AQE's thread-local capture propagates descriptions to
  * its async stage-materialization jobs, so this catches work plain
  * stack-frame attribution misses). Used in round 12 to find the
  * repeated-subtree evaluations and the CacheManager refresh storm on
  * in-place appends; keep it for future advance-path regressions. */
object AdvDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val stageDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        val d = Option(ss.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("<none>")
        stageDesc.put(ss.stageInfo.stageId, d)
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val key = (stageDesc.getOrDefault(info.stageId, "<none>") +
          " | " + info.name).take(160)
        stageCpu.merge(key, info.taskMetrics.executorCpuTime / 1000000L,
          (a: Long, b: Long) => a + b)
      }
    })
    val osb = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def phase[T](name: String)(f: => T): T = {
      val w0 = System.nanoTime(); val c0 = osb.getProcessCpuTime
      val r = f
      val w = (System.nanoTime() - w0) / 1e9
      val c = (osb.getProcessCpuTime - c0) / 1e9
      println(f"PHASE $name%-28s wall=$w%8.2f cpu=$c%8.2f")
      r
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val idx = phase("materialize_corpus") {
      graft.operators.PairIndex.materializeDocIndex(corpus, "doc_id", "text",
        keepPostings = true)
    }
    val r = phase("advance_total") {
      graft.operators.PairIndex.advanceDocIndex(spark, idx, batch, "doc_id", "text")
    }
    println(s"appended=${r.appended} new=${r.newDocs} evicted=${r.evicted} affected=${r.affectedOld}")
    phase("drop") {
      graft.operators.PairIndex.dropSuperseded(spark, idx, r.idx)
      graft.operators.PairIndex.dropDocIndex(spark, r.idx)
    }
    import scala.jdk.CollectionConverters._
    stageCpu.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (n, ms) =>
      println(f"STAGECPU ${ms / 1000.0}%8.2f s  $n")
    }
    spark.stop()
  }
}
