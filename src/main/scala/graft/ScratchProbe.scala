package graft

import org.apache.spark.sql.SparkSession

// throwaway probe: can an explicit LongType schema read TIMESTAMP(NANOS)
// parquet without the session-wide legacy conf?
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.read
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet("/root/testdata/sf0.001/events.parquet")
      df.show(3)
      println("EXPLICIT_SCHEMA_OK")
    } catch {
      case e: Throwable => println(s"EXPLICIT_SCHEMA_FAIL: ${e.getClass.getName}: ${e.getMessage.take(300)}")
    }
    spark.stop()
  }
}
