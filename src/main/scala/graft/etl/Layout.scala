package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout operators for the 100 TB regime (SURVEY.md §4.3): the
  * reference's secondary indexes (schema.sql:44-45) map to physical
  * layout in a lakehouse — partition pruning and bucketed co-location,
  * not B-trees.
  *
  * Bucketing both sides of a recurring equi-join on the join key (same
  * bucket count) removes the shuffle from every subsequent join: the
  * scan's output partitioning already satisfies the join's requirement,
  * so Catalyst plans a SortMergeJoin with NO Exchange. That turns the
  * fact⋈fact join from the cluster-wide bottleneck into a per-bucket
  * local merge. Verified by LayoutSpec, which asserts the joined plan
  * contains no shuffle.
  */
object Layout {

  /** Write a table bucketed+sorted by the join key into the session
    * warehouse (saveAsTable — bucket metadata lives in the catalog).
    *
    * Re-runnable across JVMs: SaveMode.Overwrite only replaces a table
    * the CURRENT session's catalog knows about — a fresh session with a
    * leftover warehouse directory from a previous run fails with
    * LOCATION_ALREADY_EXISTS — so stale catalog entries are dropped and
    * an orphaned managed location is cleared first. */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = java.nio.file.Paths.get(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
        .getPath, table.toLowerCase)
    if (java.nio.file.Files.exists(loc)) {
      val walk = java.nio.file.Files.walk(loc)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Write partitioned by a low-cardinality column (e.g. release_year)
    * for static/dynamic partition pruning on point and range filters. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True iff a filter on the partition column pruned the file listing
    * (PartitionFilters in the scan node) — used by LayoutSpec to prove
    * the pruning, and handy as a planning diagnostic. */
  def partitionFilterCount(df: DataFrame): Int =
    "PartitionFilters: \\[[^\\]]".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
}
