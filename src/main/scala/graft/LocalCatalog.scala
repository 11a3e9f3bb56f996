package graft

/** Local-mode catalog hygiene for the benchmark/verify mains.
  *
  * The embedded Derby metastore never shrinks: repeated DDL (the
  * pair-index generation churn of d28-d32, times runs, times rounds)
  * bloats `metastore_db` until EVERY catalog operation takes seconds —
  * measured in round 12 as the same materialize costing 13.3 s against
  * a bloated metastore vs 4.2 s clean, inflating a full-suite bench
  * ~2× including queries that touch no catalog table at all. A real
  * cluster runs a served metastore where this is a DBA concern; in
  * local mode the correct lifecycle is: the warehouse and metastore
  * are SCRATCH, recreated per measurement session.
  *
  * `reset()` deletes `./metastore_db` and `./spark-warehouse` (cwd —
  * where local-mode Derby and the default warehouse land) BEFORE the
  * SparkSession exists. Opt out with SPARK_GRAFT_KEEP_WAREHOUSE=1 when
  * a run must consume tables a previous JVM materialized (the
  * cross-JVM persisted-index pin does). */
object LocalCatalog {
  def reset(): Unit = {
    if (sys.env.get("SPARK_GRAFT_KEEP_WAREHOUSE").contains("1")) return
    for (name <- Seq("metastore_db", "spark-warehouse")) {
      val root = java.nio.file.Paths.get(name)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    }
  }
}
