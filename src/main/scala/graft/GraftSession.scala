package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory — every entry point (Verify, Bench,
  * tests, ad-hoc mains) builds its session here so engine-critical
  * configs are set in exactly one place.
  *
  * Notably `spark.sql.legacy.parquet.nanosAsLong`: the testdata
  * `events.ts` column is TIMESTAMP(NANOS) parquet, which Spark 4 only
  * reads with this flag (it then arrives as LongType nanos, normalized
  * by [[Tables.events]]). A session built elsewhere would fail at scan
  * time with an illegal-Parquet-type error.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting,
  * broadcast downgrade), shuffle partitions = local cores (on a real
  * cluster this would be cores×2-3 or AQE-coalesced from a high
  * initial count).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions) // native fns (vector_dot)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // bucketed-table (saveAsTable) metadata goes to a per-process
      // temp warehouse — never the working directory, and never shared
      // across concurrent JVMs (same-name tables would race)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")

  /** Standard session for mains: core count from SPARK_GRAFT_CPUS. */
  def create(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
