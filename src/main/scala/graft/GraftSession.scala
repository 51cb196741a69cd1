package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory — every entry point (Verify, Bench,
  * tests, ad-hoc mains) builds its session here so engine-critical
  * configs are set in exactly one place.
  *
  * Two parquet-timestamp configs cover every testdata drop of
  * `events.ts` (physical flavor has changed across regenerations):
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — legacy
  *    TIMESTAMP(NANOS) drops, which Spark 4 otherwise refuses to read
  *    (illegal-Parquet-type error); they arrive as LongType nanos,
  *    normalized by [[Tables.events]].
  *  - `spark.sql.parquet.inferTimestampNTZ.enabled=false` — current
  *    TIMESTAMP(MICROS, NTZ) drops read directly as µs TimestampType
  *    AT THE SCAN (micros-as-instant, identical values to an NTZ→LTZ
  *    cast under this session's pinned UTC timezone). Reading LTZ
  *    natively instead of casting after the scan keeps range
  *    predicates on `ts` pushable to the parquet source — a cast on
  *    the column would block pushdown, a full-scan-vs-pruned-scan
  *    difference at scale (`PlanAuditSpec` pins the pushdown).
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
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
