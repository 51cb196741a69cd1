package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md §A). Parquet carries its own schema, so no inferSchema
  * step is needed — unlike the reference's all-string CSV raw zone
  * (reference `main.py:75-79`), which `pipeline.CovidPipeline` models.
  *
  * Every reader is a plain parquet scan: column pruning and predicate
  * pushdown happen in Catalyst when callers `.select`/`.filter`, so a
  * 2-column projection reads 2 columns off disk (`PushedFilters` /
  * `ReadSchema` in `.explain`). At cluster scale the same call reads a
  * directory of many files in parallel; nothing here assumes a single
  * file.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** `events.ts` arrives in whatever physical timestamp flavor the
    * generator last wrote — TIMESTAMP(NANOS) in early testdata drops
    * (read as LongType nanos under `spark.sql.legacy.parquet
    * .nanosAsLong=true`, set centrally by [[GraftSession]]),
    * TIMESTAMP(MICROS, NTZ) in current drops (read DIRECTLY as µs
    * TimestampType at the scan under `spark.sql.parquet
    * .inferTimestampNTZ.enabled=false`, also set by [[GraftSession]]).
    * Downstream operators see one plain timestamp column
    * (FIXTURES.md timestamp caution).
    *
    * In the normal GraftSession path the NTZ case never reaches this
    * match — the scan itself yields TimestampType, which is what keeps
    * range predicates on `ts` pushable to parquet (a post-scan cast
    * would block pushdown; `PlanAuditSpec` pins `PushedFilters` on
    * this table). The TimestampNTZType branch below is a fallback for
    * sessions built elsewhere, and it is only value-correct when the
    * session timezone is UTC (the cast reinterprets the naive datetime
    * in the session zone) — so it asserts UTC rather than silently
    * shifting every instant.
    *
    * The ns→µs conversion uses *integral* division (`div`): `/` would
    * be double division, and nanosecond epochs (~1.7e18) exceed
    * double's 53-bit exact range, giving ±1 µs errors.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ and session timezone is '$tz': the NTZ->LTZ cast would " +
            "shift every instant. Build the session via graft.GraftSession (pins UTC and reads " +
            "NTZ natively as TimestampType via spark.sql.parquet.inferTimestampNTZ.enabled=false).")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts: expected LongType (nanosAsLong), TimestampNTZType or TimestampType, got $other — " +
          "was the session built via graft.GraftSession?")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Register every table as a temp view under its own name — the
    * one-call entry point for driving the library through `spark.sql`
    * alone (the parity suite proves the ANSI oracle corpus runs
    * unchanged that way). Views are lazy: registration costs one
    * footer read per table, and each SQL query still prunes and
    * pushes down through the same parquet scans as the DataFrame API.
    * `events` registers with the normalized µs `ts`.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => read(spark, dir, t).createOrReplaceTempView(t))
    events(spark, dir).createOrReplaceTempView("events")
  }
}
