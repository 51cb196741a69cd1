package graft.queries

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, SparkEntry, Tables}

/** The library's SQL surface: every oracle string that is pure ANSI
  * runs UNCHANGED through `spark.sql` over registered views and must
  * reproduce the DataFrame-API result value-for-value — one engine,
  * two front ends, same answer.
  *
  * Dual purpose: (a) proves a user can drive every relational
  * operator through SQL alone (the reference's users write SQL-ish
  * PySpark; ours can submit the SQL text itself), and (b) guards the
  * oracle strings against drifting into DuckDB-only dialect — a
  * cross-engine oracle that only one engine can parse is a weaker
  * oracle. The excluded entries are exactly the ones whose DuckDB
  * text is legitimately dialect-specific: list/lambda functions
  * (`list_reduce`, `string_split`, `unnest`), `strftime`,
  * `quantile_cont`, two-argument `GROUPING`, fixture-parsing
  * `read_csv`, and DuckDB's regexp flag argument.
  */
class SqlParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Names verified ANSI-portable; additions to the registry that are
    * plain relational SQL belong here too.
    */
  private val AnsiPortable = Seq(
    "a10_incremental", "a11_outliers", "a1_max", "a2_groupby_agg",
    "a3_rollup", "a5_stats", "a9_histogram", "d1_distinct_map",
    "f1_pivot_filter", "f2_date_split", "j1_dim_join",
    "j2_multi_left_join", "j3_semi_anti", "j5_catalog_star",
    "m1_update_merge", "m2_full_upsert", "m3_lww_upsert",
    "m4_flag_reset", "m6_cdc_diff", "m7_evolve_upsert",
    "p10_fillna", "p13_profile",
    "p4_upper_cols", "p9_cast_round", "q1_agg", "q_reconcile",
    "s11_schema_merge", "s12_compact", "s13_orc_roundtrip",
    "s16_dyn_overwrite",
    "s3_scan_project", "s7_partitioned_write", "set1_except",
    "set2_union", "set3_union_by_name",
    "w1_surrogate_key", "w1_surrogate_key_scalable",
    "w2_running_sum", "w3_lag_delta", "w6_ntile", "x_approx_distinct",
    "x_dedup_exact", "x_funnel", "x_ks_drift", "x_sketch_merge")

  test("38+ oracle strings run unchanged on Spark SQL and match the DataFrame API") {
    Tables.registerAll(spark, dir)
    val failures = AnsiPortable.flatMap { name =>
      try {
        val api = SparkEntry.queries(name)(spark, dir)
        val cols = api.columns.sorted.map(col(_))
        val a = api.select(cols: _*).collect()
        // `AS MATERIALIZED` is DuckDB's CTE evaluation barrier (added
        // r9 so the iterative oracle chains don't re-inline
        // exponentially); it is a vendor hint, not semantics, and
        // Spark's parser has no equivalent — strip it for the parity
        // run, which tests the RELATIONAL text
        val ansi = SparkEntry.oracleSql(name).replace(" AS MATERIALIZED (", " AS (")
        val b = spark.sql(ansi).select(cols: _*).collect()
        if (a.length != b.length)
          Some(s"$name: row count ${a.length} (api) vs ${b.length} (sql)")
        else
          a.zip(b).zipWithIndex.collectFirst { case ((x, y), i) if x != y =>
            s"$name: row $i differs: api=$x sql=$y"
          }
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
