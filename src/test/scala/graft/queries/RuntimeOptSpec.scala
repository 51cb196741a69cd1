package graft.queries

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime-optimizer guards: the two adaptive mechanisms the 100 TB
  * posture leans on — AQE shuffle-partition coalescing (small
  * intermediate results don't fan into thousands of empty reducers)
  * and the runtime bloom-filter join filter (a selective dimension
  * filter is pushed into the fact scan as a bloom probe, cutting
  * shuffle volume before the join) — asserted ACTIVE in this
  * session's executed plans, not just set in config.
  */
class RuntimeOptSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE final plan exists only after execution
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE coalesces a tiny aggregation's shuffle partitions at runtime") {
    val df = graft.Tables.nation(spark, dir)
      .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
    val p = finalPlan(df)
    assert(p.contains("AQEShuffleRead") && p.contains("coalesced"), p)
  }

  test("runtime bloom filter: selective dim filter probes the fact side before the shuffle") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    // testdata is MBs, production thresholds are GBs: lower the app-side
    // floor so the mechanism fires at test scale; disable broadcast so
    // the join actually shuffles (bloom injection targets shuffle joins)
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val lineitem = graft.Tables.lineitem(spark, dir)
      val sel = graft.Tables.part(spark, dir).filter(col("p_size") === 1)
      val joined = lineitem.join(sel, col("l_partkey") === col("p_partkey"))
        .groupBy("p_size").agg(count(lit(1)).as("n"))
      val p = finalPlan(joined)
      assert(p.toLowerCase.contains("bloomfilter"), p)
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
