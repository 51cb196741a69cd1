package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with ZERO exchanges (shuffle paid at write time)") {
    import spark.implicits._
    val orders = (0 until 1000).map(i => (i.toLong, i % 50, s"o$i")).toDF("o_id", "o_flag", "o_tag")
    val items = (0 until 3000).map(i => (i.toLong % 1000, i * 1.5)).toDF("i_oid", "amount")

    RawZone.writeBucketed(orders, "b_orders", Seq("o_id"), 8)
    RawZone.writeBucketed(items, "b_items", Seq("i_oid"), 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_items"), col("o_id") === col("i_oid"))
        .groupBy("o_id").agg(sum("amount").as("total"))
      val plan = joined.queryExecution.executedPlan.toString
      // same-bucket-count join: SortMergeJoin reads both sides' buckets
      // directly — no Exchange anywhere in the plan
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
      val r = joined.filter(col("o_id") === 1L).collect().head
      assert(r.getAs[Double]("total") == (1.5 * 1 + 1.5 * 1001 + 1.5 * 2001))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
