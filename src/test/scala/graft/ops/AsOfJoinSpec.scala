package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("asOfLeft: latest right row at-or-before each left ts, per key") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val quotes = Seq( // (key, ts, price) — unique on (key, ts)
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 11.0),
      (2L, ts("2024-01-01 10:00:00"), 20.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (100L, 1L, ts("2024-01-01 08:59:59")), // before any quote -> NULL
      (101L, 1L, ts("2024-01-01 09:00:00")), // exact tie -> matches 10.0
      (102L, 1L, ts("2024-01-01 11:59:00")), // between -> 10.0
      (103L, 1L, ts("2024-01-01 23:00:00")), // after last -> 11.0
      (104L, 2L, ts("2024-01-01 10:30:00")), // -> 20.0
      (105L, 3L, ts("2024-01-01 10:00:00"))) // key with no quotes -> NULL
      .toDF("trade_id", "key", "ts")

    val out = AsOfJoin.asOfLeft(trades, quotes, "key", "q_key", "ts", "q_ts", Seq("price"))
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        (if (r.isNullAt(r.fieldIndex("price"))) None else Some(r.getAs[Double]("price"))))
      .toMap
    assert(out == Map(
      100L -> None, 101L -> Some(10.0), 102L -> Some(10.0),
      103L -> Some(11.0), 104L -> Some(20.0), 105L -> None))
  }

  test("asOfLeftNative (custom LogicalPlan/Strategy/Exec) matches the window composition") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 11.0),
      (2L, ts("2024-01-01 10:00:00"), 20.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (100L, 1L, ts("2024-01-01 08:59:59")),
      (101L, 1L, ts("2024-01-01 09:00:00")),
      (102L, 1L, ts("2024-01-01 11:59:00")),
      (103L, 1L, ts("2024-01-01 23:00:00")),
      (104L, 2L, ts("2024-01-01 10:30:00")),
      (105L, 3L, ts("2024-01-01 10:00:00")))
      .toDF("trade_id", "key", "ts")

    val native = AsOfJoin.asOfLeftNative(trades, quotes, "key", "q_key", "ts", "q_ts", Seq("price"))
    // the custom exec is actually in the plan (node name renders
    // without the Exec suffix), fed by auto-inserted Exchange + Sort
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin "))
    val n = native.collect().map(r => (r.getLong(0), Option(r.get(3)))).toSet
    val w = AsOfJoin.asOfLeft(trades, quotes, "key", "q_key", "ts", "q_ts", Seq("price"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toSet
    assert(n == w)

    // randomized agreement: 500 left rows, 200 right rows, 20 keys
    val rng = new scala.util.Random(13)
    val rQuotes = Seq.tabulate(200) { i =>
      (rng.nextInt(20).toLong, new Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L), i * 1.0)
    }.distinct.toDF("q_key", "q_ts", "price")
      .groupBy("q_key", "q_ts").agg(org.apache.spark.sql.functions.max("price").as("price"))
    val rTrades = Seq.tabulate(500) { i =>
      (i.toLong, rng.nextInt(25).toLong, new Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L))
    }.toDF("trade_id", "key", "ts")
    val rn = AsOfJoin.asOfLeftNative(rTrades, rQuotes, "key", "q_key", "ts", "q_ts", Seq("price"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toSet
    val rw = AsOfJoin.asOfLeft(rTrades, rQuotes, "key", "q_key", "ts", "q_ts", Seq("price"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toSet
    assert(rn == rw)
  }

  test("asOfLeftNative: NULL keys and timestamps never match but left rows still emit") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // exercises the primitive fast path's null branches (long-backed
    // key/ts): NULLS sort FIRST per the required ordering, so null
    // right rows arrive at each partition's head and must be consumed
    // without ever matching; null left rows must emit NULL payload
    val quotes = Seq[(Option[Long], Option[Timestamp], Double)](
      (Some(1L), Some(ts("2024-01-01 09:00:00")), 10.0),
      (None,     Some(ts("2024-01-01 08:00:00")), 66.0), // null key: never matches
      (Some(1L), None,                            77.0)) // null ts: never matches
      .toDF("q_key", "q_ts", "price")
    val trades = Seq[(Long, Option[Long], Option[Timestamp])](
      (100L, Some(1L), Some(ts("2024-01-01 10:00:00"))), // -> 10.0
      (101L, None,     Some(ts("2024-01-01 10:00:00"))), // null key -> NULL
      (102L, Some(1L), None),                            // null ts -> NULL
      (103L, Some(2L), Some(ts("2024-01-01 10:00:00")))) // no quotes -> NULL
      .toDF("trade_id", "key", "ts")
    val out = AsOfJoin.asOfLeftNative(trades, quotes, "key", "q_key", "ts", "q_ts", Seq("price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("price")))).toMap
    assert(out == Map(
      100L -> Some(10.0), 101L -> None, 102L -> None, 103L -> None))
  }

  test("asOfLeftNative with STRING keys matches the window composition") {
    import spark.implicits._
    // String (buffer-backed) keys through the merge. The remembered
    // match key is defensively copied (InternalRow.copyValue) because
    // the sort SPILL reader reuses its byte buffer across next() calls
    // — a spill can't be forced from a shared-session unit test (the
    // force-spill threshold is a SparkContext conf), so this asserts
    // string-key parity on the in-memory path and the copy guards the
    // spill path at scale.
    val rng = new scala.util.Random(7)
    val rQuotes = Seq.tabulate(300) { i =>
      (s"user_${rng.nextInt(40)}", new Timestamp(1700000000000L + rng.nextInt(500000) * 1000L), i * 1.0)
    }.toDF("q_key", "q_ts", "price")
      .groupBy("q_key", "q_ts").agg(org.apache.spark.sql.functions.max("price").as("price"))
    val rTrades = Seq.tabulate(600) { i =>
      (i.toLong, s"user_${rng.nextInt(50)}", new Timestamp(1700000000000L + rng.nextInt(500000) * 1000L))
    }.toDF("trade_id", "key", "ts")
    val n = AsOfJoin.asOfLeftNative(rTrades, rQuotes, "key", "q_key", "ts", "q_ts", Seq("price"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toSet
    val w = AsOfJoin.asOfLeft(rTrades, rQuotes, "key", "q_key", "ts", "q_ts", Seq("price"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toSet
    assert(n == w)
  }
}
