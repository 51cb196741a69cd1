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
}
