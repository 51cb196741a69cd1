package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain join's rows under heavy key skew") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (0 until 2000)
      .map(i => (i.toLong, if (i % 10 == 0) i.toLong % 7 else 42L, i * 1.0))
      .toDF("row_id", "k", "v")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"))
      .toDF("dk", "name")

    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select("row_id", "name").collect().toSet
    val salted = SkewJoin.saltedJoin(fact, dim,
        (b, s) => b("k") === s("dk"), spreadCols = Seq("row_id"), salt = 8)
      .select("row_id", "name").collect().toSet
    assert(salted == plain)
    assert(salted.size == plain.size)
  }

  test("saltedJoin left_outer keeps unmatched big-side rows once") {
    import spark.implicits._
    val fact = Seq((1L, 10L), (2L, 99L)).toDF("row_id", "k")
    val dim = Seq((10L, "x")).toDF("dk", "name")
    val out = SkewJoin.saltedJoin(fact, dim,
        (b, s) => b("k") === s("dk"), Seq("row_id"), salt = 4, joinType = "left_outer")
      .select("row_id", "name").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("x"), 2L -> None))
  }
}
