package graft.ops

import graft.SparkSpec

class SurrogateKeySpec extends SparkSpec {

  test("ordered: dense gap-free keys continuing from the warehouse max") {
    import spark.implicits._
    val df = Seq(("c", 3), ("a", 1), ("b", 2)).toDF("name", "n")
    val out = SurrogateKey.ordered(df, "sk", Seq("name"), 1000L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out == Map("a" -> 1001L, "b" -> 1002L, "c" -> 1003L))
  }

  test("scalable: dense gap-free key SET (order unspecified, like the reference's zipWithIndex)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, s"r$i")).toDF("i", "s").repartition(7)
    val keys = SurrogateKey.scalable(df, "sk", 5000L)
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(keys == (5001L to 5100L))
  }
}
