package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property-style randomized checks for the merge family (SURVEY §5.2):
  * seeded trials over random tables, algebraic laws asserted per trial.
  */
class UpsertPropertySpec extends SparkSpec {

  private def randomTable(seed: Int, nKeys: Int, rows: Int): DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    // unique keys (merge precondition); random payloads incl. nulls
    rng.shuffle((0 until nKeys).toList).take(rows)
      .map { k =>
        (k.toLong,
          if (rng.nextInt(5) == 0) null else rng.alphanumeric.take(4).mkString,
          rng.nextInt(1000).toDouble,
          rng.nextInt(100).toLong)
      }.toDF("k", "s", "v", "ver")
  }

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("fullUpsert: idempotent, and disjoint keys degrade to union (10 seeded trials)") {
    for (seed <- 1 to 10) {
      val target = randomTable(seed, nKeys = 40, rows = 25)
      val updates = randomTable(seed + 100, nKeys = 40, rows = 20)
      val once = Upsert.fullUpsert(target, updates, Seq("k"))
      val twice = Upsert.fullUpsert(once, updates, Seq("k"))
      assert(sameRows(once, twice), s"not idempotent at seed=$seed")

      val disjoint = randomTable(seed + 200, nKeys = 40, rows = 15)
        .withColumn("k", col("k") + 1000L)
      assert(sameRows(
        Upsert.fullUpsert(target, disjoint, Seq("k")),
        target.unionByName(disjoint)), s"disjoint != union at seed=$seed")
    }
  }

  test("lwwUpsert: winner per key has max version with staging on ties (10 seeded trials)") {
    import spark.implicits._
    for (seed <- 11 to 20) {
      val target = randomTable(seed, nKeys = 30, rows = 20).withColumn("src", lit("t"))
      val staging = randomTable(seed + 50, nKeys = 30, rows = 20).withColumn("src", lit("s"))
      val merged = Upsert.lwwUpsert(target, staging, Seq("k"), Some("ver"))

      // one row per key; key set = union of key sets
      val keys = merged.select("k").as[Long].collect().sorted
      assert(keys.distinct.length == keys.length)
      val expectKeys = (target.select("k").as[Long].collect() ++
        staging.select("k").as[Long].collect()).distinct.sorted
      assert(keys.toSeq == expectKeys.toSeq)

      // per key: version == max(version); tie -> staging row
      val t = target.collect().map(r => r.getLong(0) -> (r.getLong(3), "t")).toMap
      val s = staging.collect().map(r => r.getLong(0) -> (r.getLong(3), "s")).toMap
      merged.collect().foreach { r =>
        val (k, ver, src) = (r.getLong(0), r.getLong(3), r.getString(4))
        val expected = (t.get(k), s.get(k)) match {
          case (Some((tv, _)), Some((sv, _))) =>
            if (sv >= tv) (sv, "s") else (tv, "t")
          case (Some(x), None) => x
          case (None, Some(x)) => x
          case _ => fail(s"key $k from nowhere")
        }
        assert((ver, src) == expected, s"key=$k seed=$seed: got ($ver,$src), want $expected")
      }
    }
  }

  test("evolveUpsert: same-schema updates degrade to fullUpsert exactly (10 seeded trials)") {
    for (seed <- 31 to 40) {
      val target = randomTable(seed, nKeys = 40, rows = 25)
      val updates = randomTable(seed + 123, nKeys = 40, rows = 20)
      // no evolution -> every column is source-present, so the evolving
      // merge must coincide with the plain full upsert rewriting all
      // non-key columns
      assert(sameRows(
        Upsert.evolveUpsert(target, updates, Seq("k")),
        Upsert.fullUpsert(target, updates, Seq("k"))), s"seed=$seed")
    }
  }

  test("updateMerge: target cardinality preserved; unmatched rows untouched (10 seeded trials)") {
    for (seed <- 21 to 30) {
      val target = randomTable(seed, nKeys = 40, rows = 30)
      val updates = randomTable(seed + 77, nKeys = 60, rows = 20)
        .select(col("k").as("uk"), col("s").as("us"))
      val merged = Upsert.updateMerge(target, updates,
        Seq("k" -> "uk"), Map("s" -> "us"))
      assert(merged.count() == target.count())
      // rows whose key is absent from updates are byte-identical
      val updatedKeys = updates.select(col("uk")).collect().map(_.getLong(0)).toSet
      val untouched = target.collect().filterNot(r => updatedKeys(r.getLong(0))).map(_.toSeq).toSet
      val after = merged.collect().filterNot(r => updatedKeys(r.getLong(0))).map(_.toSeq).toSet
      assert(untouched == after)
    }
  }
}
