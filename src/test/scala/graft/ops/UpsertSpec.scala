package graft.ops

import graft.SparkSpec

class UpsertSpec extends SparkSpec {

  private def target = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
  }

  test("updateMerge: matched rows take mapped columns, unmatched pass through, extras dropped") {
    import spark.implicits._
    val updates = Seq((2L, "B2", 99.0), (9L, "ghost", 0.0)).toDF("uk", "us", "uv")
    val out = Upsert.updateMerge(target, updates, Seq("k" -> "uk"), Map("s" -> "us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 10.0), (2L, "B2", 20.0), (3L, "c", 30.0)))
  }

  test("updateMerge: duplicate update-side keys fail like Delta's multiple-match error") {
    import spark.implicits._
    val dup = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("uk", "us", "uv")
    // Spark 4 surfaces raise_error as SparkRuntimeException (task-side it
    // may arrive wrapped in SparkException) — catch either.
    val e = intercept[Exception] {
      Upsert.updateMerge(target, dup, Seq("k" -> "uk"), Map("s" -> "us")).collect()
    }
    def msgs(t: Throwable): Iterator[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(5).map(x => Option(x.getMessage).getOrElse(""))
    assert(msgs(e).exists(_.contains("duplicate update-side merge key")))
  }

  test("fullUpsert: updates overwrite (including legitimate NULLs), new keys insert") {
    import spark.implicits._
    val updates = Seq((2L, null.asInstanceOf[String], 21.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val out = Upsert.fullUpsert(target, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    // ADVICE.md round-1 fix: the matched row's NULL must propagate
    assert(out == Set(
      (1L, Some("a"), 10.0), (2L, None, 21.0), (3L, Some("c"), 30.0), (4L, Some("d"), 40.0)))
  }

  test("fullUpsert idempotence: applying the same updates twice equals once") {
    import spark.implicits._
    val updates = Seq((2L, "B", 21.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val once = Upsert.fullUpsert(target, updates, Seq("k"))
    val twice = Upsert.fullUpsert(once, updates, Seq("k"))
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("fullUpsert with disjoint keys equals union") {
    import spark.implicits._
    val disjoint = Seq((7L, "g", 70.0)).toDF("k", "s", "v")
    val merged = Upsert.fullUpsert(target, disjoint, Seq("k"))
    val unioned = target.unionByName(disjoint)
    assert(merged.except(unioned).isEmpty && unioned.except(merged).isEmpty)
  }

  test("evolveUpsert: new columns backfill null, target-only columns survive a match") {
    import spark.implicits._
    // updates grew `c` (target lacks it) and dropped `s` (target-only)
    val updates = Seq((2L, 21.0, "web"), (4L, 40.0, "app")).toDF("k", "v", "c")
    val out = Upsert.evolveUpsert(target, updates, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "s", "v", "c"))
    val got = out.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2), Option(r.getString(3))))
      .toSet
    assert(got == Set(
      (1L, Some("a"), 10.0, None),          // untouched: new col null
      (2L, Some("b"), 21.0, Some("web")),   // matched: `s` SURVIVES, v+c updated
      (3L, Some("c"), 30.0, None),          // untouched
      (4L, None, 40.0, Some("app"))))       // insert: target-only col null
  }

  test("evolveUpsert: case-variant update column is the SAME column, not a null-overwriting new one") {
    import spark.implicits._
    // 'V' is target 'v' under Spark's default case-insensitive
    // resolution; misclassifying it as new would null v on rows 1 and 3
    val updates = Seq((2L, 21.0, "web")).toDF("k", "V", "c")
    val got = Upsert.evolveUpsert(target, updates, Seq("k"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), Option(r.getString(3))))
      .toSet
    assert(got == Set(
      (1L, "a", 10.0, None),
      (2L, "b", 21.0, Some("web")),
      (3L, "c", 30.0, None)))
  }

  test("lwwUpsert: newest version wins, staging wins ties, key-only fallback prefers staging") {
    import spark.implicits._
    val t = Seq((1L, "t", 100L), (2L, "t", 100L), (3L, "t", 100L)).toDF("k", "src", "ver")
    val s = Seq((1L, "s", 200L), (2L, "s", 50L), (3L, "s", 100L), (4L, "s", 10L)).toDF("k", "src", "ver")
    val out = Upsert.lwwUpsert(t, s, Seq("k"), Some("ver"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "s"), (2L, "t"), (3L, "s"), (4L, "s")))
    val keyOnly = Upsert.lwwUpsert(t, s, Seq("k"), None)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keyOnly == Set((1L, "s"), (2L, "s"), (3L, "s"), (4L, "s")))
  }
}
