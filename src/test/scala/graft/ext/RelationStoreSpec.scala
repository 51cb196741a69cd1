package graft.ext

import graft.SparkSpec

class RelationStoreSpec extends SparkSpec {

  test("ensure builds once per key, memoizes, and leaves no staging debris") {
    import spark.implicits._
    RelationStore.reset()
    var builds = 0
    def build = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("k", "v") }
    val p1 = RelationStore.ensure("rs-spec-key")(build)
    val p2 = RelationStore.ensure("rs-spec-key")(build)
    assert(p1 == p2 && builds == 1, s"expected one build, got $builds")
    assert(spark.read.parquet(p1).count() == 2)
    assert(!new java.io.File(p1 + ".build").exists())
    // a distinct key builds its own relation
    val p3 = RelationStore.ensure("rs-spec-key-2")(build)
    assert(p3 != p1 && builds == 2)
  }

  test("racing ensure calls on one key serialize to a single build") {
    import spark.implicits._
    RelationStore.reset()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build = { builds.incrementAndGet(); Seq((1L, "a")).toDF("k", "v") }
    // eleven stored relations now ride on this lock (postings, vocab,
    // gram sets, BPE merges, dedup indexes, labels, centroid pivot) —
    // a doubled build under a real race would re-run a corpus pass
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val paths = Await.result(
      Future.sequence((1 to 4).map(_ =>
        Future(RelationStore.ensure("rs-spec-race")(build)))),
      2.minutes)
    assert(paths.toSet.size == 1, paths.toString)
    assert(builds.get() == 1, s"expected exactly one build, got ${builds.get()}")
    assert(spark.read.parquet(paths.head).count() == 1)
  }

  test("a failed build leaves nothing readable and the retry rebuilds") {
    import spark.implicits._
    RelationStore.reset()
    intercept[RuntimeException] {
      RelationStore.ensure("rs-spec-crash") {
        sys.error("injected build crash")
      }
    }
    // the crash left no final dir, so the retry builds fresh
    val p = RelationStore.ensure("rs-spec-crash")(Seq((9L, "z")).toDF("k", "v"))
    assert(spark.read.parquet(p).count() == 1)
    assert(!new java.io.File(p + ".build").exists())
  }
}
