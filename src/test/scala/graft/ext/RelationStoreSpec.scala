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
