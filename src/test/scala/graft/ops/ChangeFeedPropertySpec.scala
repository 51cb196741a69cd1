package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck laws for the snapshot CDC classifier (`ChangeFeed.diff`,
  * the algebra behind `m6_cdc_diff` and `s19_snapshot_cdc`):
  *
  *  1. PARTITION — over random version pairs, the classification
  *     partitions the key space: inserts = keys(v2)∖keys(v1),
  *     deletes = keys(v1)∖keys(v2), updates = the intersection where
  *     the value changed, and every other key (intersection,
  *     unchanged) is ABSENT from the feed; no key appears twice.
  *  2. REPLAY — applying the feed to v1 (drop deletes, overwrite
  *     updates with `new_*`, add inserts) reconstructs v2 EXACTLY —
  *     the property a downstream consumer relies on when it replays
  *     the feed instead of re-reading the full store.
  *
  * Generators draw keys from a small space (forced collisions →
  * all three classes occur often) with small value ranges (forced
  * unchanged keys → the absent-from-feed class occurs too).
  */
class ChangeFeedPropertySpec extends SparkSpec {

  private val versionGen: Gen[Map[Long, Long]] = for {
    keys <- Gen.someOf(0L until 30L)
    vals <- Gen.listOfN(keys.size, Gen.chooseNum(0L, 4L))
  } yield keys.zip(vals).toMap

  private def toDf(m: Map[Long, Long]): DataFrame = {
    import spark.implicits._
    // a deterministic order in, though diff must not depend on it
    m.toSeq.sortBy(_._1).toDF("k", "v")
  }

  private def feedOf(v1: Map[Long, Long], v2: Map[Long, Long]) =
    ChangeFeed.diff(toDf(v1), toDf(v2), key = "k", compare = Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("classification partitions the key space (ScalaCheck, 25 version pairs)") {
    checkProp(Prop.forAll(versionGen, versionGen) { (v1, v2) =>
      val feed = feedOf(v1, v2)
      val byType = feed.groupBy(_._2).view
        .mapValues(_.map(_._1).toSet).toMap.withDefaultValue(Set.empty[Long])
      val expectIns = v2.keySet -- v1.keySet
      val expectDel = v1.keySet -- v2.keySet
      val expectUpd = (v1.keySet & v2.keySet).filter(k => v1(k) != v2(k))
      val keysOnce = feed.map(_._1).distinct.length == feed.length
      keysOnce &&
        byType("insert") == expectIns &&
        byType("delete") == expectDel &&
        byType("update") == expectUpd &&
        // everything else — unchanged intersection keys — is absent
        feed.map(_._1).toSet ==
          (expectIns ++ expectDel ++ expectUpd)
    })
  }

  test("old/new sides carry the version values faithfully (ScalaCheck)") {
    checkProp(Prop.forAll(versionGen, versionGen) { (v1, v2) =>
      feedOf(v1, v2).forall { case (k, _, oldV, newV) =>
        oldV == v1.get(k) && newV == v2.get(k)
      }
    })
  }

  test("replaying the feed reconstructs v2 from v1 (ScalaCheck, 25 version pairs)") {
    checkProp(Prop.forAll(versionGen, versionGen) { (v1, v2) =>
      val replayed = feedOf(v1, v2).foldLeft(v1) {
        case (acc, (k, "delete", _, _))          => acc - k
        case (acc, (k, _, _, Some(newV)))        => acc + (k -> newV) // insert | update
        case (acc, _)                            => acc
      }
      replayed == v2
    })
  }

  test("nullSafe compare: NULL↔value transitions are updates; ANSI default still skips them") {
    import spark.implicits._
    // k=1 NULL→7, k=2 7→NULL, k=3 NULL→NULL, k=4 5→5 — the four cases
    // the three-valued <> gets wrong or right in non-obvious ways
    val v1 = Seq((1L, None), (2L, Some(7L)), (3L, None), (4L, Some(5L)))
      .toDF("k", "v")
    val v2 = Seq((1L, Some(7L)), (2L, None), (3L, None), (4L, Some(5L)))
      .toDF("k", "v")
    val ansi = ChangeFeed.diff(v1, v2, key = "k", compare = Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // ANSI <>: NULL comparisons yield NULL → filtered → no update rows
    assert(ansi.isEmpty, ansi.toString)
    val safe = ChangeFeed.diff(v1, v2, key = "k", compare = Seq("v"),
        nullSafe = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // IS DISTINCT FROM: the two transitions surface; NULL=NULL and
    // 5=5 stay out of the feed
    assert(safe == Map(1L -> "update", 2L -> "update"), safe.toString)
  }

  test("multi-column compare: update iff ANY compared column changed (ScalaCheck)") {
    // the m6_cdc_diff shape — two compare columns; a change in either
    // marks the key updated, equal rows stay out of the feed entirely
    val twoColGen: Gen[Map[Long, (Long, Long)]] = for {
      keys <- Gen.someOf(0L until 25L)
      va <- Gen.listOfN(keys.size, Gen.chooseNum(0L, 2L))
      vb <- Gen.listOfN(keys.size, Gen.chooseNum(0L, 2L))
    } yield keys.zip(va.zip(vb)).toMap
    def toDf2(m: Map[Long, (Long, Long)]): DataFrame = {
      import spark.implicits._
      m.toSeq.map { case (k, (a, b)) => (k, a, b) }
        .sortBy(_._1).toDF("k", "va", "vb")
    }
    checkProp(Prop.forAll(twoColGen, twoColGen) { (v1, v2) =>
      val feed = ChangeFeed.diff(toDf2(v1), toDf2(v2), key = "k",
          compare = Seq("va", "vb")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expectUpd = (v1.keySet & v2.keySet).filter(k => v1(k) != v2(k))
      feed.filter(_._2 == "update").keySet == expectUpd &&
        feed.filter(_._2 == "insert").keySet == v2.keySet -- v1.keySet &&
        feed.filter(_._2 == "delete").keySet == v1.keySet -- v2.keySet &&
        feed.keySet.intersect((v1.keySet & v2.keySet).filter(k => v1(k) == v2(k))).isEmpty
    })
  }
}
