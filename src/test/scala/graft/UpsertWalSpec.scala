package graft

import graft.operators.{Upsert, WalReplay}
import org.apache.spark.sql.functions._

class UpsertWalSpec extends SparkSuite {
  import spark.implicits._

  test("last-writer-wins keeps exactly the max-version row per key") {
    val log = Seq(
      (1L, "a", 1L), (1L, "b", 3L), (1L, "c", 2L),
      (2L, "x", 1L),
      (3L, "p", 2L), (3L, "q", 1L)).toDF("id", "payload", "version")
    val got = Upsert.lastWriterWins(log, "id", "version")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "b", 3L), (2L, "x", 1L), (3L, "p", 2L)))
  }

  test("batch update: order decides — resurrection, wipe, patch-keep") {
    // base: ids 1..6, payload (tag, n)
    val base = Seq((1L, "b", 10L), (2L, "b", 20L), (3L, "b", 30L),
      (4L, "b", 40L), (5L, "b", 50L), (6L, "b", 60L))
      .toDF("id", "tag", "n")
    val ops = Seq(
      // id 1: delete v1 then upsert v2 → resurrected with v2 payload
      (1L, 1L, "delete", None: Option[String], None: Option[Long]),
      (1L, 2L, "upsert", Some("res"), Some(11L)),
      // id 2: upsert v1 then delete v2 → gone
      (2L, 1L, "upsert", Some("up"), Some(21L)),
      (2L, 2L, "delete", None, None),
      // id 3: patch v1 then upsert v2 → patch wiped by the replace
      (3L, 1L, "patch", Some("pat"), None),
      (3L, 2L, "upsert", Some("up"), Some(31L)),
      // id 4: upsert v1 then patch v2 → patch lands on the upsert
      (4L, 1L, "upsert", Some("up"), Some(41L)),
      (4L, 2L, "patch", Some("pat"), None),
      // id 5: two patches — per FIELD the last non-null wins
      (5L, 1L, "patch", Some("pat1"), Some(51L)),
      (5L, 2L, "patch", Some("pat2"), None))
      .toDF("id", "version", "op", "tag", "n")
    val got = Upsert.batchUpdate(base, ops, "id").orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, "res", 11L),  // delete-then-upsert lives
      (3L, "up", 31L),   // earlier patch wiped
      (4L, "pat", 41L),  // later patch keeps the unpatched field
      (5L, "pat2", 51L), // field-wise last non-null patch
      (6L, "b", 60L)))   // untouched passthrough
  }

  test("snapshot + tail replay equals full replay at any split point") {
    val ev = Tables.events(spark, sf)
    val full = WalReplay.replayComposed(ev, Long.MaxValue).collect().toSeq
    for (split <- Seq(0L, 100L, 5000L)) {
      val composed = WalReplay.replayComposed(ev, split).collect().toSeq
      assert(composed == full, s"split at $split diverges")
    }
  }

  test("scd2: no-change upserts collapse, intervals tile, current = LWW") {
    val hist = Upsert.scd2Query(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    // v3 only re-asserts v2's label for ids %14, so NO interval may
    // open at version 3
    assert(!hist.exists(_._3 == 3L), "a no-change upsert opened an interval")
    // intervals tile per id: first opens at v1, each valid_to equals
    // the next valid_from, exactly one open (current) interval
    hist.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 == 1L, s"id $id history misses the v1 epoch")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"id $id gap: $a then $b")
        case _ =>
      }
      assert(sorted.init.forall(_._5 == 0L) && sorted.last._5 == 1L &&
        sorted.last._4.isEmpty, s"id $id current-flag/open-interval drift")
    }
    // the current slice IS the last-writer-wins view of the same log
    val lww = Upsert.lastWriterWins(
        Upsert.versionedLog(spark, sf), "id", "version")
      .select("id", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val current = hist.filter(_._5 == 1L).map(t => (t._1, t._2)).toSet
    assert(current == lww, "SCD2 current slice drifted from LWW")
  }

  test("snapshot diff classifies added/deleted/changed and drops the unchanged majority") {
    val log = Upsert.snapshotDiffLog(spark, sf)
    val diff = Upsert.snapshotDiff(log, "id", "version", "op",
        Seq("label"), vOld = 3L, vNew = 6L)
      .collect().map(r => (r.getLong(0), r.getAs[String]("change"))).toMap
    // every class is populated by the fixture
    assert(diff.values.toSet == Set("added", "deleted", "changed"))
    // late arrivals (+400000 re-keys, absent before v4) are added
    assert(diff.filter(_._2 == "added").keySet.forall(_ >= 400000L))
    // %5-not-%15 ids are deleted; %15 resurrections are changed
    assert(diff(5L) == "deleted" && diff(10L) == "deleted")
    assert(diff(15L) == "changed" && diff(30L) == "changed")
    // an id no write touched after v3 must not appear at all
    assert(!diff.contains(1L) && !diff.contains(2L))
    // value semantics: diffing a state against itself is empty
    assert(Upsert.snapshotDiff(log, "id", "version", "op",
      Seq("label"), 6L, 6L).isEmpty)
    // composition sanity: applying the diff classes to state(3)
    // yields exactly state(6)'s key set
    val s3 = Upsert.lastWriterWinsTombstone(
        log.where(col("version") <= 3), "id", "version", "op")
      .select("id").collect().map(_.getLong(0)).toSet
    val s6 = Upsert.lastWriterWinsTombstone(
        log.where(col("version") <= 6), "id", "version", "op")
      .select("id").collect().map(_.getLong(0)).toSet
    val added = diff.filter(_._2 == "added").keySet
    val deleted = diff.filter(_._2 == "deleted").keySet
    assert((s3 ++ added -- deleted) == s6)
  }

  test("scd2 retention preserves as-of reads at and after the horizon") {
    val horizon = 4L
    val full = Upsert.scd2IntervalsTombstone(
      Upsert.tombstoneLog(spark, sf), "id", "version", Seq("label"), "op")
      .localCheckpoint(true)
    val retained = Upsert.scd2Retention(full, horizon)
    def state(df: org.apache.spark.sql.DataFrame, t: Long) =
      Upsert.asOfIntervals(df, t).select("id", "label")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // the contract: every as-of at t >= horizon is unchanged
    (horizon to 6L).foreach { t =>
      assert(state(retained, t) == state(full, t), s"as-of $t drifted")
    }
    // and history below the horizon is genuinely gone (the point):
    // some pre-horizon interval exists in full but not in retained
    assert(retained.count() < full.count())
    assert(state(retained, 1L) != state(full, 1L))
    // retained rows are a subset — retention never invents intervals
    val fullSet = full.collect().map(_.toString).toSet
    assert(retained.collect().map(_.toString).forall(fullSet.contains))
  }
}
