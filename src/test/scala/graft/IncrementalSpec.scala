package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val target = Seq(
    (1L, "a", ts("2024-01-01 00:00:00")),
    (2L, "b", ts("2024-01-02 00:00:00")),
    (3L, "c", ts("2024-01-03 00:00:00"))
  ).toDF("id", "v", "updated")

  private lazy val source = Seq(
    (2L, "b2", ts("2024-01-05 00:00:00")), // updated row
    (3L, "c", ts("2024-01-03 00:00:00")),  // unchanged (not after wm)
    (4L, "d", ts("2024-01-06 00:00:00"))   // new row
  ).toDF("id", "v", "updated")

  test("watermark is max(updated); empty target → epoch default") {
    val wm = target.agg(Incremental.watermarkExpr("updated")).head().getTimestamp(0)
    assert(wm == ts("2024-01-03 00:00:00"))
    val empty = target.where(lit(false))
    val wm0 = empty.agg(Incremental.watermarkExpr("updated")).head().getTimestamp(0)
    assert(wm0 == ts("1970-01-01 00:00:00"))
  }

  test("delta is strictly newer than watermark") {
    val wm = lit(ts("2024-01-03 00:00:00"))
    val d = Incremental.delta(source, "updated", wm).select("id")
      .as[Long].collect().sorted
    assert(d.toSeq == Seq(2L, 4L)) // id=3 at exactly wm excluded
  }

  test("merge: delta wins on conflict, unmatched survive, new appear") {
    val delta = Incremental.delta(source, "updated", lit(ts("2024-01-03 00:00:00")))
    val merged = Incremental.merge(target, delta, "id")
      .orderBy("id").as[(Long, String, Timestamp)].collect().toSeq
    assert(merged == Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "b2", ts("2024-01-05 00:00:00")),
      (3L, "c", ts("2024-01-03 00:00:00")),
      (4L, "d", ts("2024-01-06 00:00:00"))))
  }

  test("merge replaces the whole row: a delta null clears the target value") {
    val t = Seq((1L, Option("keep"), ts("2024-01-01 00:00:00")))
      .toDF("id", "v", "updated")
    val d = Seq((1L, Option.empty[String], ts("2024-01-02 00:00:00")))
      .toDF("id", "v", "updated")
    val out = Incremental.merge(t, d, "id").head()
    assert(out.isNullAt(out.fieldIndex("v")),
      "delta row must win wholesale, ON CONFLICT DO UPDATE style")
    assert(out.getTimestamp(out.fieldIndex("updated")) == ts("2024-01-02 00:00:00"))
  }

  test("merge is idempotent (re-applying the same delta is a no-op)") {
    val delta = Incremental.delta(source, "updated", lit(ts("2024-01-03 00:00:00")))
    val once = Incremental.merge(target, delta, "id")
    val twice = Incremental.merge(once, delta, "id")
    assert(twice.orderBy("id").collect().toSeq == once.orderBy("id").collect().toSeq)
  }

  test("latestPerKey collapses a CDC-shaped delta; merge stays pk-unique") {
    val target = Seq((1L, "old", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "v", "updated")
    // two delta rows for pk 1 (log-shaped): the newer one must win, and
    // merging the collapsed delta must leave exactly one row per pk
    val delta = Seq(
      (1L, "mid", Timestamp.valueOf("2024-01-02 00:00:00")),
      (1L, "new", Timestamp.valueOf("2024-01-03 00:00:00")),
      (2L, "ins", Timestamp.valueOf("2024-01-02 12:00:00")))
      .toDF("id", "v", "updated")
    val collapsed = Incremental.latestPerKey(delta, "id", "updated")
    assert(collapsed.count() == 2)
    val merged = Incremental.merge(target, collapsed, "id")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(merged == Map(1L -> "new", 2L -> "ins"))
    // the raw log-shaped delta WOULD break the pk invariant — the
    // documented precondition latestPerKey exists to restore
    assert(Incremental.merge(target, delta, "id").count() == 3)
  }

  test("latestPerKey survives dotted payload names and rejects __latest") {
    // a payload column with a dot must extract as a FIELD of the agg
    // struct, not parse as a deeper path traversal
    val dotted = Seq(
      (1L, "a", Timestamp.valueOf("2024-01-02 00:00:00")),
      (1L, "b", Timestamp.valueOf("2024-01-03 00:00:00")))
      .toDF("id", "v.x", "updated")
    val got = Incremental.latestPerKey(dotted, "id", "updated")
      .select(col("id"), col("`v.x`")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b"))
    // the internal agg alias is reserved loudly, like Dedup/Ops
    val clash = Seq((1L, "x", Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("id", "__latest", "updated")
    intercept[IllegalArgumentException] {
      Incremental.latestPerKey(clash, "id", "updated")
    }
  }

  test("reconcile: deleted = warehouse - source; archive + purge partition warehouse") {
    val sourceIds = Seq(1L, 3L).toDF("id")
    val deleted = Incremental.deletedIds(target, sourceIds, "id")
    assert(deleted.as[Long].collect().toSeq == Seq(2L))
    val archived = Incremental.archiveRows(target, deleted, "id")
    val kept = Incremental.purge(target, deleted, "id")
    assert(archived.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(archived.count() + kept.count() == target.count())
  }

  test("incrementalSync end-to-end on dataframes") {
    val out = Incremental.incrementalSync(target, source, "id", "updated")
    assert(out.count() == 4)
    assert(out.where($"id" === 2L).select("v").as[String].head() == "b2")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("versioned commit: a crash between stage and commit leaves readers consistent") {
    import graft.sources.VersionedTable
    val base = "/tmp/graft_commit_test"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))

    // cycle 1 lands normally
    VersionedTable.write(target, base, 1)
    assert(VersionedTable.currentVersion(base).contains(1))
    assert(VersionedTable.read(spark, base).count() == 3)

    // cycle 2 CRASHES in the commit window: v2 is staged, never committed
    val merged = Incremental.merge(target,
      Incremental.delta(source, "updated", lit(ts("2024-01-03 00:00:00"))), "id")
    VersionedTable.stage(merged, base, 2)
    // readers resolve the pointer, not the newest directory → still v1
    assert(VersionedTable.currentVersion(base).contains(1))
    assert(VersionedTable.read(spark, base).orderBy("id").collect().toSeq ==
      target.orderBy("id").collect().toSeq,
      "crash window must leave readers on the old consistent version")

    // the retried cycle re-stages (overwriting the orphan) and commits
    VersionedTable.stage(merged, base, 2)
    VersionedTable.commit(base, 2)
    assert(VersionedTable.currentVersion(base).contains(2))
    assert(VersionedTable.read(spark, base).count() == 4)
  }

  test("vacuum keeps the committed version, retained predecessors, and staged attempts") {
    import graft.sources.VersionedTable
    val base = "/tmp/graft_vacuum_test"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    (1 to 3).foreach(v => VersionedTable.write(target, base, v)) // committed = 3
    VersionedTable.stage(target, base, 4) // in-flight attempt, NOT committed

    assert(VersionedTable.vacuum(base, keep = 1) == Seq(1),
      "only versions older than committed - keep are deleted")
    assert(new java.io.File(s"$base/v2").exists(), "retained predecessor survives")
    assert(new java.io.File(s"$base/v4").exists(), "staged attempt survives")
    assert(VersionedTable.read(spark, base).count() == 3, "reads stay on committed")

    assert(VersionedTable.vacuum(base, keep = 0) == Seq(2))
    assert(VersionedTable.vacuum(base, keep = 0).isEmpty, "idempotent")
  }
}
