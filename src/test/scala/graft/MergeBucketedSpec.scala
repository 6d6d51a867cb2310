package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.functions._

import graft.operators.Incremental

/** Proves the scale claim in [[graft.operators.Incremental]] (the
  * reference's hottest path, sync-db2.py:78-88, at warehouse scale):
  * merge shuffles both sides by pk at most once, and with the TARGET
  * stored bucketed by pk its shuffle disappears — the full-outer
  * sort-merge join reads the bucketed scan in place, so each sync
  * moves only the (small) delta. With the delta ALSO bucketed (the
  * staged-upsert layout, where deltas land bucketed from the previous
  * cycle), the merge plans zero exchanges end to end.
  */
class MergeBucketedSpec extends SparkSpec {
  import spark.implicits._

  private val tgtTbl = "graft_spec_merge_target"
  private val dltTbl = "graft_spec_merge_delta"
  private val basePath = "/tmp/graft_merge_spec"

  private def dropTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$basePath/$t"))
  }

  // 1000-row target; delta = 50 whole-row updates + 50 inserts
  private def targetDf: DataFrame = spark.range(1000)
    .select(col("id").as("pk"), concat(lit("old-"), col("id")).as("payload"),
      col("id").as("wm"))
  private def deltaDf: DataFrame =
    (spark.range(50).select(col("id").as("pk"),
        concat(lit("new-"), col("id")).as("payload"),
        (col("id") + 10000).as("wm"))
      unionByName spark.range(1000, 1050).select(col("id").as("pk"),
        concat(lit("ins-"), col("id")).as("payload"), col("id").as("wm")))

  private def ensureTables(): Unit =
    if (!spark.catalog.tableExists(tgtTbl)) {
      Seq(tgtTbl, dltTbl).foreach(dropTable)
      targetDf.write.bucketBy(8, "pk")
        .option("path", s"$basePath/$tgtTbl").saveAsTable(tgtTbl)
      deltaDf.write.bucketBy(8, "pk")
        .option("path", s"$basePath/$dltTbl").saveAsTable(dltTbl)
    }

  // noBroadcast comes from SparkSpec — full-outer can't broadcast
  // anyway; belt and braces so the plan walk never silently passes via
  // a BroadcastExchange

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case _ => p.children
  }

  /** root→scan paths for scans rooted under `dir`. */
  private def pathsToScan(p: SparkPlan, dir: String): Seq[List[SparkPlan]] =
    p match {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.mkString(",").contains(dir) =>
        Seq(List(f))
      case _ => kids(p).flatMap(c => pathsToScan(c, dir)).map(p :: _)
    }

  private def assertMergedValues(merged: DataFrame): Unit = {
    val got = merged.as[(Long, String, Long)].collect()
      .map { case (pk, payload, wm) => pk -> ((payload, wm)) }.toMap
    assert(got.size == 1050, "1000 target + 50 inserts, 50 in-place updates")
    assert(got(0L) == (("new-0", 10000L)), "updated row takes EVERY delta column")
    assert(got(49L) == (("new-49", 10049L)))
    assert(got(50L) == (("old-50", 50L)), "untouched rows keep target values")
    assert(got(1049L) == (("ins-1049", 1049L)), "inserts arrive")
  }

  test("bucketed target + bucketed delta: merge plans zero exchanges") {
    ensureTables()
    noBroadcast {
      val merged = Incremental.merge(
        spark.table(tgtTbl), spark.table(dltTbl), "pk")
      assert(shuffleCount(merged) == 0,
        "both sides bucketed by pk with equal bucket counts — the " +
          "full-outer sort-merge join must read both scans in place")
      assertMergedValues(merged)
    }
  }

  test("bucketed target + unbucketed delta: only the delta side moves") {
    ensureTables()
    noBroadcast {
      val merged = Incremental.merge(spark.table(tgtTbl), deltaDf, "pk")
      assert(shuffleCount(merged) == 1,
        "exactly one exchange: the unbucketed delta re-hashed to the " +
          "target's bucketing")
      val root = finalPlan(merged)
      val paths = pathsToScan(root, s"$basePath/$tgtTbl")
      assert(paths.nonEmpty, s"no scan of the target table in:\n$root")
      paths.foreach { path =>
        val scan = path.last.asInstanceOf[FileSourceScanExec]
        assert(scan.outputPartitioning.isInstanceOf[HashPartitioning],
          s"target scan is not bucketed:\n$scan")
        assert(!path.exists {
          case _: Exchange => true
          case q: QueryStageExec => q.plan.isInstanceOf[Exchange]
          case _ => false
        }, s"target side moved:\n$root")
      }
      assertMergedValues(merged)
    }
  }

  test("merge result is identical whether or not the layout is bucketed") {
    ensureTables()
    val bucketed = Incremental.merge(
      spark.table(tgtTbl), spark.table(dltTbl), "pk")
    val plain = Incremental.merge(targetDf, deltaDf, "pk")
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty,
      "bucketing is a physical layout choice — it must not change results")
  }
}
