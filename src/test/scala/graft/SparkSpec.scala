package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run
  * in the forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf0001 = "/root/testdata/sf0.001"

  /** Runs `body` with broadcast joins disabled (both the static and the
    * adaptive threshold) so a plan-walk assertion about co-partitioned
    * or bucketed reuse can't be silently satisfied by broadcasting the
    * small test-sized side — at scale neither side broadcasts and the
    * layout claim is what the assertion is for. */
  protected def noBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Counts shuffles in the final (post-AQE) physical plan. Query-stage
    * nodes are leaves, so traversal must descend into their `plan`. */
  protected def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    df.collect() // finalize AQE plan
    def count(p: SparkPlan): Int = p match {
      // a ShuffleQueryStageExec WRAPS its ShuffleExchangeExec — counting
      // the stage and then descending would count one shuffle twice
      case q: QueryStageExec => count(q.plan)
      case s: ShuffleExchangeExec => 1 + s.children.map(count).sum
      case r: ReusedExchangeExec => count(r.child)
      case other => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    })
  }
}
