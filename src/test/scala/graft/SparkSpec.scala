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
