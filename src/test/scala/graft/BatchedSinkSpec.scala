package graft

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import graft.operators.BatchedSink
import graft.operators.BatchedSink.RetryableFailure

/** In-JVM stand-in for the reference's unreliable remote sink: records
  * what landed and injects failures per batch key. Local-mode tests share
  * one JVM with the executors, so statics observe executor-side flushes. */
object TestSink {
  val landed = new ConcurrentHashMap[String, Seq[Long]]()
  val attempts = new ConcurrentHashMap[String, Integer]()
  @volatile var failFirstAttempts: Int = 0 // transient failures per batch
  @volatile var poisonKeys: Set[String] = Set.empty // always-fail batches
  @volatile var fatalKeys: Set[String] = Set.empty // non-retryable batches

  def reset(): Unit = {
    landed.clear(); attempts.clear()
    failFirstAttempts = 0; poisonKeys = Set.empty; fatalKeys = Set.empty
  }

  def flush(key: String, rows: Seq[Row]): Unit = {
    val n = attempts.merge(key, 1, (a, b) => a + b)
    if (poisonKeys.contains(key))
      throw new RetryableFailure(s"injected: $key always rolls back")
    if (fatalKeys.contains(key))
      throw new IllegalStateException(s"injected: $key has a bad row")
    if (n <= failFirstAttempts)
      throw new RetryableFailure(s"injected: $key attempt $n rolled back")
    // atomic per call: the whole batch lands or nothing did (above)
    landed.put(key, rows.map(_.getLong(0)))
  }
}

class BatchedSinkSpec extends SparkSpec {
  import spark.implicits._

  // 200 ids in 4 partitions of exactly 50 → batch keys p0-b0 … p3-b0
  private def data = spark.range(200).toDF("id")
    .repartitionByRange(4, org.apache.spark.sql.functions.expr("id div 50"))

  test("transient failures: every batch lands exactly once after retries") {
    TestSink.reset()
    TestSink.failFirstAttempts = 2 // first two attempts of EVERY batch fail
    val report = BatchedSink.writeBatched(data, batchSize = 50,
      maxTries = 5, backoffMs = 1)(TestSink.flush)
    assert(report.batches == 4 && report.rows == 200)
    assert(report.retries == 8, "two retries per batch")
    assert(report.poisoned.isEmpty)
    val all = TestSink.landed.values.asScala.flatten.toSeq
    assert(all.size == 200 && all.distinct.size == 200,
      "every row landed exactly once, no duplicates")
  }

  test("a poison batch fails alone after maxTries; the rest land") {
    TestSink.reset()
    TestSink.poisonKeys = Set("p1-b0")
    val report = BatchedSink.writeBatched(data, batchSize = 50,
      maxTries = 5, backoffMs = 1)(TestSink.flush)
    assert(report.poisoned.map(_.key) == Seq("p1-b0"))
    assert(report.poisoned.head.error.startsWith("RetryableFailure:") &&
      report.poisoned.head.error.contains("always rolls back"),
      "the terminal exception's class+message ride along for triage")
    assert(TestSink.attempts.get("p1-b0") == 5, "ladder ran to maxTries")
    assert(report.batches == 3 && report.rows == 150,
      "the other batches land despite the poison batch")
    assert(!TestSink.landed.containsKey("p1-b0"))
  }

  test("unhandled errors poison immediately, without retries") {
    TestSink.reset()
    TestSink.fatalKeys = Set("p2-b0")
    val report = BatchedSink.writeBatched(data, batchSize = 50,
      maxTries = 5, backoffMs = 1)(TestSink.flush)
    assert(report.poisoned.map(_.key) == Seq("p2-b0"))
    assert(report.poisoned.head.error.startsWith("IllegalStateException:"),
      "unhandled errors are identified by class in the report")
    assert(TestSink.attempts.get("p2-b0") == 1,
      "the reference raises unhandled sink errors without retrying")
    assert(report.batches == 3 && report.retries == 0)
  }

  test("odd-sized tail batch is flushed too") {
    TestSink.reset()
    val df = spark.range(130).toDF("id").coalesce(1)
    val report = BatchedSink.writeBatched(df, batchSize = 50,
      maxTries = 3)(TestSink.flush)
    assert(report.batches == 3 && report.rows == 130)
    assert(TestSink.landed.get("p0-b2").size == 30)
  }
}
