package graft.operators

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}

/** W4's operational half: the bounded-retry batched flush.
  *
  * The reference's most battle-hardened code wraps every sink call in a
  * retry ladder (/root/reference/sync-db2-ago.py:249-336 edit_features,
  * :339-380 delete_features): rows go out in 50-row batches with
  * rollback-on-failure (a failed batch applies nothing, so retrying it is
  * safe), transient failures — rollbacks (code 1003, :296-304), timeouts,
  * connection resets — are retried up to 5 times with a sleep between
  * attempts, and an unhandled error gives up on that batch alone.
  *
  * Spark-first shape: the batch ASSIGNMENT is declarative (`w4_batched
  * _sink` / `Ops.withGlobalRowNumber`); the FLUSH runs inside
  * `foreachPartition`, so each executor drives its own retry ladder in
  * parallel and the driver sees only accumulator totals. A poison batch
  * (still failing after `maxTries`) is isolated and reported instead of
  * killing the whole write — at 100 TB a single bad row must not
  * invalidate a million landed batches.
  *
  * Contract: `flush` must be atomic per call (all-or-nothing, like the
  * reference's rollback_on_failure=true) and idempotent per batch key —
  * Spark task retries, like the reference's maybe-it-landed timeouts
  * (:316), can replay a batch that already applied.
  */
object BatchedSink {

  /** Failure the sink reports as transient — retried with backoff.
    * Anything else thrown by `flush` is treated as the reference's
    * "unhandled error" (:278-283): no retry, batch poisoned. */
  final class RetryableFailure(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** A batch that never landed, with the final exception that killed it —
    * "p1-b0 failed" with no cause is untriageable in production; the
    * class+message of the last attempt is the minimum viable forensics. */
  final case class PoisonedBatch(key: String, error: String)

  /** Driver-side totals of one batched write. `poisoned` holds the batch
    * keys that never landed (with their terminal error); everything else
    * landed exactly once. */
  final case class SinkReport(batches: Long, rows: Long, retries: Long,
      poisoned: Seq[PoisonedBatch])

  /** Flushes `df` in `batchSize`-row batches per partition through
    * `flush(batchKey, rows)`, retrying transient failures up to
    * `maxTries` attempts with doubling backoff (capped at 60 s).
    * Returns the landed/retried/poisoned totals. */
  def writeBatched(df: DataFrame, batchSize: Int = 50, maxTries: Int = 5,
      backoffMs: Long = 0L)(flush: (String, Seq[Row]) => Unit): SinkReport = {
    require(batchSize > 0 && maxTries > 0)
    val sc = df.sparkSession.sparkContext
    val nBatches = sc.longAccumulator("graft.sink.batches")
    val nRows = sc.longAccumulator("graft.sink.rows")
    val nRetries = sc.longAccumulator("graft.sink.retries")
    val poisoned =
      sc.collectionAccumulator[(String, String)]("graft.sink.poisoned")

    df.foreachPartition { (it: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      it.grouped(batchSize).zipWithIndex.foreach { case (batch, i) =>
        val key = s"p$pid-b$i"
        var tries = 0
        var landed = false
        var lastError: Throwable = null
        var givenUp = false
        while (!landed && !givenUp) {
          tries += 1
          try {
            flush(key, batch)
            landed = true
          } catch {
            case e: RetryableFailure if tries < maxTries =>
              lastError = e
              nRetries.add(1)
              // clamp the doubling exponent BEFORE shifting: an
              // unclamped `backoffMs << tries` overflows Long past ~60
              // tries and Thread.sleep(negative) throws from inside the
              // retry handler
              if (backoffMs > 0)
                Thread.sleep(math.min(
                  backoffMs * (1L << math.min(tries - 1, 16)), 60000L))
            case e: RetryableFailure => // ladder exhausted
              lastError = e; givenUp = true
            case NonFatal(e) => // unhandled → no retry
              lastError = e; givenUp = true
          }
        }
        if (landed) { nBatches.add(1); nRows.add(batch.size.toLong) }
        else poisoned.add(key -> (s"${lastError.getClass.getSimpleName}: " +
          s"${Option(lastError.getMessage).getOrElse("").take(500)}"))
      }
    }
    SinkReport(nBatches.value, nRows.value, nRetries.value,
      poisoned.value.asScala.toList.sortBy(_._1)
        .map { case (k, e) => PoisonedBatch(k, e) })
  }
}
