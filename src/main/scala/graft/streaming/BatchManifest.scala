package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The per-batch atomic commit protocol shared by the foreachBatch
  * streams (the StreamingPacking/StreamingShards discipline, factored):
  * each micro-batch writes its own `b<id>/` directory under the sink,
  * then commits a one-line manifest file by ATOMIC RENAME. Readers
  * union committed directories only, so a crash mid-write is invisible
  * (no torn reads); a replayed COMMITTED batch short-circuits on its
  * manifest entry (zero history reads — the replay guard costs
  * O(#batches) driver-side file stats, never a sink data scan); a
  * replayed UNCOMMITTED batch re-derives its decisions and overwrites
  * its directory wholesale. Streams whose manifest entries carry
  * continuation state (the corpus build's spend ledger, the packer's
  * bin count) parse `content` themselves.
  */
private[streaming] object BatchManifest {

  /** Committed batch ids, smallest first. */
  def committedIds(sinkDir: String): Seq[Long] = {
    val dir = new File(s"$sinkDir/_manifest")
    if (!dir.exists) Seq.empty
    else dir.listFiles().toSeq
      .filter(f => f.isFile && f.getName.forall(_.isDigit))
      .map(_.getName.toLong).sorted
  }

  /** Atomically commits `batchId` (write temp, rename into place). */
  def commit(sinkDir: String, batchId: Long, content: String = ""): Unit = {
    new File(s"$sinkDir/_manifest").mkdirs()
    val tmp = Paths.get(s"$sinkDir/_manifest/.tmp-$batchId")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(s"$sinkDir/_manifest/$batchId"),
      StandardCopyOption.ATOMIC_MOVE)
    (): Unit
  }

  /** The committed sink as one frame, or `empty` when nothing has
    * committed yet. */
  def readCommitted(spark: SparkSession, sinkDir: String)
      (empty: => DataFrame): DataFrame = {
    val dirs = committedIds(sinkDir).map(id => s"$sinkDir/b$id")
    if (dirs.isEmpty) empty else spark.read.parquet(dirs: _*)
  }
}
