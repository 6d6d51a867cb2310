package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic commit protocol for a versioned parquet table — the merge
  * target's transactional guarantee.
  *
  * The reference's upsert is transactional: `INSERT … ON CONFLICT DO
  * UPDATE` commits or rolls back as a unit
  * (/root/reference/sync-db2-viewer.py:17-80), so a crashed sync never
  * leaves readers a half-applied table. A bare versioned-directory
  * overwrite loses that: a crash between writing v(N+1) and whatever
  * resolves "latest" strands readers on a torn choice. This protocol
  * restores the guarantee with the classic pointer swap:
  *
  *   1. write the new version's data to `base/v(N+1)` (never touching
  *      the version readers are on);
  *   2. write the version number to a temp pointer file and fsync it;
  *   3. atomically rename the temp file over `base/_COMMIT`.
  *
  * Readers resolve `_COMMIT` → `base/vN`. A crash anywhere before step 3
  * leaves the pointer — and every reader — on the previous consistent
  * version; the orphaned data directory is overwritten by the next
  * attempt. Step 3 is a single-file rename: atomic on POSIX and HDFS;
  * on S3-style stores the equivalent is a conditional PUT of the
  * pointer object. IncrementalSpec drives the crash window.
  *
  * Durability boundary, stated honestly: the protocol orders WRITER
  * crashes (process death at any step), not media-level power loss —
  * step 1's parquet data is written by Spark tasks without an fsync,
  * so a power cut after step 3 could in principle persist the pointer
  * but not all data pages. Closing that window needs data-side
  * durability from the storage layer: HDFS replication/hflush or an
  * object store's committed-PUT semantics give it; a local filesystem
  * demo relies on the OS flushing data before anyone reads it. The
  * same boundary applies to every parquet-writing engine without a
  * write-ahead log.
  */
object VersionedTable {

  private def pointer(base: String) = Paths.get(base, "_COMMIT")

  /** The committed version, if any commit has ever succeeded. */
  def currentVersion(base: String): Option[Int] = {
    val p = pointer(base)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  /** Stage `df` as version `version` WITHOUT committing it — readers
    * stay on the current committed version until [[commit]] runs. */
  def stage(df: DataFrame, base: String, version: Int): Unit =
    df.write.mode("overwrite").parquet(s"$base/v$version")

  /** Atomically publish `version`: temp pointer + fsync + rename. */
  def commit(base: String, version: Int): Unit = {
    new File(base).mkdirs()
    val tmp = Paths.get(base, s"_COMMIT.tmp.$version")
    val ch = Files.newByteChannel(tmp, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.SYNC)
    try ch.write(java.nio.ByteBuffer.wrap(
      version.toString.getBytes(StandardCharsets.UTF_8)))
    finally ch.close()
    Files.move(tmp, pointer(base), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Stage + commit in order — the happy path of one sync cycle. */
  def write(df: DataFrame, base: String, version: Int): Unit = {
    stage(df, base, version)
    commit(base, version)
  }

  /** Read the committed version. Throws if nothing was ever committed. */
  def read(spark: SparkSession, base: String): DataFrame = {
    val v = currentVersion(base).getOrElse(
      throw new IllegalStateException(s"no committed version under $base"))
    spark.read.parquet(s"$base/v$v")
  }

  /** Deletes version directories strictly older than committed − `keep`
    * and returns the deleted version numbers. Never touches the
    * committed version, the `keep` retained predecessors (in-flight
    * readers may still hold them), or anything NEWER than the pointer
    * (a staged, not-yet-committed attempt). Safe to run any time after
    * a commit; a no-op when nothing was ever committed. */
  def vacuum(base: String, keep: Int = 1): Seq[Int] = currentVersion(base)
    .map { committed =>
      val dirs = Option(new File(base).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      val stale = dirs.filter(_.getName.drop(1).toInt < committed - keep)
      stale.foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(d))
      stale.map(_.getName.drop(1).toInt).toSeq.sorted
    }.getOrElse(Seq.empty)
}
