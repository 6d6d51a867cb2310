package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ops

/** Continuous training-shard production — the streaming form of
  * [[Ops.withHashShardId]]: document micro-batches are cut into
  * fixed-size shards as they ARRIVE. Within a batch, rows rank by the
  * same reproducible md5 key as the batch assigner (through the same
  * scale-safe 3-pass prefix — never a single-task window); across
  * batches, ranks continue where the sink left off. The offset is
  * re-derived from the SINK's row count, not driver memory, so a
  * restarted stream resumes the deal instead of re-starting shard 0;
  * the per-batch anti-join on doc_id makes a replayed micro-batch
  * idempotent instead of double-dealt (same recovery stance as the
  * versioned merge in [[StreamingSync]]).
  *
  * Shard boundaries deliberately SPAN micro-batches: a 128-doc shard
  * may take its last rows from the next arrival, so shard sizes are
  * exactly `shardSize` with one ragged global tail — identical
  * invariants to the batch assigner, which is what makes the two
  * interchangeable for a trainer.
  */
object StreamingShards {

  /** Stages the documents table as `nBatches` residue-class files,
    * DRAINING the stream after each write so arrival order is a pure
    * function of the data (batch k = doc_id % nBatches == k) and the
    * final assignment is fully oracle-checkable in SQL. Returns the
    * accumulated (doc_id, shard_id) sink. */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      shardSize: Int = 128, nBatches: Int = 4): DataFrame = {
    val srcDir = s"$workDir/src"
    val sinkDir = s"$workDir/sink"
    Seq(srcDir, sinkDir, s"$workDir/ckpt").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val docs = graft.Tables.load(spark, sfDir, "documents").select("doc_id")
    new java.io.File(srcDir).mkdirs()

    val q = spark.readStream.schema(docs.schema).parquet(srcDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendSharded(spark, batch, sinkDir, shardSize)
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    try (0 until nBatches).foreach { k =>
      docs.where(col("doc_id") % nBatches === k)
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(sinkDir).orderBy("doc_id")
  }

  /** One micro-batch of the deal: continue the global rank from the
    * sink's current count, cut shards, append. Exposed for specs. */
  def appendSharded(spark: SparkSession, batch: DataFrame, sinkDir: String,
      shardSize: Int): Unit = {
    val existing =
      if (new java.io.File(sinkDir).exists) Some(spark.read.parquet(sinkDir))
      else None
    val fresh = existing.fold(batch)(e =>
      batch.join(e.select("doc_id"), Seq("doc_id"), "left_anti"))
    val offset = existing.fold(0L)(_.count())
    Ops.withGlobalRowNumber(
        fresh.withColumn("__shx",
          md5(col("doc_id").cast("string").cast("binary"))),
        Seq(col("__shx"), col("doc_id")),
        expr("conv(substr(__shx, 1, 13), 16, 10)").cast("double"), "__shrn")
      .withColumn("shard_id",
        floor((col("__shrn") - lit(1) + lit(offset)) / lit(shardSize.toDouble))
          .cast("long"))
      .drop("__shx", "__shrn")
      .write.mode("append").parquet(sinkDir)
  }
}
