package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.QualityRules

/** Gate-drift monitoring as a forever-sync: every micro-batch of the
  * crawl is scored by the INDEPENDENT gate flags
  * ([[QualityRules.gateFlags]]) and its verdict-combination counts land
  * in the sink keyed by arrival batch — the dashboard table an operator
  * watches to catch a crawl-mix shift (a batch whose `lang_en` share
  * collapses, a boilerplate source flooding `gopher_pass = 0`) BEFORE
  * the composed pipeline's kept-rate moves. Counts per batch are a pure
  * function of the batch's rows, so each batch writes its own
  * directory with `mode(overwrite)` — a crash-replay overwrites
  * byte-identical content, idempotent without any manifest.
  */
object StreamingVenn {

  /** Stages the documents table as 4 residue-class files, drains after
    * each; returns the accumulated per-batch verdict table
    * `(batch_res, lang_en, c4_ok, gopher_pass, n_docs)`. */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      nBatches: Int = 4): DataFrame = {
    val srcDir = s"$workDir/src"
    val sinkDir = s"$workDir/sink"
    Seq(srcDir, sinkDir, s"$workDir/ckpt").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    new java.io.File(srcDir).mkdirs()

    val q = spark.readStream.schema(docs.schema).parquet(srcDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendVenn(batch, batchId, sinkDir, nBatches)
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    try (0 until nBatches).foreach { k =>
      docs.where(col("doc_id") % nBatches === k)
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(s"$sinkDir/b*")
      .orderBy("batch_res", "lang_en", "c4_ok", "gopher_pass")
  }

  /** One micro-batch's verdict counts → its own overwrite-mode
    * directory (pure function of the rows ⇒ replay-idempotent).
    * Exposed for the replay drill in StreamingSpec. */
  def appendVenn(batch: DataFrame, batchId: Long, sinkDir: String,
      nBatches: Int): Unit = {
    QualityRules.gateFlags(batch)
      .withColumn("batch_res", (col("doc_id") % nBatches).cast("int"))
      .groupBy("batch_res", "lang_en", "c4_ok", "gopher_pass")
      .agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$sinkDir/b$batchId")
    (): Unit
  }
}
