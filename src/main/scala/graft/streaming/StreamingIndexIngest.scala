package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IndexStore

/** Continuous dedup-ingest — the streaming form of the persisted MinHash
  * index's incremental-maintenance path: document micro-batches stream
  * in and each one is APPENDED to the index (built on the first batch),
  * so at every point the index covers exactly the documents ingested so
  * far and new arrivals can be near-dup-probed against it before
  * acceptance. Batch arrival order doesn't matter for the final index
  * content (appends are unioned band/shingle rows), which keeps this
  * deterministic despite the file-source's nondeterministic batch order.
  */
object StreamingIndexIngest {

  /** Streams the documents table through foreachBatch index appends,
    * then probes the finished index with planted perturbed docs.
    * Returns the probe result — identical to probing a one-shot index
    * over the same corpus (asserted in StreamingSpec). */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      table: String, idxPath: String): DataFrame = {
    val srcDir = s"$workDir/docs_src"
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    // two files so the stream sees >1 micro-batch (each batch pays two
    // bucketed table writes — more batches add cost, not coverage);
    // fresh index per run
    docs.repartition(2).write.mode("overwrite").parquet(srcDir)
    Seq(s"${table}_bands", s"${table}_shingles").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxPath))

    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!spark.catalog.tableExists(s"${table}_bands"))
          IndexStore.buildMinhashIndex(batch, "doc_id", "text", table, idxPath)
        else
          IndexStore.appendMinhashIndex(batch, "doc_id", "text", table)
        (): Unit
      }
      .option("checkpointLocation", s"$workDir/ckpt_${System.nanoTime()}")
      .start()
    try q.processAllAvailable() finally q.stop()

    val probes = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" graft tail")).as("text"))
    IndexStore.probeMinhash(spark, probes, "doc_id", "text", table)
      .orderBy("query_id", "match_id")
  }
}
