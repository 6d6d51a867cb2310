package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IndexStore

/** Continuous dedup-ingest — the streaming form of the persisted
  * indexes' incremental-maintenance path: document micro-batches stream
  * in and each one is APPENDED to the index (built on the first batch),
  * so at every point the index covers exactly the documents ingested so
  * far and new arrivals can be near-dup-probed against it before
  * acceptance. Batch arrival order doesn't matter for the final index
  * content (appends are unioned rows in stable buckets), which keeps
  * this deterministic despite the file-source's nondeterministic batch
  * order. The choreography is index-kind agnostic; MinHash and SimHash
  * instances are provided.
  */
object StreamingIndexIngest {

  /** Shared choreography over ANY source frame: stage it as a 2-file
    * stream source (>1 micro-batch; more batches add cost, not
    * coverage), drop any previous index, stream batches through
    * build-then-append, then run the caller's probe over the finished
    * index. */
  private def ingestFrames(spark: SparkSession, source: DataFrame,
      workDir: String, idxTables: Seq[String], idxPath: String,
      buildOrAppend: (DataFrame, Boolean) => Unit,
      probe: () => DataFrame): DataFrame = {
    val srcDir = s"$workDir/src"
    source.repartition(2).write.mode("overwrite").parquet(srcDir)
    idxTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxPath))

    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        buildOrAppend(batch, !spark.catalog.tableExists(idxTables.head))
        (): Unit
      }
      .option("checkpointLocation", s"$workDir/ckpt_${System.nanoTime()}")
      .start()
    try q.processAllAvailable() finally q.stop()
    probe()
  }

  /** Document-corpus instance of [[ingestFrames]]: probes the finished
    * index with planted perturbed docs. */
  private def ingest(spark: SparkSession, sfDir: String, workDir: String,
      idxTables: Seq[String], idxPath: String,
      buildOrAppend: (DataFrame, Boolean) => Unit,
      probe: DataFrame => DataFrame): DataFrame = {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    ingestFrames(spark, docs, workDir, idxTables, idxPath, buildOrAppend,
      () => probe(docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" graft tail")).as("text"))))
  }

  /** MinHash instance — identical to probing a one-shot index over the
    * same corpus (asserted in StreamingSpec). `autoCompactAppends` runs
    * [[IndexStore.autoCompact]]'s counter-driven policy after each
    * appending micro-batch — the knob a LONG-RUNNING stream needs,
    * since its per-batch appends otherwise grow the index's file count
    * without bound (content is unaffected either way; parity spec'd). */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      table: String, idxPath: String,
      autoCompactAppends: Int = IndexStore.DefaultAutoCompactAppends)
      : DataFrame =
    ingest(spark, sfDir, workDir,
      Seq(s"${table}_bands", s"${table}_shingles"), idxPath,
      (batch, first) =>
        if (first) IndexStore.buildMinhashIndex(batch, "doc_id", "text",
          table, idxPath)
        else {
          IndexStore.appendMinhashIndex(batch, "doc_id", "text", table)
          IndexStore.autoCompact(spark, "minhash", table, autoCompactAppends)
          (): Unit
        },
      probes => IndexStore.probeMinhash(spark, probes, "doc_id", "text", table)
        .orderBy("query_id", "match_id"))

  /** SimHash instance — same contract over the chunk table. */
  def runSimhash(spark: SparkSession, sfDir: String, workDir: String,
      table: String, idxPath: String,
      autoCompactAppends: Int = IndexStore.DefaultAutoCompactAppends)
      : DataFrame =
    ingest(spark, sfDir, workDir, Seq(s"${table}_chunks"), idxPath,
      (batch, first) =>
        if (first) IndexStore.buildSimhashIndex(batch, "doc_id", "text",
          table, idxPath)
        else {
          IndexStore.appendSimhashIndex(batch, "doc_id", "text", table)
          IndexStore.autoCompact(spark, "simhash", table, autoCompactAppends)
          (): Unit
        },
      probes => IndexStore.probeSimhash(spark, probes, "doc_id", "text", table)
        .orderBy("query_id", "match_id"))

  /** Winnow (exact-substring) instance — same contract over the
    * fingerprint table: the finished index reports verbatim overlaps
    * for the planted perturbed docs. One-shot parity in StreamingSpec. */
  def runWinnow(spark: SparkSession, sfDir: String, workDir: String,
      table: String, idxPath: String,
      autoCompactAppends: Int = IndexStore.DefaultAutoCompactAppends)
      : DataFrame =
    ingest(spark, sfDir, workDir, Seq(s"${table}_wins"), idxPath,
      (batch, first) =>
        if (first) IndexStore.buildWinnowIndex(batch, "doc_id", "text",
          table, idxPath)
        else {
          IndexStore.appendWinnowIndex(batch, "doc_id", "text", table)
          IndexStore.autoCompact(spark, "winnow", table, autoCompactAppends)
          (): Unit
        },
      probes => IndexStore.probeWinnow(spark, probes, "doc_id", "text",
          table)
        .orderBy("query_id", "match_id"))

  /** SRP (embedding ANN) instance — [[ingestFrames]] over the
    * embeddings table instead of documents; the finished index answers
    * top-k for the first queries. One-shot parity in StreamingSpec. */
  def runSrp(spark: SparkSession, sfDir: String, workDir: String,
      table: String, idxPath: String,
      autoCompactAppends: Int = IndexStore.DefaultAutoCompactAppends)
      : DataFrame = {
    import graft.operators.Similarity
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        Similarity.toDoubleArray(col("embedding")).as("vec"))
    ingestFrames(spark, vecs, workDir,
      Seq(s"${table}_bands", s"${table}_vecs"), idxPath,
      (batch, first) =>
        if (first) IndexStore.buildSrpIndex(batch, table, idxPath)
        else {
          IndexStore.appendSrpIndex(batch, table)
          IndexStore.autoCompact(spark, "srp", table, autoCompactAppends)
          (): Unit
        },
      () => IndexStore.probeSrp(spark, vecs.where(col("vec_id") < 10),
          table, k = 5)
        .orderBy("query_id", "rank"))
  }
}
