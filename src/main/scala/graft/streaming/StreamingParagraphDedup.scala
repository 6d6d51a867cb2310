package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IndexStore

/** Paragraph-level dedup as a forever-sync — the streaming form of
  * [[graft.operators.Dedup.paragraphDedup]], and the shape CCNet's
  * paragraph-hash dedup actually deploys as (a crawl never arrives at
  * once): each micro-batch's lines are checked within the batch
  * (first-occurrence keeper) and against the PERSISTED line-fingerprint
  * index of every earlier batch; surviving lines append to the index,
  * cleaned documents append to the sink.
  *
  * The line index REUSES the exact IndexStore kind wholesale — a line
  * is just a tiny document keyed by its (doc, line) position — so the
  * stream inherits the bucketed zero-index-shuffle probe, append
  * compaction, and take-down machinery without a new index kind.
  *
  * With id-range staging (arrival order = id order) the stream's
  * first-arriving line keeper IS the corpus-wide min-(doc,line) keeper,
  * so the output checks against the SAME oracle SQL as the batch form,
  * verbatim.
  */
object StreamingParagraphDedup {

  /** The ext_paragraph_dedup fixture corpus (boilerplate planted on
    * every third doc), staged in id-range order; returns the cleaned
    * (doc_id, n_kept, clean_text) sink. */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      table: String, idxPath: String): DataFrame = {
    Seq("src", "sink", "ckpt").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$workDir/$d")))
    spark.sql(s"DROP TABLE IF EXISTS ${table}_fps")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxPath))
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val corpus = docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"),
          lit("\nSubscribe to our newsletter today!" +
            "\nAll rights reserved worldwide.")))
        .otherwise(col("text")).as("text"))
    // empty pre-seed on the LINE key space
    IndexStore.buildExactIndex(
      corpus.where(lit(false)).select(col("doc_id").as("pid"),
        col("text").as("para")),
      "pid", "para", table, idxPath)
    val srcDir = s"$workDir/src"
    new java.io.File(srcDir).mkdirs()
    val median = corpus.stat.approxQuantile("doc_id", Array(0.5), 0.0)
      .head.toLong
    val q = spark.readStream.schema(corpus.schema).parquet(srcDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupBatch(batch, table, s"$workDir/sink")
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    val ranges = Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      id => id <= median, id => id > median)
    try ranges.foreach { pred =>
      corpus.where(pred(col("doc_id")))
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(s"$workDir/sink").orderBy("doc_id")
  }

  /** One micro-batch: explode lines → within-batch first-occurrence
    * keeper (groupBy+join, never a hash window) → cross-batch probe of
    * the line index (self-id filtered, so replays after a completed
    * append re-derive the same decisions) → guarded sink append →
    * index append. Exposed for the drills in StreamingSpec. */
  def dedupBatch(batch: DataFrame, table: String, sinkDir: String): Unit = {
    val spark = batch.sparkSession // session coherence (StreamingCuration)
    val paras = batch.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("para_idx", "para")))
      .withColumn("pid", col("doc_id") * 1000000L + col("para_idx"))
      .withColumn("ph",
        graft.functions.TextAnalysis.fingerprintMd5(col("para")))
      .localCheckpoint()
    val withinFirst = paras.join(
        paras.groupBy("ph").agg(min(col("pid")).as("__first")), "ph")
      .where(col("pid") === col("__first"))
      .drop("__first")
    val crossSeen = IndexStore.probeExact(spark,
        withinFirst.select("pid", "para"), "pid", "para", table)
      .select(col("query_id").as("pid")).distinct()
    val keptLines = withinFirst
      .join(crossSeen, Seq("pid"), "left_anti")
      .localCheckpoint()
    val cleaned = keptLines.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("para_idx"), col("para")))),
          s => s.getField("para"))).as("clean_text"))
    val fresh = (if (new java.io.File(sinkDir).exists)
        cleaned.join(spark.read.parquet(sinkDir).select("doc_id"),
          Seq("doc_id"), "left_anti")
      else cleaned).localCheckpoint()
    fresh.write.mode("append").parquet(sinkDir)
    IndexStore.appendExactIndex(
      keptLines.join(fresh.select("doc_id"), Seq("doc_id"), "left_semi")
        .select("pid", "para"),
      "pid", "para", table)
    IndexStore.autoCompact(spark, "exact", table)
    (): Unit
  }
}
