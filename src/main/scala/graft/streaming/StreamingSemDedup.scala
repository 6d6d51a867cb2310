package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}

/** SemDeDup as a forever-sync — the one major dedup operator that had
  * no streaming form: embedding micro-batches are assigned against
  * PINNED centroids (the quantizer is trained once batch-side, the IVF
  * practice), near-dup-checked within the batch AND against every
  * cluster member seen by earlier batches, and the keepers append to
  * the accepted sink.
  *
  * The cross-batch check runs against a SEEN index (all previously
  * arrived vectors, keepers or not), not the accepted sink: the batch
  * kernel drops a vector when ANY smaller-id cluster-mate near-dups it,
  * including mates that were themselves dropped — checking only
  * accepted members would re-admit the third copy of a triplet whose
  * second copy was dropped, silently diverging from the batch form.
  * With id-range staging (arrival order = id order), stream keepers
  * equal [[Similarity.semanticDedup]] over the whole corpus EXACTLY —
  * parity spec'd in StreamingSpec.
  *
  * Scale shape: assignment is map-only; the seen join is cluster-keyed
  * (never all-pairs) and column-pruned. A production deployment would
  * persist `seen` as a cluster-bucketed IndexStore kind and add the
  * hot-cluster star cap to the cross-batch join; at the staged batch
  * sizes here the plain parquet sink keeps the drill exact.
  */
object StreamingSemDedup {

  /** Embeddings ∪ ×1.001 copies of every 20th vector (the
    * ext_semantic_dedup fixture), staged in id-range order; returns the
    * accepted (vec_id, cluster_id) sink. */
  def run(spark: SparkSession, sfDir: String, workDir: String,
      threshold: Double = 0.999): DataFrame = {
    Seq("src", "seen", "kept", "ckpt").foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$workDir/$d")))
    val base = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        Similarity.toDoubleArray(col("embedding")).as("vec"))
    val corpus = base.unionByName(base.where(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x * 1.001).as("vec")))
    val centroids = IvfIndex.collectCentroids(
      base.where(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cluster_id"),
          col("vec").as("centroid")))
    val srcDir = s"$workDir/src"
    new java.io.File(srcDir).mkdirs()
    val median = base.stat.approxQuantile("vec_id", Array(0.5), 0.0)
      .head.toLong
    val q = spark.readStream.schema(corpus.schema).parquet(srcDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupBatch(batch, centroids, threshold,
          s"$workDir/seen", s"$workDir/kept")
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    val ranges = Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      id => id <= median,
      id => id > median && id < 100000,
      id => id >= 100000)
    try ranges.foreach { pred =>
      corpus.where(pred(col("vec_id")))
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(s"$workDir/kept").orderBy("vec_id")
  }

  /** One micro-batch: within-batch kernel + cross-batch seen check →
    * guarded appends. Replay-safe: both sinks anti-join on vec_id, so
    * a replayed batch re-derives identical decisions (the seen rows it
    * already appended are EARLIER-id by staging and self-matches are
    * excluded by the id inequality) and appends nothing new. Exposed
    * for the drills in StreamingSpec. */
  def dedupBatch(batch: DataFrame, centroids: Seq[(Int, Seq[Double])],
      threshold: Double, seenDir: String, keptDir: String): Unit = {
    val spark = batch.sparkSession // session coherence (StreamingCuration)
    val assigned = IvfIndex.withClusterId(batch, centroids, "vec")
      .localCheckpoint()
    // within-batch: the exact batch kernel over this batch alone
    val withinKept = Similarity
      .semanticDedup(batch, centroids, threshold)
      .select("vec_id")
    // cross-batch: any seen cluster-mate near-dup kills (seen ids are
    // strictly earlier arrivals; self-id guard for replays)
    val seenExists = new java.io.File(seenDir).exists
    val crossKilled =
      if (!seenExists) assigned.select("vec_id").where(lit(false))
      else {
        val seen = spark.read.parquet(seenDir)
          .select(col("vec_id").as("__sid"),
            col("cluster_id").as("__scl"), col("vec").as("__svec"))
        assigned.join(seen,
            col("cluster_id") === col("__scl") &&
              col("vec_id") =!= col("__sid"))
          .withColumn("__cos", Similarity.cosine(col("vec"), col("__svec")))
          .where(col("__cos").isNotNull && !isnan(col("__cos")) &&
            col("__cos") >= threshold)
          .select("vec_id").distinct()
      }
    val kept = assigned.select("vec_id", "cluster_id")
      .join(withinKept, "vec_id")
      .join(crossKilled, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val freshKept = (if (new java.io.File(keptDir).exists)
        kept.join(spark.read.parquet(keptDir).select("vec_id"),
          Seq("vec_id"), "left_anti")
      else kept).localCheckpoint()
    freshKept.write.mode("append").parquet(keptDir)
    val freshSeen = (if (seenExists)
        assigned.join(spark.read.parquet(seenDir).select("vec_id"),
          Seq("vec_id"), "left_anti")
      else assigned).localCheckpoint()
    freshSeen.select("vec_id", "cluster_id", "vec")
      .write.mode("append").parquet(seenDir)
    (): Unit
  }
}
