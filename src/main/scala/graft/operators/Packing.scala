package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** No-truncation sequence packing: whole items (documents, or ≤B
  * pre-chunked pieces) packed into fixed-budget bins by segmented
  * First-Fit-Decreasing — the best-fit packing of "Fewer Truncations
  * Improve Language Modeling" (arXiv:2404.10830), re-expressed for a
  * cluster. The repo's prefix-sum packer ([[Ops.withGlobalRunningSum]]
  * in `ext_token_packing`) achieves ~zero padding by SPLITTING
  * documents at pack boundaries; this packer never splits — the trade
  * is bounded padding for zero truncation, and the paper's result is
  * that the trade is worth it for model quality.
  *
  * Distributed shape: a true FFD is a sequential fold over globally
  * sorted items — a single-task scale-killer. Here items get an exact
  * global rank by (size desc, id) through the 3-pass bucketed prefix,
  * the rank partitions them into SEGMENTS of `segmentSize` consecutive
  * ranks, and classic FFD runs independently inside each segment (a
  * bounded `mapGroups`: ≤ segmentSize items of (id, size) in memory —
  * the justified-imperative tier, like the Deflater signal; there is
  * no builtin bin-packer). Bin ids are globally unique as
  * `segment · segmentSize + local`. Quality: within a segment FFD
  * carries its 11/9·OPT + 1 guarantee and the first-fit property (no
  * two bins at ≤ B/2, so at most ONE under-half bin per segment);
  * across segments the decreasing global order means each segment
  * mixes the same size range it would have seen in the sequential
  * fold's neighborhood — padding concentrates in the ≤ 1-per-segment
  * tail bins, measured in PackingSpec. Determinism: the per-segment
  * item list is re-sorted inside the group, so the output is invariant
  * to arrival order and partitioning.
  */
object BestFitPacking {

  /** Pack `(item_id, n_tokens)` rows into bins of capacity `binSize`.
    * Every item must fit (`n_tokens <= binSize` — enforce upstream by
    * chunking oversized docs); violations fail the job loudly.
    * Returns `(item_id, n_tokens, bin_id)`. */
  def packBestFit(items: DataFrame, binSize: Long,
      segmentSize: Int = 4096): DataFrame = {
    require(binSize > 0 && segmentSize > 0)
    val spark = items.sparkSession
    import spark.implicits._
    val ranked = Ops.withGlobalRowNumber(
        items.select(col("item_id").cast("long"),
          col("n_tokens").cast("long")),
        Seq(col("n_tokens").desc, col("item_id")),
        -col("n_tokens").cast("double"), "__rn")
      .select(col("item_id"), col("n_tokens"),
        ((col("__rn") - 1) / segmentSize).cast("long").as("__seg"))
    ranked.as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (seg, it) =>
        // re-sort: mapGroups guarantees no intra-group order
        val sorted = it.toArray.sortBy(t => (-t._2, t._1))
        val binLoad = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.iterator.map { case (id, n, _) =>
          require(n <= binSize,
            s"item $id ($n tokens) exceeds binSize $binSize — chunk first")
          var b = 0
          while (b < binLoad.length && binLoad(b) + n > binSize) b += 1
          if (b == binLoad.length) binLoad += n else binLoad(b) += n
          (id, n, seg * segmentSize + b)
        }
      }
      .toDF("item_id", "n_tokens", "bin_id")
  }
}
