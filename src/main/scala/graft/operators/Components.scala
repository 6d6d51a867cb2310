package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS into dedup GROUPS: documents linked through any chain of
  * near-dup pairs belong to one cluster, and the cluster keeps a single
  * representative. Without it, pairwise dedup double-drops (a~b, b~c
  * removes both b and c even though a~c was never verified) or
  * under-drops.
  *
  * Min-label propagation: every vertex starts as its own label (its own
  * id) and repeatedly takes the minimum label among itself and its
  * neighbors until nothing changes. Each iteration is one join + one
  * aggregation, CHECKPOINTED before the next: persist alone is not
  * enough here, because the iteration's plan references the previous
  * labels twice (own ∪ via-neighbors), so the un-truncated logical plan
  * doubles per iteration — exponential by iteration ~12. checkpoint()
  * rewrites the plan to a scan of the materialized rows, keeping plan
  * depth constant. Iterations needed = graph diameter; near-dup
  * clusters are shallow, and `maxIters` bounds pathological chains.
  *
  * Shuffle budget at warehouse scale: the edge list is partitioned by
  * src ONCE (cached), checkpointed labels keep their id-partitioning,
  * and each iteration moves only the propagated neighbor-minima — one
  * exchange per step, proven by plan-walk in ComponentsSpec.
  */
object Components {

  /** Truncates the self-referencing iteration plan. Default is
    * localCheckpoint: executor-memory blocks, no checkpoint files to
    * leak, freed per iteration below — right for a driver-loop whose
    * whole job retries on executor loss anyway. `reliable = true`
    * switches to durable checkpoints for fault-tolerant runs and then
    * REQUIRES the deployment to have set a shared-storage checkpoint
    * dir (defaulting to a driver-local path would scatter executor
    * checkpoints across machines); retention of those files follows
    * the deployment's checkpoint policy. */
  private def truncated(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df.localCheckpoint()

  /** Frees the materialized blocks behind a checkpointed iteration —
    * best effort: once the NEXT iteration is materialized, the previous
    * one's blocks are dead weight. */
  private def freeBlocks(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** One min-label-propagation step: (id, label, moved). Exactly ONE
    * exchange — the propagated-label aggregation by dst. The edges scan
    * reads its persisted src-partitioning in place, the propagated mins
    * land hash-distributed on id, and the previous labels arrive already
    * id-partitioned from their checkpoint, so the final join moves
    * nothing. Change-detection rides the same plan (labels only ever
    * decrease, so moved == neighbor-min < own), costing the old
    * join+count a second shuffling job per iteration. Every vertex has
    * a neighbor row (edges are symmetrized), so the join is inner. */
  private[graft] def step(edges: DataFrame, labels: DataFrame): DataFrame = {
    val propagated = edges
      .join(labels.withColumnRenamed("id", "src"), "src")
      .select(col("dst").as("id"), col("label"))
      .groupBy("id").agg(min(col("label")).as("nmin"))
    labels.join(propagated, "id")
      .select(col("id"), least(col("label"), col("nmin")).as("label"),
        (col("nmin") < col("label")).as("moved"))
  }

  /** (id, component) for every vertex that appears in `pairs`; the
    * component id is the minimum vertex id of the cluster. Vertices
    * with no pairs are their own singleton cluster by definition —
    * callers union them in if they need every document labeled.
    * Throws if the graph has not converged within `maxIters` (diameter
    * too large) — silently returning split clusters would let duplicate
    * keepers survive dedup. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIters: Int = 20,
      reliable: Boolean = false): DataFrame = {
    if (reliable)
      require(pairs.sparkSession.sparkContext.getCheckpointDir.nonEmpty,
        "reliable = true needs sparkContext.setCheckpointDir on shared storage")
    // symmetrize once: propagation must flow both directions. The
    // repartition by src is the layout investment the scaladoc promises:
    // paid ONCE, then every iteration's edges⨝labels co-locates for free
    // (the persisted cache keeps the partitioning; checkpointed labels
    // keep theirs through LogicalRDD).
    val a = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val edges = a.unionAll(a.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = truncated(edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id")), reliable)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = truncated(step(edges, labels), reliable)
      // convergence probe: early-exit scan over the blocks the checkpoint
      // just materialized — no join, no shuffle, no recomputation.
      converged = next.where(col("moved")).isEmpty
      freeBlocks(labels) // previous iteration's blocks are dead now
      labels = next.drop("moved")
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters iterations — " +
        "graph diameter exceeds the bound; raise maxIters")
    // the final labels' materialization backs the returned plan
    labels.select(col("id"), col("label").as("component"))
  }

  /** Terminal form for long-lived sessions: the plan returned by
    * `connectedComponents` is backed by the final iteration's checkpoint
    * blocks, which stay pinned in executor storage for as long as the
    * caller holds the DataFrame. This variant materializes the labels to
    * `path` (parquet), frees those blocks, and returns a plan that scans
    * the written files — nothing left resident, so repeated clustering
    * runs in one session don't accumulate storage. */
  def writeComponents(pairs: DataFrame, path: String, idA: String = "id_a",
      idB: String = "id_b", maxIters: Int = 20,
      reliable: Boolean = false): DataFrame = {
    val cc = connectedComponents(pairs, idA, idB, maxIters, reliable)
    // free the blocks even when the write throws — the caller never
    // receives the handle on failure, so a leak here would be permanent
    try cc.write.mode("overwrite").parquet(path)
    finally freeBlocks(cc)
    cc.sparkSession.read.parquet(path)
  }

  /** Dedup keeper table: one row per cluster with the representative
    * (min id) and the cluster size. */
  def dedupClusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b"): DataFrame =
    connectedComponents(pairs, idA, idB)
      .groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
      .select(col("component").as("keeper_id"), col("cluster_size"))
}
