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
  * clusters are shallow, and `maxIters` bounds pathological chains. At
  * warehouse scale each iteration shuffles by vertex id — labels and
  * edges can share a bucketed layout to make that shuffle-free.
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
    // symmetrize once: propagation must flow both directions
    val a = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val edges = a.unionAll(a.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = truncated(edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id")), reliable)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // candidate label per vertex: min over its own and its neighbors'
      val next = truncated(labels
        .unionAll(edges
          .join(labels.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), col("label")))
        .groupBy("id").agg(min(col("label")).as("label")), reliable)
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .where(col("n.label") =!= col("o.label"))
        .count()
      freeBlocks(labels) // previous iteration's blocks are dead now
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters iterations — " +
        "graph diameter exceeds the bound; raise maxIters")
    // the final labels' materialization backs the returned plan
    labels.select(col("id"), col("label").as("component"))
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
