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

  /** (id, component) for every vertex that appears in `pairs`; the
    * component id is the minimum vertex id of the cluster. Vertices
    * with no pairs are their own singleton cluster by definition —
    * callers union them in if they need every document labeled. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIters: Int = 20): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(s"/tmp/graft_ckpt/${sc.applicationId}")
    // symmetrize once: propagation must flow both directions
    val a = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val edges = a.unionAll(a.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .checkpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // candidate label per vertex: min over its own and its neighbors'
      val next = labels
        .unionAll(edges
          .join(labels.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), col("label")))
        .groupBy("id").agg(min(col("label")).as("label"))
        .checkpoint() // truncates the self-referencing plan
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .where(col("n.label") =!= col("o.label"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
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
