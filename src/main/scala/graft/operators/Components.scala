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
  * [[connectedComponentsRestartable]] realizes the same budget with
  * co-bucketed TABLES as the iteration state, adding crash-resume on
  * top.
  */
object Components {

  /** Target edge rows per iteration partition when sizing the loop
    * width from the measured edge count — small enough that a partition
    * sorts in memory, large enough that tiny pair graphs don't pay
    * session-width task overhead per iteration. */
  private val RowsPerIterationPartition = 250000L

  /** Truncates the self-referencing iteration plan. Default is
    * localCheckpoint: executor-memory blocks, no checkpoint files to
    * leak, freed per iteration below — right for a driver-loop whose
    * whole job retries on executor loss anyway. `reliable = true`
    * switches to durable checkpoints for fault-tolerant runs and then
    * REQUIRES the deployment to have set a shared-storage checkpoint
    * dir (defaulting to a driver-local path would scatter executor
    * checkpoints across machines); retention of those files follows
    * the deployment's checkpoint policy. Either way the checkpoint goes
    * through [[Ops.checkpointKeepPartitioning]]: a checkpoint planned
    * under AQE loses the labels' id-partitioning, so BOTH of step's
    * joins would re-shuffle the label table every iteration — the exact
    * budget the class scaladoc promises away (masked in small tests by
    * broadcast conversion; ComponentsSpec pins the plan with broadcast
    * disabled). */
  private def truncated(df: DataFrame, reliable: Boolean,
      nPart: Int): DataFrame =
    Ops.checkpointKeepPartitioning(df, eager = true, reliable = reliable,
      numShufflePartitions = Some(nPart))

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
    // keep theirs through LogicalRDD). Two layout pins make the reuse
    // real rather than aspirational (plan-asserted in ComponentsSpec):
    // the repartition carries an EXPLICIT partition count — a bare
    // repartition(col) is AQE-optimizable, and a runtime-coalesced edge
    // cache would mismatch the checkpoints' width and re-shuffle labels
    // every iteration — and the initial checkpoint wraps the DISTINCT
    // frame only, with the label column added after the boundary: a
    // checkpoint of the aliased projection captures its partitioning on
    // the `label` alias, which the joins on id/src cannot match.
    //
    // The iteration width itself is sized to the MEASURED edge count
    // (checkpoint sub-plans see no AQE, so nothing else right-sizes
    // it): a near-dup pair graph is routinely tiny next to the corpus
    // that produced it, and running every iteration at the session's
    // full shuffle width pays per-task overhead times iterations for
    // nothing. Capped at the session width so warehouse-scale graphs
    // use the deployment's sizing. The symmetrized list is cached
    // before counting — `pairs` may be an expensive pipeline (the LSH
    // output in dedupClusters) and counting an uncached plan would run
    // it twice; the pre-layout cache is dropped once the layout
    // materializes inside the first checkpoint.
    val confPart = pairs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val a = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val base = a.unionAll(a.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // finallys: ANY failure — the sizing count, the initial
    // checkpoint's jobs, a mid-loop executor OOM — must not strand a
    // cache; repeated failed attempts would otherwise accumulate
    // pinned executor storage until the ContextCleaner happens to run
    // (writeComponents holds the same standard for its final blocks).
    // unpersist is idempotent, so the success path's early base drop
    // and the outer finally can coexist.
    try {
      val nEdges = base.count()
      val nPart = math.max(1L, math.min(confPart.toLong,
        nEdges / RowsPerIterationPartition + 1)).toInt
      val edges = base.repartition(nPart, col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // eager: materializes the edge layout too, so base is droppable
        var labels = truncated(edges.select(col("src").as("id")).distinct(),
          reliable, nPart).withColumn("label", col("id"))
        base.unpersist(blocking = false)
        var converged = false
        var iter = 0
        while (!converged && iter < maxIters) {
          val next = truncated(step(edges, labels), reliable, nPart)
          // convergence probe: early-exit scan over the blocks the
          // checkpoint just materialized — no join, no shuffle, no
          // recomputation.
          converged = next.where(col("moved")).isEmpty
          freeBlocks(labels) // previous iteration's blocks are dead now
          labels = next.drop("moved")
          iter += 1
        }
        if (!converged) throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIters iterations — " +
            "graph diameter exceeds the bound; raise maxIters")
        // the final labels' materialization backs the returned plan
        labels.select(col("id"), col("label").as("component"))
      } finally edges.unpersist()
    } finally base.unpersist(blocking = false)
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

  /** RESTART-FREE reliable mode: iteration state lives in co-bucketed
    * catalog tables instead of durable checkpoints — the layout the
    * class scaladoc promises. The symmetrized edge list is written ONCE
    * bucketed by src; each iteration's labels land bucketed by id with
    * the same bucket count, so both joins of [[step]] read their
    * bucketed scans in place and the only exchange per iteration is the
    * dst-aggregation (shuffle.partitions is pinned to nBuckets for the
    * loop so the aggregated minima land co-partitioned with the label
    * buckets; plan-asserted in ComponentsSpec). Progress markers are the
    * catalog entries themselves — a `<base>_labels_i` table exists only
    * if its CTAS finished, the same crash-window stance IndexStore
    * takes — so a killed run RESUMES from its last completed iteration:
    * no checkpoint directory, no RDD lineage, nothing session-lived.
    * Non-convergence within maxIters (cumulative across runs) still
    * fails loud, but preserves the state so a re-invocation with a
    * larger bound continues instead of restarting. Superseded iterations
    * are reaped as the run advances; after convergence exactly one
    * labels generation remains and a re-invocation returns it
    * immediately. `base` names one logical run — resuming it with a
    * DIFFERENT pair list is caller error (the persisted edges win). */
  def connectedComponentsRestartable(pairs: DataFrame, base: String,
      path: String, idA: String = "id_a", idB: String = "id_b",
      maxIters: Int = 20, nBuckets: Int = 8): DataFrame = {
    val spark = pairs.sparkSession
    val edgesTbl = s"${base}_edges"
    def labelsTbl(i: Int) = s"${base}_labels_$i"
    def dropWithFiles(t: String): Unit =
      if (spark.catalog.tableExists(t)) {
        val loc = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t)).location
        spark.sql(s"DROP TABLE $t")
        val hp = new org.apache.hadoop.fs.Path(loc)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(hp, true)
      }

    if (!spark.catalog.tableExists(edgesTbl)) {
      val a = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      a.unionAll(a.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        // route to the bucket key before the bucketed write: distinct
        // leaves the rows hash-partitioned on (src, dst) across the
        // session's shuffle width, so without this every writer task
        // emits files into buckets it doesn't own (the small-file
        // fan-out IndexStore.bucketRouted documents) — and this table
        // is re-read by every iteration's join
        .repartition(nBuckets, col("src"))
        .write.bucketBy(nBuckets, "src")
        .option("path", s"$path/$edgesTbl").mode("overwrite")
        .saveAsTable(edgesTbl)
    }
    val edges = spark.table(edgesTbl)

    // Generations are discovered from the CATALOG, not by scanning a
    // 0..maxIters range: a prior run invoked with a LARGER bound may
    // have progressed past this call's maxIters, and a range scan would
    // silently restart from scratch while the old generation lingered
    // to be resurrected by a later wider call. While at it, reap any
    // stale earlier generations a crash between write(i+1) and drop(i)
    // left behind — resume must hold the one-live-generation invariant.
    val genPattern = (java.util.regex.Pattern
      .quote(s"${base.toLowerCase}_labels_") + "(\\d+)").r
    val gens = spark.catalog.listTables().collect().toSeq
      .flatMap(t => t.name match {
        case genPattern(i) => Some(i.toInt)
        case _ => None
      }).sorted
    gens.dropRight(1).foreach(i => dropWithFiles(labelsTbl(i)))
    var iter = gens.lastOption.getOrElse(-1)
    if (iter < 0) {
      edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")).withColumn("moved", lit(true))
        .repartition(nBuckets, col("id"))
        .write.bucketBy(nBuckets, "id")
        .option("path", s"$path/${labelsTbl(0)}").mode("overwrite")
        .saveAsTable(labelsTbl(0))
      iter = 0
    }
    def stillMoving(i: Int): Boolean =
      !spark.table(labelsTbl(i)).where(col("moved")).isEmpty
    // labels_0's moved=true is a "not converged yet" sentinel — except
    // for an empty graph, whose empty table correctly reads as converged
    var converged = !stillMoving(iter)
    // shuffle width pinned to nBuckets PER ITERATION via the locked
    // scope (Ops.withSessionConf): the dst-aggregation's exchange must
    // land at the buckets' width for the one-exchange write, and the
    // conf is read at the CTAS's planning, inseparable from its job —
    // so the lock rides the iteration. The convergence probe and the
    // reaping drop need no scoped conf and run outside it.
    while (!converged && iter < maxIters) {
      Ops.withSessionConf(spark,
        Map("spark.sql.shuffle.partitions" -> nBuckets.toString)) {
        step(edges, spark.table(labelsTbl(iter)).select("id", "label"))
          .write.bucketBy(nBuckets, "id")
          .option("path", s"$path/${labelsTbl(iter + 1)}").mode("overwrite")
          .saveAsTable(labelsTbl(iter + 1))
      }
      iter += 1
      converged = !stillMoving(iter)
      // the just-superseded iteration is dead state: a crash from here
      // on resumes from the newer table either way
      dropWithFiles(labelsTbl(iter - 1))
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsRestartable did not converge in $maxIters " +
        s"iterations — state is preserved under $base; re-invoke with a " +
        "larger maxIters to continue from where this run stopped")
    spark.table(labelsTbl(iter))
      .select(col("id"), col("label").as("component"))
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
