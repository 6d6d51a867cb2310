package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor: a deterministic
  * Lloyd's k-means trains coarse centroids, every corpus vector is
  * assigned to its nearest centroid (the "inverted list"), and a query
  * probes only the `nprobe` nearest lists. With nprobe == k this
  * degenerates to exact brute force (asserted in tests); with small
  * nprobe the scan cost drops to ~nprobe/k of the corpus — the 100 TB
  * path, where each inverted list is a partition of a bucketed table.
  *
  * Everything is joins + windows: centroids broadcast (k is small by
  * construction), the corpus streams, no driver-side iteration except
  * the k-means loop itself (`iters` is small and each step is one
  * distributed job — same shape as MLlib's own k-means driver loop).
  */
object IvfIndex {

  import Similarity.cosine

  /** Deterministic k-means init: the k lowest-id vectors seed the
    * clusters. `dim` must match the vector dimensionality — a mismatch
    * would zero-pad centroids and null out every cosine downstream.
    *
    * Empty clusters are RESEEDED, never silently dropped: the per-step
    * `groupBy("cluster_id")` yields no row for a cluster that attracted
    * zero vectors (e.g. two identical seeds, where the tie-break funnels
    * both into the lower id), and on a skewed corpus that would quietly
    * shrink the IVF coarse quantizer below k — every later probe pays
    * the recall cost with no error anywhere. Each dropped id is re-
    * anchored on the vector FARTHEST from its nearest surviving centroid
    * (the classic empty-cluster repair; deterministic tie-break on id,
    * degenerate zero/NaN vectors excluded — they can never attract
    * members). Post-step centroid count == k is therefore an invariant;
    * a corpus with fewer usable vectors than missing clusters fails
    * loudly instead of returning an undersized quantizer. */
  def trainCentroids(vecs: DataFrame, k: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "vec",
      dim: Int = 64): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var cent = vecs.orderBy(col(idCol)).limit(k)
      .withColumn("cluster_id",
        row_number().over(Window.orderBy(col(idCol))) - 1)
      .select(col("cluster_id"), col(vecCol).as("centroid"))
    for (_ <- 0 until iters) {
      // Materialize the k×dim centroids on the driver each step (they
      // are tiny by construction) so every assign job reads plan
      // literals instead of the previous iterations' full lineage —
      // plan depth stays constant across iters, nothing re-executes.
      // Same shape as MLlib's own k-means driver loop. Each step is
      // withClusterId (one projection) + the mergeable centroid agg:
      // the ONLY exchange per Lloyd iteration is the k-group groupBy.
      val local = withClusterId(vecs, collectCentroids(cent), vecCol)
        .groupBy("cluster_id")
        .agg(VectorAgg.centroid(col(vecCol), dim).as("centroid"))
        .as[(Int, Seq[Double])].collect().toIndexedSeq
      val missing = (0 until k).filterNot(local.map(_._1).toSet)
      val repaired =
        if (missing.isEmpty) local
        else local ++ reseedCentroids(vecs, local, missing, idCol, vecCol)
      cent = repaired.toDF("cluster_id", "centroid")
    }
    cent
  }

  /** Farthest-point repair for clusters emptied by a Lloyd step: the
    * `missing.size` vectors with the LOWEST nearest-surviving-centroid
    * cosine become the new anchors (one extra distributed job, run only
    * when a cluster actually emptied). Degenerate vectors — null/NaN
    * similarity against every centroid — are excluded: a zero vector
    * can never attract members, so seeding on one would re-empty the
    * cluster every iteration. */
  private def reseedCentroids(vecs: DataFrame,
      surviving: Seq[(Int, Seq[Double])], missing: Seq[Int],
      idCol: String, vecCol: String): Seq[(Int, Seq[Double])] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val far = vecs
      .withColumn("__negsim",
        nearestCandidate(col(vecCol), surviving).getField("neg_sim"))
      .where(col("__negsim") =!= lit(Double.PositiveInfinity))
      .orderBy(col("__negsim").desc, col(idCol).asc)
      .limit(missing.size)
      .select(col(vecCol)).as[Seq[Double]].collect().toIndexedSeq
    require(far.length == missing.size,
      s"k-means reseed: clusters ${missing.mkString(",")} emptied but only " +
        s"${far.length} non-degenerate vectors remain to re-anchor them — " +
        "the corpus cannot sustain k clusters; lower k")
    missing.zip(far)
  }

  /** Nearest-centroid assignment: (idCol, cluster_id). Ties break on the
    * lower cluster_id; a degenerate similarity (null or NaN from a
    * zero vector) loses to any real one — the same contract as
    * [[assignInline]], asserted in IvfOpsSpec. */
  def assign(vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__sim").desc_nulls_last, col("cluster_id").asc)
    vecs.crossJoin(broadcast(centroids))
      // nanvl: Spark orders NaN ABOVE every double, so a 0/0 similarity
      // would otherwise beat real ones — fold NaN into null (sorts last)
      .withColumn("__sim",
        nanvl(cosine(col(vecCol), col("centroid")), lit(null).cast("double")))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col(idCol), col("cluster_id"))
  }

  /** Collect a centroid frame (cluster_id, centroid) to driver-side
    * literals for [[withClusterId]]/[[assignInline]]. k×dim doubles —
    * tiny by construction, the same driver-side footprint
    * [[trainCentroids]] already accepts per Lloyd step. */
  def collectCentroids(centroids: DataFrame): Seq[(Int, Seq[Double])] = {
    val spark = centroids.sparkSession
    import spark.implicits._
    centroids.select(col("cluster_id"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toIndexedSeq.sortBy(_._1)
  }

  /** Appends `cluster_id` (nearest centroid) to `vecs` in ONE
    * projection: the k×dim centroids ride into the plan as literal
    * arrays, so there is no crossJoin row blow-up (k rows per vector),
    * no per-id window shuffle, and no assign-then-self-join — the
    * 100 TB shape for labeling a corpus with its inverted list (zero
    * exchanges, asserted in IvfOpsSpec). Highest cosine wins, ties
    * break on the lower cluster_id; a degenerate similarity (null/NaN)
    * loses to any real one. */
  def withClusterId(vecs: DataFrame, centroids: Seq[(Int, Seq[Double])],
      vecCol: String = "vec"): DataFrame =
    vecs.withColumn("cluster_id",
      nearestCandidate(col(vecCol), centroids).getField("cluster_id"))

  /** [[withClusterId]] plus the winning similarity itself —
    * `(…, cluster_id, proto_sim)` in the same single zero-exchange
    * projection. `proto_sim` is the cosine to the assigned centroid
    * (the SSL-prototype "prototypicality" of the vector, cf.
    * arXiv:2206.14486), null for a degenerate vector whose every
    * candidate similarity was NaN. */
  def withClusterSim(vecs: DataFrame, centroids: Seq[(Int, Seq[Double])],
      vecCol: String = "vec"): DataFrame =
    vecs.withColumn("__win", nearestCandidate(col(vecCol), centroids))
      .withColumn("cluster_id", col("__win").getField("cluster_id"))
      .withColumn("proto_sim",
        when(col("__win").getField("neg_sim") === lit(Double.PositiveInfinity),
          lit(null).cast("double"))
          .otherwise(-col("__win").getField("neg_sim")))
      .drop("__win")

  /** The winning (neg_sim, cluster_id) struct of the nearest literal
    * centroid — shared by [[withClusterId]] (assignment) and
    * [[reseedCentroids]] (farthest-point distance): two hand-copied
    * candidate trees would let assignment and repair disagree on the
    * degenerate-vector convention. neg_sim = -cosine, with null/NaN
    * folded to +Inf so a degenerate similarity loses to any real one. */
  private def nearestCandidate(vec: Column,
      centroids: Seq[(Int, Seq[Double])]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val candidates = centroids.map { case (cid, cv) =>
      struct(
        coalesce(-nanvl(cosine(vec, array(cv.map(lit(_)): _*)),
            lit(null).cast("double")),
          lit(Double.PositiveInfinity)).as("neg_sim"),
        lit(cid).as("cluster_id"))
    }
    array_min(array(candidates: _*))
  }

  /** [[withClusterId]] projected to (idCol, cluster_id) — the map-only
    * twin of [[assign]]. */
  def assignInline(vecs: DataFrame, centroids: Seq[(Int, Seq[Double])],
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame =
    withClusterId(vecs, centroids, vecCol)
      .select(col(idCol), col("cluster_id"))

  /** IVF top-k search: probe the nprobe nearest inverted lists per
    * query, exact cosine inside the probed lists. Assigns the corpus to
    * lists inline — use [[IndexStore]] to persist the lists and probe
    * them without the per-query assignment cost. */
  def topK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame =
    topKFromLists(withClusterId(corpus, collectCentroids(centroids), vecCol),
      queries, centroids, k, nprobe, idCol, vecCol)

  /** IVF served entirely in the JL-PROJECTED space with a full-dim
    * re-rank — the composition of the engine's two ANN cost levers:
    * training, list assignment, and probe selection all run over
    * `dimOut`-dim [[Embeddings.jlProject]] projections (64→16 is 4×
    * cheaper per dot product and 4× smaller index storage), the probe
    * overfetches `k × overfetch` candidates per query in the projected
    * metric (the guard band: JL distortion at the k boundary must not
    * drop a true neighbor), and the FINAL order is the exact
    * full-dimension cosine over that bounded candidate set — quality
    * decided by the true metric, paid only on candidates. The
    * projected corpus pins once (each Lloyd iteration re-evaluates its
    * input; unpinned, the projection would recompute per step), and
    * the re-rank joins broadcast the candidate set against the corpus
    * — the corpus never shuffles. Recall floor vs the full-dim exact
    * top-k is spec'd in EmbeddingsSpec. */
  def topKJlServed(corpus: DataFrame, queries: DataFrame, dimIn: Int,
      dimOut: Int, k: Int, nprobe: Int, kClusters: Int = 16,
      overfetch: Int = 4, idCol: String = "vec_id",
      vecCol: String = "vec"): DataFrame = {
    val projC = Ops.checkpointKeepPartitioning(
      Embeddings.jlProject(corpus, dimIn, dimOut, vecCol, "proj")
        .select(col(idCol), col("proj").as(vecCol)))
    val centroids = trainCentroids(projC, kClusters, iters = 2,
      idCol, vecCol, dim = dimOut)
    val lists = withClusterId(projC, collectCentroids(centroids), vecCol)
    val projQ = Embeddings.jlProject(queries, dimIn, dimOut, vecCol, "proj")
      .select(col(idCol), col("proj").as(vecCol))
    val cand = topKFromLists(lists, projQ, centroids,
      k * overfetch, nprobe, idCol, vecCol)
    val withQ = cand.select("query_id", "neighbor_id")
      .join(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qf")), "query_id")
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__nf"))
      .join(broadcast(withQ), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qf"), col("__nf")).as("cos_raw"))
    Similarity.rankTopK(scored, k)
  }

  /** The nprobe nearest inverted lists per query: (q_<idCol>, q_vec,
    * cluster_id) — shared probe-selection step of [[topKFromLists]] and
    * [[topKFromQuantizedLists]]. Centroids broadcast; the per-query
    * window is over an unbounded-cardinality key. */
  private[operators] def probedClusters(queries: DataFrame, centroids: DataFrame,
      nprobe: Int, idCol: String, vecCol: String): DataFrame = {
    val probeW = Window.partitionBy(col(s"q_$idCol"))
      .orderBy(col("__sim").desc, col("cluster_id").asc)
    queries
      .select(col(idCol).as(s"q_$idCol"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(centroids))
      // nanvl, like assign/withClusterId: NaN sorts ABOVE every real
      // double under desc, so a degenerate centroid would win a probe
      // slot for every query; folded to null it sorts last instead
      .withColumn("__sim",
        nanvl(cosine(col("q_vec"), col("centroid")), lit(null).cast("double")))
      .withColumn("__rk", row_number().over(probeW))
      .where(col("__rk") <= nprobe)
      .select(col(s"q_$idCol"), col("q_vec"), col("cluster_id"))
  }

  /** Probe path over pre-assigned inverted lists (rows carry idCol,
    * vecCol, cluster_id). */
  def topKFromLists(lists: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame = {
    val probes = probedClusters(queries, centroids, nprobe, idCol, vecCol)
    val scored = probes.join(lists, Seq("cluster_id"))
      .where(col(s"q_$idCol") =!= col(idCol))
      .select(col(s"q_$idCol").as("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("q_vec"), col(vecCol)).as("cos_raw"))
    Similarity.rankTopK(scored, k)
  }

  /** Near-dup probe over pre-assigned inverted lists: for each query
    * vector, every indexed vector with cosine ≥ `threshold` among the
    * nprobe nearest lists' members — [[graft.operators.IndexStore.probeSrpNearDup]]'s
    * contract served from a TRAINED coarse quantizer instead of
    * data-independent hyperplanes. No top-k truncation: the gate wants
    * every above-threshold match, and each corpus vector lives in
    * exactly one list so no pair can surface twice. Same NaN guard and
    * raw-threshold/rounded-display split as the SRP twin. */
  def nearDupFromLists(lists: DataFrame, queries: DataFrame,
      centroids: DataFrame, threshold: Double, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame =
    probedClusters(queries, centroids, nprobe, idCol, vecCol)
      .join(lists, Seq("cluster_id"))
      .where(col(s"q_$idCol") =!= col(idCol))
      .select(col(s"q_$idCol").as("query_id"), col(idCol).as("match_id"),
        cosine(col("q_vec"), col(vecCol)).as("cos_raw"))
      .where(col("cos_raw").isNotNull && !isnan(col("cos_raw")) &&
        col("cos_raw") >= threshold)
      .select(col("query_id"), col("match_id"),
        round(col("cos_raw"), 6).as("cos_sim"))

  /** [[nearDupFromLists]] over QUANTIZED inverted lists: the duplicate
    * check served from int8 codes + per-vector scale, dequantized
    * inside the cosine kernel — no fp copy of the index exists. A
    * threshold on a DEQUANTIZED cosine can flip boundary pairs, so the
    * filter runs at `threshold - guardBand`: a true ≥-threshold pair is
    * never lost to grid error (measured error on unit-scale 64-dim
    * embeddings is ~1e-4; the default band is 10× that), at the cost of
    * admitting pairs up to `guardBand` BELOW the threshold — the
    * documented precision trade of quantized serving. Callers that need
    * exact decisions keep fp lists ([[nearDupFromLists]]). */
  def nearDupFromQuantizedLists(lists: DataFrame, queries: DataFrame,
      centroids: DataFrame, threshold: Double, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "vec",
      guardBand: Double = 0.001): DataFrame =
    probedClusters(queries, centroids, nprobe, idCol, vecCol)
      .join(lists, Seq("cluster_id"))
      .where(col(s"q_$idCol") =!= col(idCol))
      .select(col(s"q_$idCol").as("query_id"), col(idCol).as("match_id"),
        cosine(col("q_vec"),
          graft.functions.Quantize.int8Dequantize(
            col("codes").cast("array<double>"), col("scale"))).as("cos_raw"))
      .where(col("cos_raw").isNotNull && !isnan(col("cos_raw")) &&
        col("cos_raw") >= threshold - guardBand)
      .select(col("query_id"), col("match_id"),
        round(col("cos_raw"), 6).as("cos_sim"))

  /** Probe path over QUANTIZED inverted lists (rows carry idCol, int8
    * `codes` as array<tinyint>, `scale`, cluster_id) — the 100 TB
    * serving shape: the probed-list scan reads ~4-8× fewer bytes than
    * fp64 lists, and reconstruction (q/s per element) happens INSIDE the
    * scoring kernel via the native codegen'd Int8Dequantize — no
    * materialized fp64 copy of the index ever exists. Queries stay fp
    * under `vecCol`. Recall vs the fp probe is pinned in
    * IndexStoreSpec (≥ 0.9 @10). */
  def topKFromQuantizedLists(lists: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame = {
    val probes = probedClusters(queries, centroids, nprobe, idCol, vecCol)
    val scored = probes.join(lists, Seq("cluster_id"))
      .where(col(s"q_$idCol") =!= col(idCol))
      .select(col(s"q_$idCol").as("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("q_vec"),
          graft.functions.Quantize.int8Dequantize(
            col("codes").cast("array<double>"), col("scale"))).as("cos_raw"))
    Similarity.rankTopK(scored, k)
  }
}
