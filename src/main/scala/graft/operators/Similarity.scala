package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity over an embedding column (array<float>).
  *
  * The arithmetic is a strict left-to-right double fold
  * (aggregate ∘ zip_with) so results are bit-deterministic and
  * reproducible across engines — the DuckDB oracle mirrors the same fold.
  * All operators are expression-only (no UDF): they run inside
  * whole-stage codegen and scale by partitioning, not driver loops.
  */
object Similarity {

  /** array<float> → array<double>, the canonical compute type. Native
    * codegen'd widening (the ArrayTransform form is CodegenFallback and
    * runs once per scanned embedding row). */
  def toDoubleArray(c: Column): Column =
    graft.functions.VectorCast.toDoubleArray(c)

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity dot/(|a|·|b|), same fold shape as the oracle.
    * Delegates to the native codegen'd [[graft.functions.CosineSim]]
    * expression — Spark's higher-order functions are CodegenFallback
    * (interpreted per row), which would put an interpreter in the
    * innermost ANN loop. Bit-identical to [[cosineFold]] (asserted in
    * SimilaritySpec); every ANN oracle hash-matches through it. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Cosine.cosineSim(a, b)

  /** The expression-tree formulation of [[cosine]] — the oracle-shaped
    * parity reference (three explicit sequential folds). */
  def cosineFold(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Symmetric per-vector int8 quantization scale: 127 / max|x|, null
    * for the all-zero vector. Quantized storage is the 100 TB ANN
    * memory lever — 4× smaller than float32, 8× smaller than the
    * compute-side double, at a bounded cosine error (≤ 1/254 of the
    * max component per dimension). Native codegen'd expression (the
    * HOF tree is CodegenFallback and this pass touches every corpus
    * embedding); [[int8ScaleFold]] is the bit-identical parity twin. */
  def int8Scale(vec: Column): Column =
    graft.functions.Quantize.int8Scale(vec)

  /** Expression-tree twin of [[int8Scale]] — parity reference. */
  def int8ScaleFold(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x)))
    when(maxAbs > lit(0.0), lit(127.0) / maxAbs)
  }

  /** int8 codes in [-127, 127] under `scale` ([[int8Scale]]). floor(x·s
    * + 0.5), not round(): identical halfway behavior across engines.
    * Values are exact small integers carried as doubles for arithmetic;
    * cast to `array<tinyint>` at the storage boundary. The zero vector
    * (null scale) maps to zeros. Native; [[int8CodesFold]] is the
    * parity twin (the 0.0 coalesce encodes the twin's null-scale
    * branch — a real scale is > 0 by construction). */
  def int8Codes(vec: Column, scale: Column): Column =
    graft.functions.Quantize.int8Codes(vec, coalesce(scale, lit(0.0)))

  /** Expression-tree twin of [[int8Codes]] — parity reference. */
  def int8CodesFold(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale.isNull, lit(0.0)).otherwise(floor(x * scale + lit(0.5))))

  /** Dequantized reconstruction q/s (zeros for the zero vector) — the
    * probe-side form that ANN search runs cosine against. Native;
    * [[int8DequantizeFold]] is the parity twin. */
  def int8Dequantize(codes: Column, scale: Column): Column =
    graft.functions.Quantize.int8Dequantize(codes, coalesce(scale, lit(0.0)))

  /** Expression-tree twin of [[int8Dequantize]] — parity reference. */
  def int8DequantizeFold(codes: Column, scale: Column): Column =
    transform(codes, q => when(scale.isNull, lit(0.0)).otherwise(q / scale))

  /** Coarse partitioning key: sign bits of the first `dims` components
    * packed into an int. Scale-invariant vectors (and so near-identical
    * embeddings) map to the same block. */
  def signBlock(vec: Column, dims: Int = 8): Column =
    // try_element_at: a malformed short vector contributes 0 bits for
    // its missing dims instead of raising INVALID_ARRAY_INDEX under
    // ANSI mode — same degrade-to-harmless stance as the null guards
    (0 until dims)
      .map(i => when(try_element_at(vec, lit(i + 1)) > 0, lit(1 << i))
        .otherwise(lit(0)))
      .reduce(_ + _)

  /** Shared top-k tail: rank scored (query_id, neighbor_id, cos_raw)
    * rows per query by descending similarity (neighbor id breaks ties),
    * keep k, round the reported score. One definition so every ANN
    * variant (brute, blocked, SRP, IVF) ranks identically.
    *
    * Implemented with the mergeable bounded-heap aggregator
    * ([[VectorAgg.TopK]]): map-side partials keep k rows per query per
    * partition, so the ranking shuffle carries ~k·partitions rows per
    * query instead of every scored candidate — the windowed form
    * ([[rankTopKWindow]]) shuffles and sorts the full candidate set.
    * Both produce identical rows (asserted in SimilaritySpec); every
    * ANN oracle hash-matches through this path.
    *
    * Null-scored candidates (cosine of a zero-norm or malformed vector
    * is null by design) are dropped before ranking — they carry no
    * similarity information; the window form would only ever surface
    * them when a query has fewer than k real candidates. NaN scores
    * (a NaN/Infinity element in a vector makes the whole fold NaN) are
    * dropped for the same reason — Spark and the TopK comparator both
    * order NaN ABOVE every real double, so one poisoned corpus vector
    * would otherwise become the rank-1 neighbor of every query. */
  def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .where(col("cos_raw").isNotNull && !isnan(col("cos_raw")) &&
        col("neighbor_id").isNotNull)
      .groupBy("query_id")
      .agg(VectorAgg.topK(col("neighbor_id"), col("cos_raw"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.neighbor_id").as("neighbor_id"),
        round(col("col.cos_raw"), 6).as("cos_sim"))

  /** The windowed formulation of [[rankTopK]] — the oracle-shaped
    * kernel (row_number over a per-query sort). Kept as the parity
    * reference; the aggregator path is the scale path. */
  def rankTopKWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    scored
      // same null/NaN drop as rankTopK — the two kernels must stay
      // value-identical on every input (parity spec)
      .where(col("cos_raw").isNotNull && !isnan(col("cos_raw")) &&
        col("neighbor_id").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos_sim"))
  }

  /** Brute-force exact top-k cosine neighbors of each query vector.
    * The query set broadcasts (it is small by construction); the corpus
    * streams through one scan, then a per-query window picks top-k. This
    * is the baseline/ground-truth path. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame = {
    // single-file test inputs arrive as one split; spread the fold math
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val scored = corpus.repartition(par).alias("c")
      .join(broadcast(queries.alias("q")),
        col(s"c.$idCol") =!= col(s"q.$idCol"))
      .select(col(s"q.$idCol").as("query_id"), col(s"c.$idCol").as("neighbor_id"),
        cosine(col(s"q.$vecCol"), col(s"c.$vecCol")).as("cos_raw"))
    rankTopK(scored, k)
  }

  /** Approximate top-k: candidates restricted to the query's sign block —
    * the 100 TB scale path (bucketed join instead of full cross product).
    * Recall depends on block size: near-duplicates always collide (sign
    * pattern is scale-invariant); genuinely novel neighbors may not. Use
    * more/fewer `dims` to trade recall vs candidate count. */
  def cosineTopKBlocked(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "vec",
      blockDims: Int = 8): DataFrame = {
    val cb = corpus.withColumn("block", signBlock(col(vecCol), blockDims))
    val qb = queries.withColumn("block", signBlock(col(vecCol), blockDims))
    val scored = cb.alias("c")
      .join(broadcast(qb.alias("q")),
        col("c.block") === col("q.block") && col(s"c.$idCol") =!= col(s"q.$idCol"))
      .select(col(s"q.$idCol").as("query_id"), col(s"c.$idCol").as("neighbor_id"),
        cosine(col(s"q.$vecCol"), col(s"c.$vecCol")).as("cos_raw"))
    rankTopK(scored, k)
  }

  /** Embedding near-duplicate pairs, blocked by sign signature: pairs in
    * the same block with cosine ≥ threshold. The block join keeps the
    * pair count ~n²/2^dims instead of n². */
  def blockedNearDupPairs(vecs: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "vec",
      blockDims: Int = 8): DataFrame = {
    val blocked = vecs.withColumn("block", signBlock(col(vecCol), blockDims))
    blocked.alias("a")
      .join(blocked.alias("b"),
        col("a.block") === col("b.block") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos_raw"))
      // NaN guard like rankTopK/probeSrpNearDup: Spark ORDERS NaN above
      // every double, so a poisoned vector would otherwise pair with its
      // entire block. Threshold on the RAW cosine, round only the output
      // column — rounding first would let a value up to 5e-7 below the
      // threshold round itself across the boundary.
      .where(col("cos_raw").isNotNull && !isnan(col("cos_raw")) &&
        col("cos_raw") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("cos_raw"), 6).as("cos_sim"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    * arXiv:2303.09540): assign every vector to its nearest centroid,
    * then drop every vector that has a SMALLER-id near-duplicate
    * (cosine ≥ threshold) inside its cluster — one representative per
    * duplicate set survives, and cross-cluster pairs are by design
    * never compared (that approximation is the whole point: the
    * quadratic pair search shrinks from n² to Σ cluster²).
    *
    * Returns the KEPT rows as (idCol, cluster_id).
    *
    * Scale shape: assignment is the map-only literal-centroid
    * projection ([[IvfIndex.withClusterId]] — zero exchanges, no row
    * blow-up), so the only corpus-sized shuffles are the self-join on
    * cluster_id and the id anti-join. At warehouse scale k is chosen
    * so clusters stay small (k ≈ n / target_cluster_size — SemDeDup
    * used 11k clusters for 1.3e9 docs), which bounds the per-cluster
    * quadratic term; a pathologically hot cluster is a quantizer
    * problem (retrain with larger k), not a join problem. The NaN
    * guard mirrors [[blockedNearDupPairs]]: a degenerate cosine must
    * not pair a poisoned vector with its whole cluster. */
  def semanticDedup(vecs: DataFrame, centroids: Seq[(Int, Seq[Double])],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "vec",
      hotClusterThreshold: Int = DefaultHotClusterThreshold): DataFrame =
    dedupAssigned(IvfIndex.withClusterId(vecs, centroids, vecCol),
      threshold, idCol, vecCol, hotClusterThreshold)

  /** [[semanticDedup]] for warehouse-scale k: literal-centroid
    * assignment embeds k×dim constants in ONE projection, which is the
    * fastest shape up to k ≈ 100 but grows the expression tree (and
    * eventually trips codegen size limits) linearly with k — SemDeDup
    * at corpus scale wants k in the thousands. This variant assigns
    * through [[IvfIndex.assign]]'s broadcast crossJoin + per-id
    * row_number instead (k rows per vector, pruned immediately; the
    * centroid TABLE broadcasts, so the corpus still never shuffles for
    * assignment), then shares the exact pair/anti dedup logic.
    * Bit-identical to the literal form for any k (same cosine kernel,
    * same tie contract) — parity spec'd in SimilaritySpec. */
  def semanticDedupJoin(vecs: DataFrame, centroids: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "vec",
      hotClusterThreshold: Int = DefaultHotClusterThreshold): DataFrame =
    dedupAssigned(
      vecs.join(IvfIndex.assign(vecs, centroids, idCol, vecCol), idCol),
      threshold, idCol, vecCol, hotClusterThreshold)

  /** [[semanticDedup]] served from int8-QUANTIZED vectors — the
    * read-mostly shape at 100 TB storage cost (4–8× smaller than fp,
    * the ext_ivf/srp_neardup_quant precedent): vectors round-trip
    * through the codegen'd int8 scale/code/dequantize kernel before
    * assignment and the pair checks, and the near-dup threshold gets a
    * GUARD BAND — quantization grid error moves a cosine by at most a
    * few 1e-4, so checking `cos ≥ threshold − guardBand` keeps every
    * TRUE near-dup pair detectable from the quantized codes (erring,
    * when it errs, toward dropping an extra borderline near-dup — the
    * safe direction for dedup). Same cluster-keyed shuffle shape and
    * hot-cluster cap as the fp form. Agreement with the fp keeper set
    * and planted-copy recall are spec'd in SimilaritySpec. */
  def semanticDedupQuantized(vecs: DataFrame,
      centroids: Seq[(Int, Seq[Double])], threshold: Double,
      guardBand: Double = 0.001, idCol: String = "vec_id",
      vecCol: String = "vec",
      hotClusterThreshold: Int = DefaultHotClusterThreshold): DataFrame = {
    require(guardBand >= 0 && guardBand < threshold,
      s"guardBand=$guardBand must sit inside [0, threshold=$threshold)")
    import graft.functions.Quantize
    val scale = Quantize.int8Scale(col(vecCol))
    val served = vecs
      .withColumn("__qsc", scale)
      .select(col(idCol),
        Quantize.int8Dequantize(
          Quantize.int8Codes(col(vecCol), col("__qsc")), col("__qsc"))
          .as(vecCol))
      // an all-zeros vector has no scale (null) — it can never near-dup
      // anything at a positive threshold, so it passes through as kept
      // rather than poisoning the kernel (the NaN-guard stance)
      .where(col(vecCol).isNotNull)
      .unionByName(vecs.withColumn("__qsc", scale)
        .where(col("__qsc").isNull).select(col(idCol), col(vecCol)))
    semanticDedup(served, centroids, threshold - guardBand, idCol, vecCol,
      hotClusterThreshold)
  }

  /** Cluster-population cap above which the within-cluster all-pairs
    * join is replaced by star-checking members against the cluster
    * representative (minimum id) — the same bounded-work trade as
    * [[Dedup.DefaultHotBandThreshold]], for the same pathology: a
    * degenerate cluster (mis-sized k, a boilerplate embedding repeated
    * thousands of times, an all-zeros failure mode upstream) otherwise
    * contributes m(m-1)/2 cosine pairs on one reducer. Star members
    * drop iff they near-dup the representative; activity is OBSERVED
    * (`IndexStore.capActivity`), never silent. */
  val DefaultHotClusterThreshold = 1000

  /** Shared dedup choreography over an assigned (idCol, vecCol,
    * cluster_id) frame: drop every vector with a smaller-id
    * within-cluster near-duplicate. The sizing window partitions by
    * cluster_id — the key the self-join shuffles on anyway — and the
    * checkpoint boundary keeps that partitioning (the frame feeds both
    * join sides plus the anti-join base, so without the boundary the
    * assignment cosine work runs three times). */
  private def dedupAssigned(assignedRaw: DataFrame, threshold: Double,
      idCol: String, vecCol: String,
      hotClusterThreshold: Int): DataFrame = {
    require(hotClusterThreshold >= 2,
      s"hotClusterThreshold=$hotClusterThreshold: a cluster needs at " +
        "least two members to form a pair")
    val w = Window.partitionBy("cluster_id")
    val sizedFrame = assignedRaw
      .withColumn("__cn", count(lit(1)).over(w))
      .withColumn("__crep", min(col(idCol)).over(w))
    val sized = IndexStore.observeCap(
      Ops.checkpointKeepPartitioning(sizedFrame,
        reliable = sizedFrame.sparkSession.conf
          .getOption(Dedup.ReliableBoundaryConf).contains("true")),
      col("__cn") > hotClusterThreshold && col(idCol) =!= col("__crep"),
      col("__cn") > hotClusterThreshold, col("__cn"))
    def cosOk(c: Column): Column =
      c.isNotNull && !isnan(c) && c >= threshold
    val small = sized.where(col("__cn") <= hotClusterThreshold)
    val a = small.select(col(idCol).as("id_a"), col("cluster_id"),
      col(vecCol).as("__va"))
    val b = small.select(col(idCol).as("id_b"),
      col("cluster_id").as("__cb"), col(vecCol).as("__vb"))
    val smallDropped = a
      .join(b, col("cluster_id") === col("__cb") && col("id_b") < col("id_a"))
      .withColumn("__cos", cosine(col("__va"), col("__vb")))
      .where(cosOk(col("__cos")))
      .select(col("id_a").as(idCol))
    // hot clusters: members check against the representative only
    // (rep = min id, so the drop direction is already smaller-id-wins)
    val reps = sized
      .where(col("__cn") > hotClusterThreshold && col(idCol) === col("__crep"))
      .select(col("cluster_id").as("__cr"), col(vecCol).as("__vr"))
    val hotDropped = sized
      .where(col("__cn") > hotClusterThreshold && col(idCol) =!= col("__crep"))
      .join(reps, col("cluster_id") === col("__cr"))
      .withColumn("__cos", cosine(col(vecCol), col("__vr")))
      .where(cosOk(col("__cos")))
      .select(col(idCol))
    sized.select(col(idCol), col("cluster_id"))
      .join(smallDropped.unionByName(hotDropped), Seq(idCol), "left_anti")
  }
}
