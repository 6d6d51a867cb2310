package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN serving (Jégou, Douze & Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
  * the last rung of the engine's embedding-memory ladder: float64
  * compute vectors (512 B at dim 64) → int8+scale (~68 B,
  * [[Similarity.int8Scale]]) → PQ codes (m small ints — 8 B at m = 8,
  * a 64× reduction), which is what lets a 100 TB embedding store serve
  * candidate scans from RAM.
  *
  * The d-dim space splits into m contiguous subspaces of d/m dims;
  * each subspace trains its own ksub-centroid codebook through the
  * engine's deterministic Lloyd loop ([[IvfIndex.trainCentroids]] on
  * the sliced corpus — empty-cluster reseeds and id tie-breaks
  * included, so codebooks are a pure function of the data, no RNG).
  * A vector's code word is its per-subspace L2-nearest centroid
  * (`argmin |x_s − c|²`, evaluated as `argmax 2⟨x_s,c⟩ − |c|²` with
  * ties to the lower code — both engines' float sums agree because
  * the centroid literals are identical). Vectors are L2-NORMALIZED
  * before everything, so queries answer COSINE by asymmetric distance
  * computation: cos(q, x) ≈ Σ_s ⟨q̂_s, book_s[code_s(x)]⟩ — per
  * (query, candidate) the scan is m array lookups into the query's
  * precomputed partial-product table, never a d-dim float pass.
  *
  * Scale shape: codebooks are m×ksub×(d/m) driver literals (bounded by
  * construction, the IVF-centroid convention); encoding is ONE
  * zero-exchange projection over literal codebooks; the ADC scan
  * broadcasts only the query-side LUT rows and streams the m-int
  * codes. Approximation quality is spec'd in PqSpec (planted-copy
  * top-1, recall floor vs the exact scan, ADC-vs-cosine error band) —
  * rows-only at the driver gate: m chained k-means trainings are not
  * oracle SQL.
  */
object Pq {

  /** L2-normalize (zero vectors pass through — they can never win a
    * cosine ranking anyway). Two-step projection: the norm scalar is
    * computed once per row, never re-inlined into each array slot. */
  private def normalized(vecs: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vecs
      .select(col(idCol), col(vecCol),
        sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__nrm"))
      .select(col(idCol),
        when(col("__nrm") > 0,
          transform(col(vecCol), x => x / col("__nrm")))
          .otherwise(col(vecCol)).as(vecCol))

  /** Trains the m codebooks over the normalized corpus slices:
    * (subspace, code, centroid) with ksub codes per subspace. */
  def trainCodebooks(vecs: DataFrame, dim: Int, m: Int = 8,
      ksub: Int = 16, iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "vec"): Seq[(Int, Int, Seq[Double])] = {
    require(dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val dsub = dim / m
    // pinned: m training loops each re-read the normalized corpus
    val normed = Ops.checkpointKeepPartitioning(
      normalized(vecs, idCol, vecCol))
    (0 until m).flatMap { s =>
      val sliced = normed.select(col(idCol),
        slice(col(vecCol), s * dsub + 1, dsub).as(vecCol))
      IvfIndex.collectCentroids(
          IvfIndex.trainCentroids(sliced, ksub, iters, idCol, vecCol,
            dsub))
        .map { case (c, cent) => (s, c, cent) }
    }
  }

  /** Per-subspace code: argmax of `2⟨x_s,c⟩ − |c|²` over the literal
    * codebook, ties to the lower code (the greatest-struct kernel —
    * score first, negated code second, so the max struct carries the
    * smallest winning code). */
  private def codeFor(xs: Column, book: Seq[(Int, Seq[Double])]): Column =
    (-greatest(book.map { case (c, cent) =>
      struct(
        (lit(2.0) * Similarity.dot(xs, array(cent.map(lit): _*))
          - lit(cent.map(x => x * x).sum)).as("s"),
        lit(-c).as("negc"))
    }: _*).getField("negc")).cast("int")

  /** Encodes every vector as its m-int PQ code word — one
    * zero-exchange projection: `(idCol, codes array<int>)`. */
  def encode(vecs: DataFrame, books: Seq[(Int, Int, Seq[Double])],
      dim: Int, idCol: String = "vec_id", vecCol: String = "vec")
      : DataFrame = {
    val m = books.map(_._1).max + 1
    val dsub = dim / m
    normalized(vecs, idCol, vecCol)
      .select(col(idCol), array((0 until m).map { s =>
        codeFor(slice(col(vecCol), s * dsub + 1, dsub),
          books.filter(_._1 == s).sortBy(_._2).map(b => (b._2, b._3)))
      }: _*).as("codes"))
  }

  /** Approximate top-k by ADC over the code store: the query side
    * carries its m×ksub partial-product table (one literal-codebook
    * projection per query row, broadcast); each candidate costs m
    * array lookups. Output shape matches [[Similarity.cosineTopK]]
    * (`query_id, rank, neighbor_id, cos_sim`), scores being the ADC
    * approximation of the cosine. */
  /** The per-query m×ksub partial-product table: `(query_id, __lut)` —
    * one literal-codebook projection per query row. */
  private def lutFor(queries: DataFrame,
      books: Seq[(Int, Int, Seq[Double])], dim: Int, idCol: String,
      vecCol: String): DataFrame = {
    val m = books.map(_._1).max + 1
    val dsub = dim / m
    normalized(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), array((0 until m).map { s =>
        val qs = slice(col(vecCol), s * dsub + 1, dsub)
        array(books.filter(_._1 == s).sortBy(_._2).map { case (_, _, c) =>
          Similarity.dot(qs, array(c.map(lit): _*))
        }: _*)
      }: _*).as("__lut"))
  }

  /** The ADC score: m lookups of `codes` into the query's `__lut`. */
  private def adcScore(m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(
        element_at(col("__lut"), (s + 1).cast("int")),
        element_at(col("codes"), (s + 1).cast("int")) + 1))

  def adcTopK(codes: DataFrame, queries: DataFrame,
      books: Seq[(Int, Int, Seq[Double])], dim: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame = {
    val m = books.map(_._1).max + 1
    val lut = lutFor(queries, books, dim, idCol, vecCol)
    val par = codes.sparkSession.sparkContext.defaultParallelism
    val scored = codes.repartition(par)
      .join(broadcast(lut), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        adcScore(m).as("cos_raw"))
    Similarity.rankTopK(scored, k)
  }

  /** IVFADC — the FAISS production shape, this engine's two candidate
    * levers composed: the coarse quantizer (the deterministic Lloyd
    * loop again) routes each query to its `nprobe` nearest inverted
    * lists, and ADC scores ONLY those lists' code words — candidate
    * volume drops ~nprobe/kClusters before the first lookup, and the
    * scan that remains is m bytes per candidate. The code lists stay
    * put keyed by cluster; only the broadcast (query, LUT) rows move. */
  def adcTopKIvf(corpus: DataFrame, queries: DataFrame,
      books: Seq[(Int, Int, Seq[Double])], dim: Int, k: Int,
      nprobe: Int, kClusters: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "vec"): DataFrame = {
    val m = books.map(_._1).max + 1
    val pinned = Ops.checkpointKeepPartitioning(
      corpus.select(col(idCol), col(vecCol)))
    val cent = IvfIndex.trainCentroids(pinned, kClusters, iters,
      idCol, vecCol, dim)
    val lists = IvfIndex
      .withClusterId(pinned, IvfIndex.collectCentroids(cent), vecCol)
      .select(col(idCol), col("cluster_id"))
      .join(encode(pinned, books, dim, idCol, vecCol), idCol)
    val probes = IvfIndex
      .probedClusters(queries, cent, nprobe, idCol, vecCol)
      .select(col(s"q_$idCol").as("query_id"), col("cluster_id"))
    val lut = lutFor(queries, books, dim, idCol, vecCol)
    val scored = lists
      .join(broadcast(probes.join(lut, "query_id")), Seq("cluster_id"))
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        adcScore(m).as("cos_raw"))
    Similarity.rankTopK(scored, k)
  }

  /** ADC candidates re-ranked by the EXACT cosine: overfetch
    * `overfetch` candidates per query from the code scan, join their
    * FULL vectors back (a candidate-sized join — queries × overfetch
    * rows, never the corpus), score exactly, keep k. The
    * JL-serving guard-band pattern applied to PQ: the cheap scan
    * proposes, full precision disposes — output ordering is exact
    * over whatever the codes surfaced. */
  def adcTopKReranked(codes: DataFrame, corpus: DataFrame,
      queries: DataFrame, books: Seq[(Int, Int, Seq[Double])], dim: Int,
      k: Int, overfetch: Int = 4, idCol: String = "vec_id",
      vecCol: String = "vec"): DataFrame = {
    val cands = adcTopK(codes, queries, books, dim, k * overfetch,
        idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val scored = cands
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__nv")), "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__qv"), col("__nv")).as("cos_raw"))
    Similarity.rankTopK(scored, k)
  }
}
