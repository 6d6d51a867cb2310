package graft.operators

import breeze.linalg.{eigSym, DenseMatrix}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding-space preprocessing: mean-centering + PCA whitening — the
  * standard conditioning step before cosine ANN / semantic dedup when
  * the embedding model leaves anisotropic directions (whitened spaces
  * make cosine thresholds comparable across corpora). The fit is ONE
  * distributed pass: a mergeable Gram-matrix Aggregator accumulates
  * (n, Σx, Σxxᵀ) map-side — dim² doubles per partition, the classic
  * bounded-state shape — and the dim×dim eigensolve runs on the driver
  * (same footprint class as the k×dim centroid collects). Transform is
  * a pure projection with the whitening rows as plan literals.
  */
object Embeddings {

  /** (count, Σx, Σxxᵀ flattened row-major). */
  final case class GramBuf(n: Long, sums: Array[Double], gram: Array[Double])

  /** Mergeable second-moment aggregator. The per-row outer product is
    * dim² multiply-adds — this is a FIT-time pass over a sample or
    * corpus, not an inner serving loop. */
  class Gram(dim: Int) extends Aggregator[Array[Double], GramBuf, GramBuf] {
    override def zero: GramBuf =
      GramBuf(0L, new Array[Double](dim), new Array[Double](dim * dim))
    override def reduce(b: GramBuf, v: Array[Double]): GramBuf = {
      // fail loudly on ragged input: padding a short vector with zeros
      // while still counting it would silently bias the mean and
      // covariance — a malformed embedding must surface as an error,
      // the same stance fitWhitening takes on bad k/n
      require(v != null && v.length == dim,
        s"Gram aggregator expects dim=$dim vectors, got " +
          (if (v == null) "null" else s"length=${v.length}"))
      var i = 0
      while (i < dim) {
        b.sums(i) += v(i)
        var j = 0
        while (j < dim) {
          b.gram(i * dim + j) += v(i) * v(j); j += 1
        }
        i += 1
      }
      GramBuf(b.n + 1, b.sums, b.gram)
    }
    override def merge(a: GramBuf, b: GramBuf): GramBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      var t = 0
      while (t < dim * dim) { a.gram(t) += b.gram(t); t += 1 }
      GramBuf(a.n + b.n, a.sums, a.gram)
    }
    override def finish(b: GramBuf): GramBuf = b
    override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  }

  /** mean + k whitening rows (each already scaled by 1/√(λ+eps)). */
  final case class WhiteningModel(mean: Seq[Double], rows: Seq[Seq[Double]])

  /** Fits mean + top-k PCA whitening rows. Eigenvector sign is fixed
    * (largest-|entry| component positive, ties to the lowest index) so
    * the model is a pure function of the covariance; the covariance
    * itself is a float sum, so last-ulp wobble across partition
    * schedules is inherent — consumers should assert the whitening
    * CONTRACT (unit variance, zero mean, diagonal covariance), which
    * is rotation- and ulp-stable, rather than matrix bits. */
  def fitWhitening(vecs: DataFrame, vecCol: String = "vec", k: Int = 16,
      eps: Double = 1e-9): WhiteningModel = {
    val dim = vecs.select(size(col(vecCol))).head().getInt(0)
    require(k >= 1 && k <= dim, s"k=$k out of range for dim=$dim")
    val spark = vecs.sparkSession
    import spark.implicits._
    val buf = vecs
      .select(udaf(new Gram(dim), ExpressionEncoder[Array[Double]]())
        .apply(col(vecCol).cast("array<double>")).as("g"))
      .select("g.n", "g.sums", "g.gram")
      .as[GramBuf].head()
    require(buf.n > 1, s"fitWhitening needs >1 vectors, got ${buf.n}")
    val n = buf.n.toDouble
    val mu = buf.sums.map(_ / n)
    val cov = DenseMatrix.tabulate(dim, dim)((i, j) =>
      buf.gram(i * dim + j) / n - mu(i) * mu(j))
    val es = eigSym(cov) // eigenvalues ascending
    val rows = ((dim - k) until dim).reverse.map { j =>
      val v = es.eigenvectors(::, j)
      val m = (0 until dim).maxBy(i => (math.abs(v(i)), -i))
      val sign = if (v(m) < 0) -1.0 else 1.0
      val scale = sign / math.sqrt(math.max(es.eigenvalues(j), 0.0) + eps)
      (0 until dim).map(i => v(i) * scale)
    }
    WhiteningModel(mu.toIndexedSeq, rows.toIndexedSeq)
  }

  /** y = W(x − μ) as one literal-matrix projection (k×dim constants in
    * the plan — same stance as literal-centroid assignment, and the
    * same large-k escape applies: ship W as a broadcast table if k
    * grows past the literal-friendly range). */
  def whiten(vecs: DataFrame, model: WhiteningModel,
      vecCol: String = "vec", outCol: String = "white"): DataFrame = {
    val centered = zip_with(col(vecCol),
      array(model.mean.map(lit(_)): _*), (x, m) => x - m)
    val comps: Seq[Column] = model.rows.map(r =>
      Similarity.dot(centered, array(r.map(lit(_)): _*)))
    vecs.withColumn(outCol, array(comps: _*))
  }

  /** Deterministic Johnson–Lindenstrauss SIGN projection (Achlioptas,
    * "Database-friendly random projections", PODS 2001): dimOut
    * components, each the ±1-signed sum of the input dims, with the
    * sign of (j, i) derived from the first hex digit of md5("j:i") —
    * engine-portable, so the DuckDB oracle replays the "random" matrix
    * exactly (the Gumbel-uniform doctrine applied to a projection).
    * The DIMENSION-reduction companion to int8 quantization's
    * precision reduction: 64→16 dims is 4× smaller ANN storage and 4×
    * cheaper dot products at JL-bounded distance distortion. Zero
    * shuffle — one codegen'd projection of dimIn·dimOut literal-signed
    * adds; each component folds LEFT from 0.0 in index order so the
    * double sum is bit-identical to the oracle's sequential
    * list_reduce. E‖proj‖²/dimOut = ‖x‖², spec'd in EmbeddingsSpec. */
  def jlProject(vecs: DataFrame, dimIn: Int, dimOut: Int,
      vecCol: String = "vec", outCol: String = "proj"): DataFrame = {
    require(dimIn > 0 && dimOut > 0)
    val comps: Seq[Column] = (0 until dimOut).map { j =>
      (0 until dimIn).foldLeft(lit(0.0)) { (acc, i) =>
        acc + lit(jlSign(j, i)) * element_at(col(vecCol), i + 1)
      }
    }
    vecs.withColumn(outCol, array(comps: _*))
  }

  /** The (j, i) projection sign: +1 when md5("j:i") opens below '8'. */
  def jlSign(j: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xF) < 8) 1.0 else -1.0
  }
}
