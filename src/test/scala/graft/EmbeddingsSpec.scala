package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, Similarity}

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Tables.load(spark, sf0001, "embeddings")
    .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))

  test("whitening contract: zero mean, unit variance, diagonal covariance") {
    val k = 8
    val model = Embeddings.fitWhitening(vecs, "vec", k)
    val white = Embeddings.whiten(vecs, model, "vec").select($"white")
      .as[Seq[Double]].collect()
    val n = white.length.toDouble
    val mean = Array.tabulate(k)(j => white.map(_(j)).sum / n)
    mean.foreach(m => assert(math.abs(m) < 1e-9, s"whitened mean $m"))
    for (i <- 0 until k; j <- i until k) {
      val cov = white.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      if (i == j) assert(math.abs(cov - 1.0) < 1e-6,
        s"dim $i variance $cov should be 1")
      else assert(math.abs(cov) < 1e-6,
        s"dims ($i,$j) covariance $cov should vanish")
    }
  }

  test("fit is reproducible and sign-fixed across runs") {
    val a = Embeddings.fitWhitening(vecs, "vec", k = 4)
    val b = Embeddings.fitWhitening(vecs, "vec", k = 4)
    a.mean.zip(b.mean).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9)
    }
    a.rows.flatten.zip(b.rows.flatten).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6, s"row entry drifted: $x vs $y")
    }
    // sign convention: each row's largest-|entry| component is positive
    a.rows.foreach { r =>
      val m = r.maxBy(math.abs)
      assert(m > 0, s"sign fix violated: extreme entry $m")
    }
  }

  test("fitWhitening guards its preconditions") {
    intercept[IllegalArgumentException] {
      Embeddings.fitWhitening(vecs, "vec", k = 0)
    }
    intercept[IllegalArgumentException] {
      Embeddings.fitWhitening(vecs, "vec", k = 10000)
    }
    intercept[IllegalArgumentException] {
      Embeddings.fitWhitening(vecs.limit(1), "vec", k = 2)
    }
  }

  test("a ragged embedding fails the fit loudly, never skews it silently") {
    // a short row zero-padded but still counted would bias mean and
    // covariance invisibly — the aggregator must throw instead
    val ragged = vecs.limit(20).unionByName(
      vecs.limit(1).select($"vec_id", slice($"vec", 1, 7).as("vec")))
    val e = intercept[org.apache.spark.SparkException] {
      Embeddings.fitWhitening(ragged, "vec", k = 2)
    }
    assert(e.getMessage.contains("length=7") ||
      Option(e.getCause).exists(_.getMessage.contains("length=7")),
      s"expected the ragged-length require to surface, got: ${e.getMessage}")
  }

  test("jl projection preserves norms in expectation, signs engine-stable") {
    val base = Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id",
        graft.operators.Similarity.toDoubleArray($"embedding").as("vec"))
    val proj = Embeddings.jlProject(base, dimIn = 64, dimOut = 16)
    // inputs are unit vectors → E[||proj||^2 / 16] = 1; per-vector
    // concentration is loose at k = 16, the corpus MEAN is tight
    val ratios = proj.select(
        (graft.operators.Similarity.dot($"proj", $"proj") / 16.0).as("r"))
      .as[Double].collect()
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.18, s"mean norm ratio $mean off unity")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"per-vector distortion out of JL range: ${ratios.min}..${ratios.max}")
    // the sign matrix is a pure md5 function — spot-check the JVM side
    // against independently computed hex digits
    assert(Embeddings.jlSign(0, 0) == 1.0)  // md5("0:0") = 3...
    assert(Embeddings.jlSign(0, 1) == -1.0) // md5("0:1") = 8...
    // zero shuffle: one literal-signed projection
    assert(shuffleCount(proj.select("proj")) == 0)
  }
}
