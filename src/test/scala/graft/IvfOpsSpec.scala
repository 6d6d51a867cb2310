package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Ops, Similarity}

class IvfOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Tables.load(spark, sf0001, "embeddings")
    .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))
  private lazy val queries = corpus.where($"vec_id" < 5)

  test("IVF with nprobe == k is exactly brute force") {
    val cent = IvfIndex.trainCentroids(corpus, k = 8, iters = 2)
    val nClusters = cent.count().toInt
    val ivf = IvfIndex.topK(corpus, queries, cent, k = 5, nprobe = nClusters)
      .orderBy("query_id", "rank").collect().toSeq
    val brute = Similarity.cosineTopK(corpus, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf == brute)
  }

  test("IVF with small nprobe returns valid ranked subsets with decent recall") {
    val cent = IvfIndex.trainCentroids(corpus, k = 16, iters = 2)
    val ivf = IvfIndex.topK(corpus, queries, cent, k = 5, nprobe = 4)
    val rows = ivf.select("query_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4))
    }
    // recall@5 vs brute force over the probed fraction (4/16 of lists):
    val brute = Similarity.cosineTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val found = rows.map(r => (r._1, r._3)).toSet
    val recall = (brute & found).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall@5 = $recall")
  }

  test("k-means assignment is deterministic and total") {
    val cent = IvfIndex.trainCentroids(corpus, k = 8, iters = 1)
    val a1 = IvfIndex.assign(corpus, cent).collect().toSet
    val a2 = IvfIndex.assign(corpus, cent).collect().toSet
    assert(a1 == a2)
    assert(a1.size == corpus.count())
  }

  test("inline assignment matches window assignment and never shuffles") {
    val cent = IvfIndex.trainCentroids(corpus, k = 8, iters = 1)
    val inline = IvfIndex.assignInline(corpus, IvfIndex.collectCentroids(cent))
    // parity: identical (vec_id, cluster_id) pairs as the crossJoin+window form
    val viaWindow = IvfIndex.assign(corpus, cent).collect().toSet
    assert(inline.collect().toSet == viaWindow)
    // the whole point: assignment is one projection — zero exchanges
    assert(shuffleCount(inline) == 0,
      "map-only assignment must not move the corpus")
  }

  test("inline assignment prefers the lower cluster_id on exact ties") {
    // two identical centroids → every vector ties → lower id must win
    val cent = IvfIndex.collectCentroids(
      IvfIndex.trainCentroids(corpus, k = 1, iters = 0))
    val dup = Seq(3 -> cent.head._2, 7 -> cent.head._2)
    val got = IvfIndex.assignInline(corpus, dup)
      .select("cluster_id").distinct().as[Int].collect().toSeq
    assert(got == Seq(3))
  }

  test("Lloyd training reseeds emptied clusters instead of dropping them") {
    // Seeds are the 3 lowest-id vectors; v0 == v1, so on the first Lloyd
    // step v1 ties between centroids 0 and 1 and the lower-id tie-break
    // funnels it into cluster 0 — cluster 1 attracts zero vectors and the
    // groupBy yields no row for it. The unguarded loop would return k-1
    // centroids with no error. The zero vector is degenerate (null cosine
    // everywhere) and must never be chosen as the reseed anchor; the
    // genuinely farthest vector (-1,-1) must be.
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.9, 0.1)),
      (4L, Seq(-1.0, -1.0)),
      (5L, Seq(0.0, 0.0))
    ).toDF("vec_id", "vec")
    val cent = IvfIndex.trainCentroids(vecs, k = 3, iters = 2, dim = 2)
    val byId = cent.as[(Int, Seq[Double])].collect().toMap
    assert(byId.keySet == Set(0, 1, 2), "every requested cluster id survives")
    // the reseeded cluster anchored on (-1,-1): after the next step it owns
    // exactly that vector, so its centroid points into the third quadrant
    val c1 = byId(1)
    assert(c1(0) < 0 && c1(1) < 0, s"reseeded centroid $c1 should be ~(-1,-1)")
    // and assignment against the repaired quantizer is total over the
    // non-degenerate corpus with all three clusters populated
    val assigned = IvfIndex.assignInline(vecs,
      IvfIndex.collectCentroids(cent))
    assert(assigned.select("cluster_id").distinct().as[Int].collect().toSet
      == Set(0, 1, 2))
  }

  test("Lloyd training fails loudly when the corpus cannot sustain k") {
    // one usable vector, k = 3: after both zero-vector seeds' clusters
    // empty there is a single non-degenerate anchor for two holes —
    // must throw, not return an undersized quantizer
    val tiny = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 0.0)),
      (2L, Seq(0.0, 0.0))
    ).toDF("vec_id", "vec")
    intercept[IllegalArgumentException] {
      IvfIndex.trainCentroids(tiny, k = 3, iters = 1, dim = 2)
    }
  }

  test("salted join equals plain join on skewed data") {
    // skew: 80% of left rows share one key
    val left = spark.range(0, 2000)
      .select((when($"id" % 5 =!= 0, $"id" % 37).otherwise(7L)).as("k"),
        $"id".as("payload"))
    val right = spark.range(0, 37).select($"id".as("k"), ($"id" * 100).as("rv"))
    val plain = left.join(right, Seq("k")).select("k", "payload", "rv")
      .collect().map(_.toSeq).toSet
    val salted = Ops.saltedJoin(left, right, "k", nSalts = 8)
      .select("k", "payload", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    // left_outer parity too (null-extension preserved)
    val rightSparse = right.where($"k" < 10)
    val p2 = left.join(rightSparse, Seq("k"), "left_outer")
      .select("k", "payload", "rv").collect().map(_.toSeq).toSet
    val s2 = Ops.saltedJoin(left, rightSparse, "k", 8, "left_outer")
      .select("k", "payload", "rv").collect().map(_.toSeq).toSet
    assert(s2 == p2)
    // right/full outer would duplicate unmatched replicated rows → rejected
    intercept[IllegalArgumentException] {
      Ops.saltedJoin(left, right, "k", 8, "full_outer")
    }
  }
}
