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
