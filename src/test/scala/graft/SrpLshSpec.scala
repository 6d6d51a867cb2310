package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, SrpLsh}

class SrpLshSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Tables.load(spark, sf0001, "embeddings")
    .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))

  test("planes are deterministic and roughly centered") {
    val p1 = SrpLsh.planes(16, 64)
    val p2 = SrpLsh.planes(16, 64)
    assert(p1.map(_.toSeq) == p2.map(_.toSeq))
    val mean = p1.flatten.sum / p1.flatten.length
    assert(math.abs(mean) < 0.02, s"plane mean $mean")
  }

  test("signature is scale-invariant (positive scaling)") {
    val planes = SrpLsh.planes(16, 64)
    val sigs = corpus.limit(50).select(
      SrpLsh.signature($"vec", planes).as("s1"),
      SrpLsh.signature(transform($"vec", x => x * 1.001), planes).as("s2"))
      .as[(Int, Int)].collect()
    sigs.foreach { case (a, b) => assert(a == b) }
  }

  test("planted scaled copy is found as top-1 by SRP-LSH") {
    val planted = corpus.unionAll(corpus.where($"vec_id" % 20 === 0)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"vec", x => x * 1.001).as("vec")))
    val top = SrpLsh.topK(planted, planted.where($"vec_id" === 0), k = 3)
    val r1 = top.where($"rank" === 1)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].head()
    assert(r1._1 == 100000L && r1._2 >= 0.999999)
  }

  test("SRP recall@5 beats random-candidate baseline substantially") {
    val queries = corpus.where($"vec_id" < 10)
    val srp = SrpLsh.topK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosineTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & srp).size.toDouble / brute.size
    // 4 bands × 4 bits over 500 vectors: each query probes ~4·500/16 ≈
    // 125 candidates (25% of corpus); near neighbors collide far more
    // often than random, so recall must be well above 25%.
    assert(recall >= 0.5, s"recall@5 = $recall")
  }

  test("packedBandKeys: one key per band, band index recoverable, scale-invariant") {
    val bits = 16 / 4
    val rows = corpus.limit(100).select(
      SrpLsh.packedBandKeys($"vec").as("pk"),
      SrpLsh.packedBandKeys(transform($"vec", x => x * 2.0)).as("pk2"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (pk, pk2) =>
      assert(pk.length == 4)
      pk.zipWithIndex.foreach { case (k, b) =>
        assert((k >> bits) == b.toLong, s"band index lost in key $k at $b")
        assert((k & ((1 << bits) - 1)) >= 0)
      }
      assert(pk == pk2, "packed keys must be scale-invariant")
    }
  }

  test("ranked output is well-formed per query") {
    val out = SrpLsh.topK(corpus, corpus.where($"vec_id" < 5), k = 5)
      .select("query_id", "rank", "cos_sim").as[(Long, Int, Double)].collect()
    out.groupBy(_._1).foreach { case (_, g) =>
      val s = g.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1 to s.length))
      assert(s.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3))
    }
  }
}
