package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.{SimHash, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents")
    .select("doc_id", "text")
  private lazy val planted = docs.unionAll(
    docs.where($"doc_id" % 5 === 0)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" graft tail")).as("text")))
  private lazy val plantedIds =
    docs.where($"doc_id" % 5 === 0).select("doc_id").as[Long].collect().toSet

  test("exact dedup collapses whitespace-variant copies") {
    val corpus = docs.unionAll(docs.where($"doc_id" % 5 === 0)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat(lit(" "), $"text", lit("  ")).as("text")))
    val groups = Dedup.exactDuplicateGroups(corpus, "doc_id",
      TextAnalysis.fingerprintMd5($"text")).where($"n_copies" > 1)
    // every planted copy collapses onto its source (keeper = original id)
    val keepers = groups.select("keeper_id").as[Long].collect().toSet
    assert(plantedIds.subsetOf(keepers))
  }

  test("minhash LSH recovers every planted near-dup pair") {
    val pairs = Dedup.minhashNearDupPairs(planted, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = plantedIds.map(id => (id, id + 100000))
    val missing = expected -- pairs
    assert(missing.isEmpty, s"missed planted pairs: $missing")
  }

  test("minhash jaccard estimate ≈ exact jaccard for identical docs") {
    val sh = array_distinct(Dedup.wordShingles($"text", 3))
    val sig = Dedup.minhashSignature(sh, 64)
    val r = docs.limit(5)
      .select(Dedup.jaccard(sh, sh).as("j"),
        Dedup.minhashJaccardEstimate(sig, sig).as("je"))
      .as[(Double, Double)].collect()
    r.foreach { case (j, je) => assert(j == 1.0 && je == 1.0) }
  }

  test("simhash candidates: high recall on planted pairs, hamming is exact") {
    val pairs = Dedup.simhashNearDupPairs(planted, "doc_id", "text", maxHamming = 3)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = plantedIds.map(id => (id, id + 100000))
    val recall = (expected & found).size.toDouble / expected.size
    assert(recall >= 0.7, s"simhash recall too low: $recall")
    // reported hamming matches recomputation from raw signatures
    val sigs = planted.select($"doc_id",
      SimHash.simhash64(split(trim(lower($"text")), "\\s+")).as("sim"))
    val byId = sigs.as[(Long, Long)].collect().toMap
    pairs.as[(Long, Long, Int)].collect().foreach { case (a, b, h) =>
      assert(java.lang.Long.bitCount(byId(a) ^ byId(b)) == h)
    }
  }

  test("simhash of identical token arrays is identical; disjoint texts differ") {
    val r = Seq(("a b c d e f g h", "a b c d e f g h", "q w r t y u i o"))
      .toDF("x", "y", "z")
      .select(
        SimHash.simhash64(split($"x", " ")).as("sx"),
        SimHash.simhash64(split($"y", " ")).as("sy"),
        SimHash.simhash64(split($"z", " ")).as("sz"))
      .as[(Long, Long, Long)].head()
    assert(r._1 == r._2 && r._1 != r._3)
  }

  test("lsh candidate pairs are symmetric-free and deterministic") {
    val sh = planted.select($"doc_id",
      array_distinct(Dedup.wordShingles($"text", 3)).as("shingles"))
    val sigs = sh.select($"doc_id", Dedup.minhashSignature($"shingles", 64).as("sig"))
    val p1 = Dedup.lshCandidatePairs(sigs, "doc_id", "sig").collect().toSet
    val p2 = Dedup.lshCandidatePairs(sigs, "doc_id", "sig").collect().toSet
    assert(p1 == p2)
    p1.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("native ngram shingles equal the expression-tree formulation") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
      .unionByName(Seq((90001L, ""), (90002L, "   "), (90003L, "one"),
        (90004L, "one two"), (90005L, "a  b\tc   d"), (90006L, "Tab\there END"))
        .toDF("doc_id", "text"))
    for (n <- Seq(1, 3, 5)) {
      val bad = docs.select(
          Dedup.wordShingles($"text", n).as("fast"),
          Dedup.wordShinglesFold($"text", n).as("ref"))
        .where($"fast" =!= $"ref")
      assert(bad.count() == 0, s"n=$n shingle divergence")
    }
  }

  test("native band keys are bit-identical to the xxhash64 expression tree") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    val sigs = docs.select($"doc_id",
      Dedup.minhashSignature(
        array_distinct(Dedup.wordShingles($"text", 3)), 64).as("sig"))
    val bad = sigs.select(
        graft.operators.IndexStore.bandKeys($"sig", 16, 4).as("fast"),
        graft.operators.IndexStore.bandKeysFold($"sig", 16, 4).as("ref"))
      .where($"fast" =!= $"ref")
    assert(bad.count() == 0, "band keys must not move a single bit")
  }
}
