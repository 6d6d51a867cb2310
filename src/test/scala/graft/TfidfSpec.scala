package graft

import org.apache.spark.sql.functions._

import graft.operators.Tfidf

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("broadcast-vocab and salted-join paths produce identical top terms") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    def rows(broadcastVocab: Boolean) =
      Tfidf.topTerms(docs, k = 3, broadcastVocab = broadcastVocab)
        .orderBy("doc_id", "term")
        .as[(Long, String, Long)].collect().toSeq
    val b = rows(broadcastVocab = true)
    assert(b == rows(broadcastVocab = false))
    assert(b.nonEmpty)
  }

  test("vocab join is broadcast (no shuffle of the corpus side by term)") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    val plan = Tfidf.topTerms(docs).queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"(term, df) side should broadcast into the tf stream:\n$plan")
  }

  test("salted fallback routes the term join through the salt key") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    val plan = Tfidf.topTerms(docs, broadcastVocab = false)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("__salt"),
      s"fallback should join on (term, __salt):\n$plan")
  }

  test("top terms rank rare-but-frequent-in-doc terms above stop words") {
    // 'zyzzyva' appears 3× in one doc and nowhere else; 'the' is in
    // every doc. The rare term must win doc 0's top slot.
    val docs = Seq(
      (0L, "the zyzzyva zyzzyva zyzzyva sits on the leaf"),
      (1L, "the cat sat on the mat"),
      (2L, "the dog ran in the park"),
      (3L, "the bird flew over the tree")).toDF("doc_id", "text")
    val top = Tfidf.topTerms(docs, k = 1)
      .where(col("doc_id") === 0).select("term").as[String].collect().toSeq
    assert(top == Seq("zyzzyva"))
  }
}
