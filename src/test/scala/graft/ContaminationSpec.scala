package graft

import org.apache.spark.sql.functions._

import graft.operators.Contamination

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val evalDocs = Seq(
    (0L, "alpha beta gamma delta")).toDF("doc_id", "text")
  // doc 1 shares one eval trigram, doc 2 both, doc 3 none, doc 4 is
  // shorter than the shingle width (whole-text shingle, no match)
  private val corpus = Seq(
    (1L, "alpha beta gamma zulu"),
    (2L, "alpha beta gamma delta epsilon"),
    (3L, "nothing in common here at all"),
    (4L, "alpha beta")).toDF("doc_id", "text")

  test("shared-shingle counts on a planted fixture") {
    val got = Contamination.sharedShingleCounts(corpus, evalDocs)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 2L)))
  }

  test("broadcast and shuffle paths agree on the same fixture") {
    // planted rows guarantee ≥1 cross-split shared shingle no matter
    // what the generated sf0.001 texts contain (970000 % 97 == 0)
    val planted = Seq(
      (970000L, "omega sigma tau upsilon"),
      (970001L, "omega sigma tau kappa"),
      (970002L, "rho omega sigma tau upsilon")).toDF("doc_id", "text")
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").unionAll(planted)
    val train = docs.where(col("doc_id") % 97 =!= 0)
    val eval_ = docs.where(col("doc_id") % 97 === 0)
    def rows(broadcastEval: Boolean) =
      Contamination.sharedShingleCounts(train, eval_, broadcastEval = broadcastEval)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val b = rows(broadcastEval = true)
    assert(b == rows(broadcastEval = false))
    assert(b.nonEmpty, "fixture must actually plant shared shingles")
  }

  test("broadcast path broadcasts the eval side; fallback shuffle-joins") {
    val fast = Contamination.sharedShingleCounts(corpus, evalDocs)
    assert(fast.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      s"eval side should broadcast:\n${fast.queryExecution.sparkPlan}")
    val wide = Contamination.sharedShingleCounts(corpus, evalDocs,
      broadcastEval = false)
    val plan = wide.queryExecution.sparkPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"fallback should shuffle-join on the shingle:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"fallback must not broadcast either side:\n$plan")
  }
}
