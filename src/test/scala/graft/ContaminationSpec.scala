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

  test("fraction report: verbatim rewrites flag high, organic docs stay low") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
    val evals = docs.where(col("doc_id") % 97 === 0)
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
      .unionByName(evals.select((col("doc_id") + 700000).as("doc_id"),
        concat(col("text"), lit(" trailing audit tail")).as("text")))
    val rep = Contamination.sharedShingleFractions(corpus, evals)
      .localCheckpoint()
    assert(rep.count() == corpus.count(), "every doc gets a fraction row")
    // every planted rewrite shares almost all of its shingles
    val plants = rep.where(col("doc_id") >= 700000)
    assert(plants.where(col("flagged") === 0).count() == 0,
      "a near-verbatim eval rewrite must flag")
    // organic flags exist in this corpus (it contains organic rewrites
    // of eval texts — true leaks the detector is FOR) but stay rare,
    // and each one genuinely shares at least half its shingles
    val organic = rep.where(col("doc_id") < 700000).localCheckpoint()
    val organicFlagged = organic.where(col("flagged") === 1)
    assert(organicFlagged.count() < organic.count() / 10,
      "more than 10% of organic docs flagging means the threshold is noise")
    assert(organicFlagged
      .where(col("n_shared") * 2 < col("n_shingles")).count() == 0,
      "a flagged doc must actually share >= half its shingles")
    assert(organic.where(col("flagged") === 0).count() > 0)
  }

  test("pair forensics: every planted leak attributes to exactly its eval source; join shapes agree") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
    val evals = docs.where(col("doc_id") % 97 === 0)
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
      .unionByName(evals.select((col("doc_id") + 800000).as("doc_id"),
        concat(lit("leaked verbatim: "), col("text")).as("text")))
    val pairs = Contamination.sharedShinglePairs(corpus, evals,
        minShared = 3L)
      .localCheckpoint()
    // each planted doc's STRONGEST pair is its own eval source
    val planted = pairs.where(col("doc_id") >= 800000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nEvals = evals.count()
    assert(planted.map(_._1).distinct.length == nEvals,
      "every planted leak must surface at least one pair")
    planted.groupBy(_._1).foreach { case (d, rows) =>
      val top = rows.maxBy(_._3)
      assert(top._2 == d - 800000,
        s"planted $d attributed to eval ${top._2}, not its source")
    }
    // the shuffle fallback is value-identical
    val shuffled = Contamination.sharedShinglePairs(corpus, evals,
        minShared = 3L, broadcastEval = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shuffled == pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }
}
