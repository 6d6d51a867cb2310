package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CountMin, Dedup}

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def shingleItems(df: DataFrame) =
    df.select(col("doc_id"), col("source"),
      explode(Dedup.wordShingles(col("text"))).as("item"))

  private def regMap(regs: DataFrame) =
    regs.select("row_j", "idx", "c").as[(Int, Int, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap

  test("single repeated item: depth registers, each holding the exact count") {
    val items = Seq.fill(5)("x").toDF("item")
    val regs = CountMin.registers(items, "item").collect()
    assert(regs.length == CountMin.depth)
    assert(regs.forall(_.getAs[Long]("c") == 5L))
    val est = CountMin.estimate(CountMin.registers(items, "item"),
      Seq("x", "y").toDF("item"))
      .as[(String, Long)].collect().toMap
    assert(est("x") == 5L)
    // "y" may collide into x's registers in SOME row, but min over
    // independent rows on a 1-item stream is overwhelmingly 0 — and
    // never negative, never above the stream size
    assert(est("y") >= 0L && est("y") <= 5L)
  }

  test("overestimate guarantee: est >= exact for every candidate, exactly") {
    val items = shingleItems(Tables.load(spark, sf0001, "documents"))
      .localCheckpoint()
    val regs = CountMin.registers(items, "item").localCheckpoint()
    val exact = items.groupBy("item").agg(count(lit(1)).as("exact"))
    val joined = CountMin.estimate(regs, exact.select("item"))
      .join(exact, "item")
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    assert(joined.forall { case (_, est, ex) => est >= ex },
      "Count-Min must never underestimate")
    // the table is bounded by construction
    assert(regs.count() <= CountMin.depth.toLong * CountMin.width)
  }

  test("merge is exact: fold of per-slice sketches equals the union sketch") {
    val corpus = Tables.load(spark, sf0001, "documents")
    val a = shingleItems(corpus.where($"doc_id" % 2 === 0))
    val b = shingleItems(corpus.where($"doc_id" % 2 =!= 0))
    val merged = regMap(CountMin.fold(
      CountMin.registers(a, "item")
        .unionByName(CountMin.registers(b, "item"))))
    val direct = regMap(CountMin.registers(shingleItems(corpus), "item"))
    assert(merged == direct)
  }

  test("unlearn is exact: total minus a slice's sketch equals a rebuild") {
    val corpus = Tables.load(spark, sf0001, "documents")
    val total = CountMin.registers(shingleItems(corpus), "item")
    val slice = CountMin.registers(
      shingleItems(corpus.where($"source" === "src0")), "item")
      .withColumn("c", -col("c"))
    val subtracted = regMap(CountMin.fold(total.unionByName(slice)))
    val rebuilt = regMap(CountMin.registers(
      shingleItems(corpus.where($"source" =!= "src0")), "item"))
    assert(subtracted == rebuilt)
  }

  test("per-occurrence withEstimate agrees with the candidate-list estimate") {
    val items = shingleItems(Tables.load(spark, sf0001, "documents"))
      .localCheckpoint()
    val regs = CountMin.registers(items, "item").localCheckpoint()
    val viaRows = CountMin.withEstimate(items, "item", regs)
      .select("item", "est").distinct()
      .as[(String, Long)].collect().toMap
    val viaCands = CountMin.estimate(regs, items.select("item").distinct())
      .as[(String, Long)].collect().toMap
    assert(viaRows == viaCands,
      "the zero-shuffle projection and the candidate join must serve identical estimates")
    // and the projection never adds an exchange on the corpus side
    val plan = CountMin.withEstimate(items, "item", regs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"withEstimate degraded to a shuffle join:\n$plan")
  }

  test("est == 1 certifies uniqueness on streams sized under the width; saturates above") {
    // the one-sided certificate: overestimates can only HIDE
    // uniqueness, never invent it — exact whenever it fires
    val small = shingleItems(Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 5)).localCheckpoint()
    val regsS = CountMin.registers(small, "item").localCheckpoint()
    val exact = small.groupBy("item").agg(count(lit(1)).as("x"))
      .as[(String, Long)].collect().toMap
    val claimed = CountMin.withEstimate(small, "item", regsS)
      .where(col("est") === 1L).select("item").distinct()
      .as[String].collect()
    assert(claimed.nonEmpty, "small-stream certificate never fired")
    claimed.foreach(i => assert(exact(i) == 1L,
      s"sketch certified '$i' unique but exact=${exact(i)}"))
    // and the documented degeneration: once occurrences >> width,
    // every register holds >= 2 and the certificate goes silent —
    // why ext_doc_novelty reads the exact DF table instead
    val big = shingleItems(Tables.load(spark, sf0001, "documents"))
      .localCheckpoint()
    val fired = CountMin.withEstimate(big, "item",
        CountMin.registers(big, "item"))
      .where(col("est") === 1L).count()
    assert(fired == 0L,
      "saturation expectation broke - revisit the novelty design note")
  }

  test("grouped registers roll up: summing per-source sketches gives the global one") {
    val items = shingleItems(Tables.load(spark, sf0001, "documents"))
      .localCheckpoint()
    val perSrc = CountMin.registers(items, "item", Seq("source"))
    val global = regMap(CountMin.registers(items, "item"))
    val rolled = regMap(CountMin.fold(perSrc.drop("source")))
    assert(rolled == global)
  }

  test("withEstimate refuses grouped register tables (schema contract)") {
    // a grouped table holds duplicate idx rows across groups; the
    // broadcast joins would multiply the corpus rows and silently
    // corrupt every downstream count — the require makes it loud
    val items = shingleItems(Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 20)).localCheckpoint()
    val grouped = CountMin.registers(items, "item", Seq("source"))
    val e = intercept[IllegalArgumentException] {
      CountMin.withEstimate(items, "item", grouped)
    }
    assert(e.getMessage.contains("ungrouped registers"))
    // the documented remedy — fold to ONE sketch — is accepted
    val folded = CountMin.fold(grouped.drop("source"))
    assert(CountMin.withEstimate(items, "item", folded).count() ==
      items.count())
  }
}
