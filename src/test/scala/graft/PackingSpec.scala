package graft

import org.apache.spark.sql.functions._

import graft.operators.BestFitPacking

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def items = Tables.load(spark, sf0001, "documents")
    .select(col("doc_id").as("item_id"),
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"))

  test("best-fit packing: totality, capacity, first-fit tail property") {
    val B = 256L
    val packed = BestFitPacking.packBestFit(items, B).localCheckpoint()
    val n = items.count()
    assert(packed.count() == n, "every item packs")
    assert(packed.select("item_id").distinct().count() == n,
      "no item packs twice")
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("load")).as[(Long, Long)].collect()
    bins.foreach { case (b, load) =>
      assert(load <= B, s"bin $b overflows: $load > $B")
    }
    // first-fit guarantee, single segment (n << segmentSize): at most
    // one bin at or under half capacity — two such bins would have
    // been merged by first-fit
    assert(bins.count(_._2 <= B / 2) <= 1,
      s"more than one under-half bin: ${bins.filter(_._2 <= B / 2).toSeq}")
    // padding accounting: bins is within 30% of the LP lower bound
    val total = items.agg(sum("n_tokens")).head().getLong(0)
    val lower = (total + B - 1) / B
    assert(bins.length <= (lower * 13) / 10 + 1,
      s"${bins.length} bins vs LP lower bound $lower — padding too high")
  }

  test("best-fit packing is invariant to input partitioning") {
    val a = BestFitPacking.packBestFit(items.repartition(1), 256)
      .orderBy("item_id").collect().toSeq
    val b = BestFitPacking.packBestFit(items.repartition(7), 256)
      .orderBy("item_id").collect().toSeq
    assert(a == b)
  }

  test("multi-segment path: bin ids stay disjoint, per-segment tail bound") {
    val B = 256L
    val packed = BestFitPacking
      .packBestFit(items, B, segmentSize = 16).localCheckpoint()
    assert(packed.count() == items.count())
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("load")).as[(Long, Long)].collect()
    bins.foreach { case (b, load) => assert(load <= B) }
    // ≤ one under-half bin per segment
    val segs = bins.groupBy(_._1 / 16)
    segs.foreach { case (seg, bs) =>
      assert(bs.count(_._2 <= B / 2) <= 1,
        s"segment $seg has ${bs.count(_._2 <= B / 2)} under-half bins")
    }
    assert(segs.size > 1, "fixture must actually exercise multiple segments")
  }

  test("an oversized item fails loudly instead of overflowing a bin") {
    val bad = Seq((1L, 100L), (2L, 300L)).toDF("item_id", "n_tokens")
    val e = intercept[org.apache.spark.SparkException] {
      BestFitPacking.packBestFit(bad, 256).collect()
    }
    assert(e.getMessage.contains("chunk first") ||
      Option(e.getCause).exists(_.getMessage.contains("chunk first")))
  }
}
