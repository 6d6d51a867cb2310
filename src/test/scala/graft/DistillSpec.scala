package graft

import org.apache.spark.sql.functions._

import graft.operators.Distill

class DistillSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = DistillQueries.labeledFeatures(spark, sf0001)

  test("fit is deterministic and reproduces a from-first-principles GD") {
    val lf = labeled
    val w1 = Distill.fit(lf, "buckets", "y")
    val w2 = Distill.fit(lf, "buckets", "y")
    assert(w1 == w2)

    // independent reference: plain Scala GD over the collected rows,
    // same integer/floor arithmetic, no Spark expressions involved
    val rows = lf.select("buckets", "y").collect()
      .map(r => (r.getSeq[String](0).toSet, r.getInt(1).toLong))
    val n = rows.length.toLong
    var w = Map.empty[String, Long].withDefaultValue(0L)
    for (_ <- 1 to 4) {
      val errs = rows.map { case (bs, y) =>
        val z = bs.iterator.map(w).sum * 1000L
        val p = math.min(1000L, math.max(0L,
          math.floor(500.0 + z / 4000.0).toLong))
        (bs, p - y * 1000L)
      }
      val grads = errs.flatMap { case (bs, e) => bs.map(_ -> e) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      w = w ++ grads.map { case (b, se) =>
        b -> (w(b) - math.floor(1000L * (1000.0 * se) / (n * 1000000.0)).toLong)
      }
    }
    assert(w1 == w.toMap)
  }

  test("student agrees with the teacher on ≥ 95% of the fixture") {
    val lf = labeled
    val scored = Distill.score(lf, "buckets", Distill.fit(lf, "buckets", "y"))
    val (agree, total) = scored
      .select(sum((col("student_pass") === col("y")).cast("long")),
        count(lit(1)))
      .as[(Long, Long)].head()
    assert(total > 0)
    assert(agree.toDouble / total >= 0.95, s"$agree / $total")
    // and the teacher's positives are not vacuous on this fixture
    val pos = scored.where(col("y") === 1).count()
    assert(pos > 0)
  }

  test("scoring is a zero-shuffle projection under the weight literal") {
    val lf = labeled
    val w = Distill.fit(lf, "buckets", "y")
    assert(shuffleCount(Distill.score(lf, "buckets", w)) == 0)
  }

  test("persisted weights hydrate bit-identically and report health") {
    import graft.operators.IndexStore
    val tbl = "graft_distill_spec"
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_lw")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"/tmp/graft_index/$tbl"))
    val lf = labeled
    IndexStore.buildDistillIndex(lf, "buckets", "y", tbl,
      s"/tmp/graft_index/$tbl")
    val hydrated = IndexStore.distillWeightsFromIndex(spark, tbl)
    assert(hydrated == Distill.fit(lf, "buckets", "y"))
    assert(hydrated.size <= 257)
    val health = IndexStore.healthReport(spark, Seq("distill" -> tbl))
      .collect()
    assert(health.length == 1 && health.head.getString(0) == "distill")
  }

  test("fit on an empty frame fails loudly") {
    val empty = Seq.empty[(Long, Seq[String], Int)]
      .toDF("doc_id", "buckets", "y")
    intercept[IllegalArgumentException] {
      Distill.fit(empty, "buckets", "y")
    }
  }
}
