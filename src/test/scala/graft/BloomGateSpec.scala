package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomGate

class BloomGateSpec extends SparkSpec {
  import spark.implicits._

  private def base = Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"), col("text"))

  private def withFp(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      graft.functions.TextAnalysis.fingerprintMd5(col("text")).as("fp"))

  private def fp = withFp(base)

  /** The accepted slice plus whitespace twins of some accepted docs —
    * the planted guaranteed cross-set duplicates (the raw table has
    * none). */
  private def candWithPlants = withFp(
    base.where($"doc_id" % 3 =!= 0).unionByName(
      base.where($"doc_id" % 3 === 0 && $"doc_id" % 10 === 0)
        .select(($"doc_id" + 700000).as("doc_id"),
          concat(lit(" "), $"text", lit("  ")).as("text"))))

  test("memberProbe equals the plain semi join exactly (no false negatives survive, all false positives die)") {
    val ref = fp.where($"doc_id" % 3 === 0).localCheckpoint()
    val cand = candWithPlants.localCheckpoint()
    val got = BloomGate.memberProbe(cand, ref, $"fp", $"fp",
        expectedItems = math.max(1L, ref.count()))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val want = cand.join(ref.select("fp").distinct(), Seq("fp"), "left_semi")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == want, "the composed gate must be value-identical to the semi join")
    assert(want.nonEmpty, "fixture must contain cross-split duplicates")
  }

  test("the bloom prefilter passes every true member and bounds false positives") {
    val ref = fp.where($"doc_id" % 3 === 0).localCheckpoint()
    val cand = candWithPlants.localCheckpoint()
    val n = ref.count()
    val filter = BloomGate.buildFilter(ref, $"fp", n, fpp = 0.01)
    val pre = cand.where(BloomGate.mightContain(filter, $"fp"))
      .localCheckpoint()
    val members = cand.join(ref.select("fp").distinct(), Seq("fp"),
      "left_semi")
    // no false negatives: every member passes the bit test
    assert(members.join(pre.select("doc_id"), Seq("doc_id"), "left_anti")
      .count() == 0, "a true member failed the bloom prefilter")
    // false-positive rate on the true negatives stays within 5x the
    // 1% sizing (slack for the small filter + 64-bit prehash)
    val negatives = cand.count() - members.count()
    val falsePos = pre.count() - members.count()
    assert(negatives > 0)
    assert(falsePos.toDouble / negatives <= 0.05,
      s"fpp $falsePos/$negatives exceeds the sized bound")
  }

  test("empty reference means empty result through the null-filter path") {
    val ref = fp.where(lit(false))
    val out = BloomGate.memberProbe(fp, ref, $"fp", $"fp",
      expectedItems = 1L)
    assert(out.count() == 0)
    assert(BloomGate.buildFilter(ref, $"fp", 1L) == null)
  }

  test("persisted sidecar lifecycle: fresh prefilters, appends restamp, stale degrades to plain — always value-identical") {
    import graft.operators.IndexStore
    val tbl = "graft_spec_bloomsc"
    Seq(s"${tbl}_fps", s"${tbl}_fpbloom").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft_bloomsc/$t"))
    }
    val docs = base
    val oldHalf = docs.where($"doc_id" % 2 === 0)
    val newHalf = docs.where($"doc_id" % 2 === 1)
    // probes: twins of docs from BOTH halves, re-idd out of range
    val probes = docs.where($"doc_id" % 7 === 0)
      .select(($"doc_id" + 900000).as("doc_id"),
        concat(lit(" "), $"text").as("text"))
    def plain = IndexStore.probeExact(spark, probes, "doc_id", "text", tbl)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    IndexStore.buildExactIndex(oldHalf, "doc_id", "text", tbl,
      s"/tmp/graft_bloomsc/$tbl")
    IndexStore.refreshBloomSidecar(spark, tbl)
    val bloomed1 = IndexStore.probeExactBloomed(spark, probes,
      "doc_id", "text", tbl)
    assert(bloomed1.queryExecution.executedPlan.toString
      .contains("might_contain"), "fresh sidecar must prefilter")
    assert(bloomed1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == plain, "fresh-sidecar probe diverged from the plain probe")

    // append + sidecar OR: still fresh, still identical, and the new
    // half's twins ARE found (the false-negative hazard case)
    IndexStore.appendExactIndex(newHalf, "doc_id", "text", tbl)
    IndexStore.appendBloomSidecar(spark, tbl, newHalf, "doc_id", "text")
    val bloomed2 = IndexStore.probeExactBloomed(spark, probes,
      "doc_id", "text", tbl)
    assert(bloomed2.queryExecution.executedPlan.toString
      .contains("might_contain"), "OR-appended sidecar must stay fresh")
    val got2 = bloomed2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == plain)
    val newIds = newHalf.select($"doc_id").as[Long].collect().toSet
    assert(got2.exists { case (_, m) => newIds.contains(m) },
      "a twin of the appended half must match through the sidecar")

    // append WITHOUT the sidecar update (the crash window): the stamp
    // mismatch must disable the prefilter, never drop matches
    val extra = docs.where($"doc_id" % 7 === 3)
      .select(($"doc_id" + 950000).as("doc_id"), $"text")
    IndexStore.appendExactIndex(extra, "doc_id", "text", tbl)
    val bloomed3 = IndexStore.probeExactBloomed(spark, probes,
      "doc_id", "text", tbl)
    assert(!bloomed3.queryExecution.executedPlan.toString
      .contains("might_contain"),
      "a stale sidecar must NOT prefilter (false-negative hazard)")
    assert(bloomed3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == plain, "stale-sidecar fallback diverged from the plain probe")

    // refresh re-arms the prefilter over the full current table
    IndexStore.refreshBloomSidecar(spark, tbl)
    val bloomed4 = IndexStore.probeExactBloomed(spark, probes,
      "doc_id", "text", tbl)
    assert(bloomed4.queryExecution.executedPlan.toString
      .contains("might_contain"))
    assert(bloomed4.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == plain)
  }

  test("the prefilter is a scan-local predicate: might_contain sits in the plan, before the confirm join") {
    val ref = fp.where($"doc_id" % 3 === 0)
    val probe = BloomGate.memberProbe(fp.where($"doc_id" % 3 =!= 0), ref,
      $"fp", $"fp", expectedItems = math.max(1L, ref.count()))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom bit test missing from the physical plan:\n$plan")
  }
}
