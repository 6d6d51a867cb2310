package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // target: "alpha beta" world; raw: mixed
  private val target = docs(
    1L -> "alpha beta alpha beta gamma",
    2L -> "alpha beta delta",
    3L -> "beta gamma alpha")
  private val raw = docs(
    10L -> "alpha beta gamma alpha", // target-like
    11L -> "zork quux fnord grue",   // junk, nothing shared
    12L -> "alpha zork beta quux",   // half-way
    13L -> "")                       // featureless

  test("weights rank target-like raw documents above junk") {
    val m = Dsir.fit(target, raw, hexChars = 2)
    val w = Dsir.scoreWeights(m, raw)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(10L) > w(12L), s"target-like ${w(10L)} !> mixed ${w(12L)}")
    assert(w(12L) > w(11L), s"mixed ${w(12L)} !> junk ${w(11L)}")
    assert(w(13L) == 0L && w.size == 4, "featureless doc kept at weight 0")
  }

  test("weights are partitioning-invariant (integer milli-bit sums)") {
    val m1 = Dsir.fit(target.repartition(1), raw.repartition(1), hexChars = 2)
    val m7 = Dsir.fit(target.repartition(7), raw.repartition(7), hexChars = 2)
    val a = Dsir.scoreWeights(m1, raw.repartition(1)).orderBy("doc_id").collect()
    val b = Dsir.scoreWeights(m7, raw.repartition(7)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("features unseen at fit time score through the r0 floor, not a null") {
    val m = Dsir.fit(target, raw, hexChars = 2)
    val novel = docs(99L -> "xyzzy17 xyzzy18") // 2 unigrams + 1 bigram, all novel
    val row = Dsir.scoreWeights(m, novel).head()
    val r0 = m.unseen.head().getLong(0)
    assert(row.getLong(1) == 3L)
    assert(row.getLong(2) == 3L * r0,
      s"novel-feature weight ${row.getLong(2)} != n_feats * r0 = ${3L * r0}")
  }

  test("gumbel key matches an independent JVM recomputation") {
    val m = Dsir.fit(target, raw, hexChars = 2)
    val w = Dsir.scoreWeights(m, raw)
    val got = Dsir.resample(w, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    wm.foreach { case (id, wMilli) =>
      val hv = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 13), 16)
      val u = (hv + 1.0) / 4503599627370497.0
      val expect = wMilli +
        math.floor(-(math.log(-math.log(u)) / math.log(2.0)) * 1000.0 + 0.5).toLong
      assert(got(id) == expect, s"doc $id key ${got(id)} != $expect")
    }
    assert(got.size == 4, "k >= n returns every row exactly once")
  }

  test("resample is a constant-k take with a deterministic outcome") {
    val m = Dsir.fit(target, raw, hexChars = 2)
    val w = Dsir.scoreWeights(m, raw)
    val a = Dsir.resample(w, 2).select("doc_id").as[Long].collect().sorted.toSeq
    val b = Dsir.resample(w.repartition(5), 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, s"resample not deterministic: $a vs $b")
    assert(a.size == 2)
  }

  test("scoring plan: ratio join broadcasts, no window, no global sort") {
    val m = Dsir.fit(target, raw, hexChars = 2)
    val df = Dsir.scoreWeights(m, raw)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "ratio join must broadcast")
    assert(!plan.contains("Window"), "no window in the scoring path")
    // the only sorts allowed are those inside SortMergeJoin of the fit's
    // full-outer count join (bounded at <= 16^hexChars rows per side)
    assert(!plan.contains("TakeOrderedAndProject"), "no ordering in scoring")
  }
}
