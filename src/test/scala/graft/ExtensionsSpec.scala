package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** Proves the GraftExtensions entry point installs the optimizer rules
  * for sessions built through Spark's public extension mechanism.
  * Extensions apply at session construction, so this builds a NEW
  * session on the shared context via `withExtensions`. (The
  * `spark.sql.extensions` conf form is equivalent but static — it only
  * takes effect when the SparkContext itself is created with it, which
  * a shared-context test can't exercise.) */
class ExtensionsSpec extends SparkSpec {

  test("bench control queries exist in the registry and stay cheap-regime") {
    // Bench emits control_cpu/control_io sums in the tail of its JSON
    // line so rounds compare control-calibrated; a renamed or retired
    // control would silently zero its term and skew every cross-round
    // ratio. Fail in the suite, not the driver's run. The controls
    // must also not be WarmServe (their number would then be a warm
    // serving cost whose first-rep build the calibration shouldn't
    // carry).
    val reg = SparkEntry.queries.keySet
    val controls = graft.Bench.ControlCpu ++ graft.Bench.ControlIo
    val missing = controls.filterNot(reg)
    assert(missing.isEmpty, s"bench controls not in registry: $missing")
    val timings = SparkEntry.timings
    controls.foreach(c =>
      assert(timings(c) == QueryDef.Standard,
        s"control $c must be Standard-timing"))
  }

  test("GraftExtensions installs InListToSemiJoin for extension-built sessions") {
    val base = spark // force the shared context into existence first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 =
      try SparkSession.builder().master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      finally {
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    assert(s2 ne base, "extensions need a freshly-constructed session")

    val ids = (0 until 200).map(i => java.lang.Long.valueOf(i * 3L))
    val q = Tables.load(s2, sf0001, "orders")
      .where(col("o_orderkey").isin(ids: _*)).select("o_orderkey")
    assert(q.queryExecution.optimizedPlan.exists {
      case j: Join => j.joinType.sql == "LEFT SEMI"
      case _ => false
    }, "the injected rule must rewrite big IN-lists in extension sessions")

    // identical results to the same filter on the un-extended session
    val a = q.collect().map(_.getLong(0)).sorted.toSeq
    val b = Tables.load(base, sf0001, "orders")
      .where(col("o_orderkey").isin(ids: _*)).select("o_orderkey")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("cluster split: near-dup copies never straddle the split boundary") {
    val rows = SparkEntry.queries("ext_cluster_split")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val planted = rows.keys.filter(_ >= 100000L)
    assert(planted.nonEmpty, "fixture planted no near-dups")
    planted.foreach(p => assert(rows(p) == rows(p - 100000L),
      s"near-dup pair ${p - 100000L}/$p split across train/test"))
    // the split is a real partition, not a degenerate one
    assert(rows.values.toSet == Set("train", "test"))
    // the production (MinHash) form obeys the same co-assignment law
    val e2e = SparkEntry.queries("ext_cluster_split_e2e")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val plantedE2e = e2e.keys.filter(_ >= 100000L)
    assert(plantedE2e.nonEmpty)
    plantedE2e.foreach(p => assert(e2e(p) == e2e(p - 100000L),
      s"minhash-form near-dup pair ${p - 100000L}/$p split across"))
  }

  test("soft dedup: singletons always kept, planted clusters thinned") {
    val rows = SparkEntry.queries("ext_soft_dedup_e2e")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    // size-1 clusters are provably always kept (h52 < 2^52 strictly)
    rows.filter(_._2 == 1L).foreach { case (id, _, kept) =>
      assert(kept == 1, s"singleton $id was thinned") }
    // multi-doc clusters exist and the thinning actually fires
    val multi = rows.filter(_._2 > 1L)
    assert(multi.nonEmpty, "fixture planted no near-dup clusters")
    assert(multi.exists(_._3 == 0), "no doc was ever thinned")
  }

  test("softDedupKeep: mega-clusters thin to ~1 survivor (no 64-bit wrap)") {
    import spark.implicits._
    // the corpus-scale case the in-repo fixtures (cluster size 2) never
    // exercise: a boilerplate cluster of 100k identical pages. The
    // superseded multiply form (h52·size < 2^52) wraps 63-bit longs
    // here — often negative, so the comparison passes and the cluster
    // is over-retained instead of thinned; the floor-division form
    // keeps both comparands inside [0, 2^52] at ANY size.
    val n = 100000L
    val mega = spark.range(n).toDF("doc_id")
      .withColumn("cluster_size", lit(n))
    val kept = mega.select(graft.operators.Dedup
        .softDedupKeep(col("doc_id"), col("cluster_size")).as("kept"))
      .agg(sum($"kept")).as[Long].head()
    // E[kept] ≈ 1; Binomial(1e5, 1e-5) puts kept > 10 at ~1e-17
    assert(kept <= 10L,
      s"mega-cluster over-retained: $kept of $n kept (expected ~1)")
    // the failure the fix targets really is there: the multiply form
    // cannot even evaluate at this size — ANSI (Spark 4 default) kills
    // the whole job on the first wrapping row, and with ANSI off it
    // would wrap silently and over-retain. Either way, unusable.
    val thrown = intercept[Exception] {
      mega.select(
          ((conv(substring(md5(col("doc_id").cast("string")
              .cast("binary")), 1, 13), 16, 10).cast("long")
            * col("cluster_size")) < lit(4503599627370496L))
            .cast("int").as("kept"))
        .agg(sum($"kept")).as[Long].head()
    }
    assert(thrown.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      Option(thrown.getCause)
        .exists(_.getMessage.contains("ARITHMETIC_OVERFLOW")),
      s"expected the multiply form to overflow, got: $thrown")
    // and singletons are still always kept under the division form
    val singles = spark.range(1000L).toDF("doc_id")
      .withColumn("cluster_size", lit(1L))
    val keptS = singles.select(graft.operators.Dedup
        .softDedupKeep(col("doc_id"), col("cluster_size")).as("kept"))
      .agg(sum($"kept")).as[Long].head()
    assert(keptS == 1000L, s"thinned a singleton: $keptS of 1000 kept")
  }
}
