package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import graft.plans.InListToSemiJoin
import graft.operators.{Similarity, VectorAgg}

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("InListToSemiJoin rewrites big IN-lists into a LeftSemi join") {
    val orders = Tables.load(spark, sf0001, "orders")
    val ids = (0 until 200).map(i => java.lang.Long.valueOf(i * 3L))
    val q = orders.where(col("o_orderkey").isin(ids: _*)).select("o_orderkey")

    val before = q.queryExecution.optimizedPlan
    assert(!before.exists(_.isInstanceOf[Join]), "baseline should be a filter")

    spark.experimental.extraOptimizations = Seq(InListToSemiJoin)
    try {
      val rewritten = orders.where(col("o_orderkey").isin(ids: _*))
        .select("o_orderkey")
      val plan = rewritten.queryExecution.optimizedPlan
      assert(plan.exists {
        case j: Join => j.joinType.sql == "LEFT SEMI"
        case _ => false
      }, s"expected LeftSemi join in:\n$plan")
      // results identical to the un-rewritten filter
      val a = rewritten.as[Long].collect().sorted.toSeq
      spark.experimental.extraOptimizations = Nil
      val b = orders.where(col("o_orderkey").isin(ids: _*))
        .select("o_orderkey").as[Long].collect().sorted.toSeq
      assert(a == b)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("small IN-lists are left untouched") {
    spark.experimental.extraOptimizations = Seq(InListToSemiJoin)
    try {
      val q = Tables.load(spark, sf0001, "orders")
        .where(col("o_orderkey").isin(1L, 2L, 3L)).select("o_orderkey")
      assert(!q.queryExecution.optimizedPlan.exists(_.isInstanceOf[Join]))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("approx_count_distinct error shrinks with the rsd knob") {
    val li = Tables.load(spark, sf0001, "lineitem")
    def maxErr(rsd: Double): Double = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), rsd).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .select(abs(col("approx") - col("exact")).cast("double") /
        col("exact").cast("double"))
      .as[Double].collect().max
    assert(maxErr(0.01) <= 0.03, s"tight-rsd HLL error ${maxErr(0.01)}")
    assert(maxErr(0.05) <= 0.15, s"default-ish-rsd HLL error ${maxErr(0.05)}")
  }

  test("ext_bloom_join_prune injects a runtime Bloom filter into the big-side scan") {
    val df = SparkEntry.queries("ext_bloom_join_prune")(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan
    val planStr = plan.toString
    assert(planStr.contains("might_contain") && planStr.contains("bloom_filter_agg"),
      s"expected an injected Bloom runtime filter in:\n$planStr")
    // pruning is semantics-free: equals the plain join under default confs
    val plain = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "orders")
        .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty)
  }

  test("approx_percentile stays within 0.5% of the exact kernel") {
    // ext_approx_percentiles is the declared at-scale percentile path
    // (mergeable t-digest-style partials); ext_percentiles is the exact
    // oracle kernel. Their relative deviation bounds the approximation.
    val approx = SparkEntry.queries("ext_approx_percentiles")(spark, sf0001)
    val exact = SparkEntry.queries("ext_percentiles")(spark, sf0001)
    val err = approx.alias("a")
      .join(exact.alias("e"), col("a.l_returnflag") === col("e.l_returnflag"))
      .select(Seq("p25", "p50", "p75").map(p =>
        (abs(col(s"a.$p") - col(s"e.$p")) / col(s"e.$p")).as(p)): _*)
      .select(greatest(col("p25"), col("p50"), col("p75")))
      .as[Double].collect().max
    assert(err <= 0.005, s"approx percentile relative error $err")
  }

  test("withGlobalRowNumber matches the single-partition global window") {
    import org.apache.spark.sql.expressions.{Window => W}
    val ev = Tables.load(spark, sf0001, "events")
    val fast = graft.operators.Ops.withGlobalRowNumber(ev,
        Seq(col("ts"), col("event_id")), col("ts"), nBuckets = 7)
      .select(col("event_id"), col("rn"))
    val slow = ev.withColumn("rn",
        row_number().over(W.orderBy(col("ts"), col("event_id"))).cast("long"))
      .select(col("event_id"), col("rn"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("persisted-sketch union equals a one-shot sketch; estimate tracks exact") {
    val out = SparkEntry.queries("ext_hll_incremental")(spark, sf0001)
      .as[(String, Long)].collect().toMap
    val li = Tables.load(spark, sf0001, "lineitem")
    val oneShot = li.groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey")))
        .as("est"))
      .as[(String, Long)].collect().toMap
    // folding the batch into the PERSISTED history sketch tracks the
    // one-shot sketch within the union's own error (the union path
    // re-estimates through a different target representation, so it is
    // NOT bit-identical — measured ~1% here) and the exact count
    // within the sketch's published error: the properties that make
    // never-rescan maintenance sound
    oneShot.foreach { case (k, os) =>
      assert(math.abs(out(k).toDouble - os) / os <= 0.02,
        s"$k: union estimate ${out(k)} vs one-shot $os drifts beyond 2%")
    }
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val est = out(k).toDouble
      assert(math.abs(est - n) / n <= 0.05,
        s"$k: sketch estimate $est vs exact $n drifts beyond 5%")
    }
  }

  test("withGroupedRunningSum matches the per-group global window") {
    import org.apache.spark.sql.expressions.{Window => W}
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), lit(3L).as("v"))
    val fast = graft.operators.Ops.withGroupedRunningSum(ev, col("user_id"),
        Seq(col("event_id")), col("event_id"), col("v"), "cum",
        nBuckets = 7)
      .select(col("event_id"), col("cum"))
    val slow = ev.withColumn("cum", sum(col("v")).over(
        W.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .select(col("event_id"), col("cum"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    // and its windows are all partitioned — no single-task stage hides
    // inside the fast path
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    fast.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      .foreach(w => assert(w.partitionSpec.nonEmpty,
        s"grouped prefix grew a global window:\n$w"))
  }

  test("kthOrderedValue: parity with the limit form at sf0.1, ties, empty") {
    // the form it replaces (TakeOrderedAndProject, k rows on the
    // driver) is still the cheapest correct oracle for a parity pin
    val q = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("quality"))
      .localCheckpoint()
    val n = q.count()
    for (k <- Seq(1L, (n + 3) / 4, (2L * n) / 3L, n, n + 50)) {
      val old = q.orderBy(col("quality"), col("doc_id")).limit(k.toInt)
        .agg(max(col("quality"))).head().getDouble(0)
      val neu = graft.operators.Ops.kthOrderedValue[Double](
        q, col("quality"), col("doc_id"), k, nBuckets = 7)
      assert(neu.contains(old), s"k=$k: distributed rank $neu vs limit-form $old")
    }
    // quality is heavily tied (1e-4 grid over 5k docs) so the loop above
    // already exercises tie groups; a long value column takes the other
    // typed path
    val ids = q.select(col("doc_id"))
    val kthId = graft.operators.Ops.kthOrderedValue[Long](
      ids, col("doc_id"), col("doc_id"), 10L, nBuckets = 7)
    assert(kthId.contains(
      ids.orderBy("doc_id").limit(10).agg(max("doc_id")).head().getLong(0)))
    assert(graft.operators.Ops.kthOrderedValue[Double](
      q.where(lit(false)), col("quality"), col("doc_id"), 5L).isEmpty,
      "empty input must surface as None, not an NPE")
  }

  test("approx quality gate agrees with the exact gate on >= 99% of docs") {
    val sf01 = "/root/testdata/sf0.1"
    val exact = SparkEntry.queries("ext_quality_percentile_gate")(spark, sf01)
      .select("doc_id").as[Long].collect().toSet
    val approx = SparkEntry.queries("ext_quality_gate_approx")(spark, sf01)
      .select("doc_id").as[Long].collect().toSet
    val n = Tables.load(spark, sf01, "documents").count().toDouble
    val disagree = ((exact diff approx) ++ (approx diff exact)).size
    assert(disagree / n <= 0.01,
      s"$disagree of ${n.toLong} docs flip between exact and approx gates")
    assert(approx.nonEmpty)
  }

  test("kth-order-statistic plan: no TakeOrderedAndProject, no global sort") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Sort => LSort, Window => LWindow}
    val q = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("quality"))
    val frame = graft.operators.Ops.kthOrderedValueFrame(
      q, col("quality"), col("doc_id"), k = 125L)
    val plan = frame.queryExecution.optimizedPlan
    // no limit of any kind → nothing for planTakeOrdered to match, and
    // no k-rows-per-partition driver merge
    assert(plan.collect { case l: GlobalLimit => l }.isEmpty &&
      plan.collect { case l: LocalLimit => l }.isEmpty,
      s"cutoff plan grew a limit (driver funnel):\n$plan")
    assert(plan.collect { case s: LSort if s.global => s }.isEmpty,
      s"cutoff plan grew a global sort:\n$plan")
    plan.collect { case w: LWindow => w }.foreach(w =>
      assert(w.partitionSpec.nonEmpty,
        s"cutoff rank fell back to a global window:\n$w"))
    // and physically: no TakeOrderedAndProject anywhere
    frame.collect()
    val phys = frame.queryExecution.executedPlan.toString
    assert(!phys.contains("TakeOrderedAndProject"),
      s"cutoff executed through TakeOrderedAndProject:\n$phys")
  }

  test("ablation-panel and cms-gate plans: broadcasts stay broadcast, no global windows") {
    // the panel dataflow: every model-table join must be a broadcast
    // (the corpus-sized side is the eval bigram stream), and nothing
    // may fall into a partitionBy-less window or global sort before
    // the final presentation orderBy
    val panelDf = SparkEntry.queries("ext_source_ablation_sliced")(
      spark, sf0001)
    val panelPhys = panelDf.queryExecution.executedPlan.toString
    assert(panelPhys.contains("BroadcastHashJoin") ||
      panelPhys.contains("BroadcastNestedLoopJoin"),
      s"panel joins lost their broadcast:\n$panelPhys")
    assert(!panelPhys.contains("SortMergeJoin"),
      s"a panel model join degraded to SMJ:\n$panelPhys")
    // the per-row sketch gate: the three register joins are broadcasts
    // over a corpus that never exchanges before the per-doc regroup
    val gateDf = SparkEntry.queries("ext_boilerplate_cms")(spark, sf0001)
    val gatePhys = gateDf.queryExecution.executedPlan.toString
    assert(gatePhys.contains("BroadcastHashJoin"),
      s"cms register joins lost their broadcast:\n$gatePhys")
    assert(!gatePhys.contains("SortMergeJoin"),
      s"a cms register join degraded to SMJ:\n$gatePhys")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq(panelDf, gateDf).foreach(df =>
      df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
        .foreach(w => assert(w.partitionSpec.nonEmpty,
          s"partitionBy-less window in:\n$w")))
  }

  test("w4/b1 plans contain no empty-partition (single-task) window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("w4_batched_sink", "b1_chunked_ids")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      }
      assert(windows.nonEmpty, s"$name should still enumerate via a window")
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$name has a global Window.orderBy (single-task straggler):\n$w"))
    }
  }

  test("ccnet/lm-matrix banding plans have no partitionBy-less window") {
    // withBands used to run ntile(3) over a global order — one task
    // sorting one-row-per-scored-doc. Now banding is a rank-range test
    // over the 3-pass bucketed prefix: every window in both registered
    // plans must be partitioned (the only global sorts allowed are the
    // queries' own final output orderBy).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("ext_ccnet_pipeline", "ext_quality_lm_matrix")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      }
      assert(windows.nonEmpty, s"$name should still rank via windows")
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$name has a global Window.orderBy (single-task straggler):\n$w"))
    }
  }

  test("soft-dedup and keeper plans carry no hot-key window") {
    // cluster_size / keeper selection must be an aggregate (+ join),
    // never a count/min over Window.partitionBy(component|fingerprint):
    // a partitioned window is parallel ACROSS keys but buffers each
    // key's rows in ONE task, so a boilerplate mega-cluster becomes a
    // straggler exactly where soft dedup has the most work. Aggregates
    // take map-side partials and the join back is AQE-skew-splittable.
    // These three plans contain no Window node at all.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("ext_soft_dedup", "ext_soft_dedup_e2e",
        "ext_curation_pipeline", "ext_distill_pipeline")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      }
      assert(windows.isEmpty,
        s"$name grew a window (hot-key funnel):\n${windows.mkString("\n")}")
    }
    // ccnet legitimately keeps the 3-pass banding machinery's windows,
    // which partition by the INTERNAL bounded bucket key — but no
    // window may partition by a data key (the old fingerprint keeper)
    val ccnet = SparkEntry.queries("ext_ccnet_pipeline")(spark, sf0001)
    ccnet.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      .foreach { w =>
        assert(w.partitionSpec.nonEmpty, s"global window in ccnet:\n$w")
        w.partitionSpec.flatMap(_.references).foreach(a =>
          assert(a.name.startsWith("__"),
            s"ccnet window partitioned by data key '${a.name}' " +
              s"(hot-key funnel):\n$w"))
      }
  }

  test("curriculum manifest: competence property holds and every window partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = SparkEntry.queries("ext_training_manifest_curriculum")(
      spark, sf0001)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"curriculum manifest has a global Window.orderBy:\n$w"))
    // epoch e draws ONLY from perplexity bands ≤ e, and each epoch
    // actually uses its newly-unlocked band on this fixture
    val rows = df.select("epoch", "band_ord").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (e, b) =>
      assert(b <= e, s"epoch $e drew a band-$b doc — competence violated")
    }
    for (e <- 1L to 3L)
      assert(rows.contains((e, e)),
        s"epoch $e never used its newly-unlocked band $e — fixture degenerate")
  }

  test("manifest/oversample plans: every window partitioned (grouped spend + 3-pass rank)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("ext_training_manifest", "ext_source_oversample")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      }
      assert(windows.nonEmpty, s"$name should rank via windows")
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$name has a global Window.orderBy (single-task straggler):\n$w"))
    }
    // the oversample's budget and mass joins must be broadcasts — a
    // shuffled join on `source` would move the corpus for two tiny
    // tables and concentrate each source in one task
    val phys = SparkEntry.queries("ext_source_oversample")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"oversample lost its broadcast joins:\n$phys")
    assert(!phys.contains("SortMergeJoin"),
      s"oversample shuffles the corpus for a bounded table:\n$phys")
  }

  test("epoch shuffle: every window partitioned, no global sort before the agg") {
    import org.apache.spark.sql.catalyst.plans.logical.{Sort => LSort, Window => LWindow}
    val df = SparkEntry.queries("ext_epoch_shuffle")(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "the grouped prefix should rank via windows")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"epoch shuffle fell back to a per-epoch global window:\n$w"))
    // the only global sort is the final output orderBy ON THE 8-row
    // manifest — assert none BELOW the top aggregate
    val belowAgg = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.flatMap(_.collect { case s: LSort if s.global => s })
    assert(belowAgg.isEmpty,
      s"global sort below the manifest aggregate:\n$plan")
  }

  test("star join: dims broadcast, the fact side never shuffles before the agg") {
    val df = SparkEntry.queries("ext_star_join")(spark, sf0001)
    // 5 dim joins as broadcasts leave exactly the aggregation and the
    // final sort as shuffles
    assert(shuffleCount(df) <= 2,
      s"fact-side join shuffle crept into:\n${df.queryExecution.executedPlan}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "all five dim joins should be broadcast at this scale")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the SMJ)") {
    // the automatic complement to ext_salted_join's manual salting: one
    // hot key dominates the left side; with skew thresholds sized to the
    // fixture, AQE's OptimizeSkewedJoin splits the hot partition instead
    // of letting one task straggle
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.shuffle.partitions" -> "4")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(220000).select(
        when(col("id") < 200000, 0L).otherwise(col("id") % 20000).as("k"),
        concat(lit("padpadpadpadpadpad-"), col("id")).as("pad"))
      val right = spark.range(20000).toDF("k")
      // keep the wide pad column through the join so the hot partition's
      // shuffle bytes actually exceed the skew threshold
      val joined = left.join(right, "k")
      assert(joined.collect().length == 220000) // also finalizes the AQE plan
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition in:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skew: AQE splits the hot SMJ partition; manual salting spreads the hot key") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import graft.operators.Ops
    // one hot key (50k rows) among 100 uniform keys (~160 rows each per
    // shuffle partition) — the shape a zipfian join key produces
    val left = spark.range(50000).select(lit(7L).as("k"), $"id".as("v"))
      .unionAll(spark.range(5000).select(($"id" % 100 + 10).as("k"), $"id".as("v")))
    val right = spark.range(200).select($"id".as("k"), ($"id" * 2).as("w"))
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // 1. manual salting: identical results, and the hot key's rows
      // leave the join spread over several shuffle partitions instead of
      // one straggler
      val salted = Ops.saltedJoin(left, right, "k", nSalts = 8)
      val plain = left.join(right, "k")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        "salting must only route rows, never change results")
      val hotSpread = salted.where($"k" === 7)
        .select(org.apache.spark.sql.functions.spark_partition_id())
        .distinct().count()
      assert(hotSpread > 1,
        s"salted hot key must occupy several partitions, got $hotSpread")
      // 2. AQE skew-join: with realistic thresholds scaled down to this
      // fixture, the runtime re-plan splits the oversized partition and
      // marks the SMJ as a skew join — no salting, no code change
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      val aqe = left.join(right, "k")
      aqe.collect()
      def smjNodes(p: SparkPlan): Seq[SortMergeJoinExec] = p match {
        case q: QueryStageExec => smjNodes(q.plan)
        case s: SortMergeJoinExec => s +: s.children.flatMap(smjNodes)
        case other => other.children.flatMap(smjNodes)
      }
      val root = aqe.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val smj = smjNodes(root)
      assert(smj.nonEmpty, s"expected a sort-merge join in:\n$root")
      assert(smj.exists(_.isSkewJoin),
        s"AQE must have split the skewed partition (isSkewJoin):\n$root")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("concurrent conf scopes serialize and restore the session intact") {
    // the withSessionConf contract: interleaved unlocked set/restore
    // scopes clobber the session (A saves B's temporary and restores it
    // after B finished); the locked helper must leave the conf exactly
    // as found under heavy interleaving, and each scope must observe
    // its own value while inside
    import graft.operators.Ops
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val failures = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 8).map { i =>
      new Thread(() => (1 to 50).foreach { _ =>
        Ops.withSessionConf(spark, Map(key -> (100 + i).toString)) {
          if (spark.conf.get(key) != (100 + i).toString)
            failures.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.get == 0, s"${failures.get} scope(s) observed a " +
      "foreign conf value inside their own window")
    assert(spark.conf.get(key) == before,
      s"session conf clobbered: $key = ${spark.conf.get(key)}, " +
        s"expected $before")
  }

  test("unlocked-body conf scope releases the session monitor") {
    // the deadlock shape: a streaming drain blocks inside the scope
    // while the micro-batch thread takes the session monitor (catalog
    // lazy init). The unlocked-body variant must let another thread
    // synchronize on the session while the body runs.
    import graft.operators.Ops
    val s2 = spark.newSession()
    val key = "spark.sql.shuffle.partitions"
    val before = s2.conf.get(key)
    Ops.withSessionConfUnlockedBody(s2, Map(key -> "7")) {
      assert(s2.conf.get(key) == "7")
      val t = new Thread(() => s2.synchronized { () })
      t.start(); t.join(5000)
      assert(!t.isAlive,
        "session monitor held across the unlocked body — a micro-batch " +
          "thread forcing the catalog lazy val would deadlock here")
    }
    assert(s2.conf.get(key) == before, "scope failed to restore")
  }

  test("scope registry: a cross-thread overlap on one key fails loudly and drains") {
    // the registry's whole point: two scopes overlapping on the same key
    // from different threads would restore each other's temporaries and
    // leave the session permanently scoped — the loser must get an
    // IllegalStateException naming the conflict, the winner's restore
    // must still run, and the registry must drain so later scopes work
    import graft.operators.Ops
    val s2 = spark.newSession()
    val key = "spark.sql.shuffle.partitions"
    val before = s2.conf.get(key)
    val seen = new java.util.concurrent.atomic.AtomicReference[Throwable]
    Ops.withSessionConfUnlockedBody(s2, Map(key -> "9")) {
      val t = new Thread(() =>
        try Ops.withSessionConf(s2, Map(key -> "11")) { () }
        catch { case e: Throwable => seen.set(e) })
      t.start(); t.join(10000)
      assert(!t.isAlive)
    }
    val e = seen.get
    assert(e != null, "the concurrent scope must not have been admitted")
    assert(e.isInstanceOf[IllegalStateException] &&
      e.getMessage.contains("conf scope conflict"),
      s"wrong failure: $e")
    assert(s2.conf.get(key) == before,
      "the holding scope's restore must still run after the conflict")
    // the registry drained: the same key is scopable again
    Ops.withSessionConf(s2, Map(key -> "13")) {
      assert(s2.conf.get(key) == "13")
    }
    assert(s2.conf.get(key) == before)
    // and a rejected acquire leaves NO key registered, even when only
    // one key of a multi-key scope conflicted (atomic validation)
    val other = "spark.sql.autoBroadcastJoinThreshold"
    val seen2 = new java.util.concurrent.atomic.AtomicReference[Throwable]
    Ops.withSessionConfUnlockedBody(s2, Map(key -> "9")) {
      val t = new Thread(() =>
        try Ops.withSessionConf(s2, Map(other -> "-1", key -> "11")) { () }
        catch { case e2: Throwable => seen2.set(e2) })
      t.start(); t.join(10000)
    }
    assert(seen2.get != null)
    Ops.withSessionConf(s2, Map(other -> "-1")) { () } // would throw if leaked
  }

  test("scope registry: same-thread LIFO nesting is legal and restores correctly") {
    // nested scopes on ONE thread unwind LIFO — the inner saves the
    // outer's temporary and restores it before the outer restores the
    // original — so the registry must admit them (e.g. a
    // checkpointKeepPartitioning(numShufflePartitions=...) inside a
    // withStreamingConf body); only cross-thread overlap is corruption
    import graft.operators.Ops
    val s2 = spark.newSession()
    val key = "spark.sql.shuffle.partitions"
    val before = s2.conf.get(key)
    Ops.withSessionConf(s2, Map(key -> "17")) {
      assert(s2.conf.get(key) == "17")
      Ops.withSessionConf(s2, Map(key -> "19")) {
        assert(s2.conf.get(key) == "19")
      }
      assert(s2.conf.get(key) == "17",
        "inner scope must restore the OUTER's temporary, not the original")
      // the unlocked-body variant nests the same way
      Ops.withSessionConfUnlockedBody(s2, Map(key -> "23")) {
        assert(s2.conf.get(key) == "23")
      }
      assert(s2.conf.get(key) == "17")
    }
    assert(s2.conf.get(key) == before)
  }

  test("scope registry: setSessionConstant refuses inside a scope, even same-thread") {
    // a "permanent" constant written inside an enclosing scope over the
    // key would be silently reverted by that scope's restore — the
    // registry must refuse it where it allows nested SCOPES
    import graft.operators.Ops
    val s2 = spark.newSession()
    val key = "spark.sql.shuffle.partitions"
    val before = s2.conf.get(key)
    Ops.withSessionConf(s2, Map(key -> "29")) {
      val e = intercept[IllegalStateException] {
        Ops.setSessionConstant(s2, key, "31")
      }
      assert(e.getMessage.contains("conf scope conflict"))
    }
    assert(s2.conf.get(key) == before)
    // outside any scope the constant is the sanctioned write
    Ops.setSessionConstant(s2, key, "37")
    assert(s2.conf.get(key) == "37")
    s2.conf.set(key, before)
  }

  test("centroid Aggregator equals the expression-only mean per dimension") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .select(col("label"), Similarity.toDoubleArray(col("embedding")).as("vec"))
    val agg = vecs.groupBy("label")
      .agg(VectorAgg.centroid(col("vec"), 64).as("c"))
      .select(col("label"), posexplode(col("c")))
      .toDF("label", "dim", "mean_agg")
    val expr = vecs.select(col("label"), posexplode(col("vec")))
      .toDF("label", "dim", "v")
      .groupBy("label", "dim").agg(avg(col("v")).as("mean_expr"))
    val joined = agg.join(expr, Seq("label", "dim"))
      .select(abs(col("mean_agg") - col("mean_expr")).as("d"))
      .agg(max(col("d"))).as[Double].head()
    assert(joined < 1e-9, s"max deviation $joined")
  }
}
