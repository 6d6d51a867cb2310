package graft

import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("chains, cliques, and isolated pairs resolve to min-id components") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("a long chain converges (diameter > a couple of hops)") {
    val chain = (0L until 12L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet == Set(0L), "every vertex joins component 0")
    assert(got.keySet == (0L to 12L).toSet)
  }

  test("non-convergence within maxIters fails loud instead of splitting clusters") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(chain, maxIters = 3).collect()
    }
    assert(e.getMessage.contains("maxIters"))
    // and a sufficient bound succeeds on the same graph
    assert(Components.connectedComponents(chain, maxIters = 35)
      .as[(Long, Long)].collect().forall(_._2 == 0L))
  }

  test("edge direction does not matter") {
    assert(cc(Seq((5L, 1L), (1L, 9L))) == Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("self-loops and duplicate pairs are harmless") {
    val got = cc(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (7L, 7L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("one iteration moves only the propagated labels: a single exchange") {
    import org.apache.spark.sql.functions.col
    // same construction as the real loop: edges partitioned by src and
    // cached, labels checkpointed WITH their id-partitioning captured
    // (a plain localCheckpoint under AQE loses it and both of step's
    // joins re-shuffle the labels). Broadcast is disabled so the
    // assertion can't be satisfied by broadcasting the small label
    // table — at scale neither side broadcasts and the claim is about
    // co-partitioned reuse.
    noBroadcast {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val a = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = a.unionAll(a.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(nPart, col("src")).cache()
    edges.count()
    // label column added AFTER the boundary — checkpointing the aliased
    // projection captures hash(label), which the joins on id can't use
    val labels = graft.operators.Ops.checkpointKeepPartitioning(
        edges.select(col("src").as("id")).distinct(), eager = true)
      .withColumn("label", col("id"))
    def free(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.optimizedPlan.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ =>
      }
    try {
      val next = Components.step(edges, labels)
      assert(shuffleCount(next) == 1,
        "the cached src-partitioning and the checkpointed id-partitioning " +
          "must both be reused — only the dst-aggregation may exchange")
      val got = next.select("id", "label").as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L,
        10L -> 10L, 11L -> 10L, 12L -> 11L),
        "after one step every vertex holds the min over itself and its neighbors")
      // the budget must HOLD ACROSS ITERATIONS: a checkpointed step
      // output is the next iteration's label input, and if the capture
      // degraded there the loop would re-shuffle labels from iteration
      // 2 onward — exactly what a single-step test can't see
      val labels2 = graft.operators.Ops.checkpointKeepPartitioning(
        next.drop("moved"), eager = true)
      try {
        assert(shuffleCount(Components.step(edges, labels2)) == 1,
          "iteration 2 must reuse the checkpointed step output's " +
            "id-partitioning — only the dst-aggregation may exchange")
      } finally free(labels2)
    } finally {
      edges.unpersist()
      free(labels)
    }
    }
  }

  test("reliable mode: durable checkpoints, same labels") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty)
    // without a checkpoint dir the reliable path must refuse up front
    intercept[IllegalArgumentException] {
      Components.connectedComponents(
        Seq((1L, 2L)).toDF("id_a", "id_b"), reliable = true)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      val got = Components.connectedComponents(
          Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"),
          reliable = true)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      assert(new java.io.File(dir).listFiles.nonEmpty,
        "durable checkpoints must actually land in the checkpoint dir")
    } finally sc.setCheckpointDir(null)
  }

  test("writeComponents: same labels, and nothing left pinned in storage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    // DELTA assertion, not global emptiness: suites share one
    // SparkContext and run in parallel, so another suite's live
    // localCheckpoint pins can legitimately coexist — the invariant
    // under test is that writeComponents frees ITS OWN checkpoint
    // blocks (a long-lived session running clustering repeatedly must
    // not accumulate executor storage)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Components.writeComponents(pairs, s"$dir/cc")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    def leaked() = (spark.sparkContext.getPersistentRDDs.keySet -- before)
      .filter(spark.sparkContext.getPersistentRDDs.contains)
    while (leaked().nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(leaked().isEmpty,
      "RDD blocks pinned by writeComponents remain cached after the terminal write")
  }

  test("restartable mode: abort leaves resumable state, resume matches, one exchange per step") {
    import org.apache.spark.sql.functions.col
    val base = "graft_cc_rst"
    val path = "/tmp/graft_cc_rst"
    (0 to 30).foreach(i => spark.sql(s"DROP TABLE IF EXISTS ${base}_labels_$i"))
    spark.sql(s"DROP TABLE IF EXISTS ${base}_edges")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    // a 7-hop chain (needs > 2 iterations) plus an isolated pair
    val pairs = ((0L until 7L).map(i => (i, i + 1)) :+ ((100L, 101L)))
      .toDF("id_a", "id_b")
    // "kill": a too-low bound aborts loudly mid-run, state preserved
    val e = intercept[IllegalStateException] {
      Components.connectedComponentsRestartable(pairs, base, path, maxIters = 2)
    }
    assert(e.getMessage.contains("preserved"))
    assert(spark.catalog.tableExists(s"${base}_labels_2"),
      "the last completed iteration must survive the abort")
    // resume: continues at iteration 2 (no restart) and matches the
    // in-memory implementation
    val resumed = Components.connectedComponentsRestartable(pairs, base, path)
      .as[(Long, Long)].collect().toMap
    val expected = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(resumed == expected, "resumed run must equal the one-shot labels")
    // re-invocation after convergence is an immediate no-op read
    assert(Components.connectedComponentsRestartable(pairs, base, path)
      .as[(Long, Long)].collect().toMap == resumed)
    // superseded iterations were reaped: exactly one generation remains
    val gens = (0 to 30)
      .filter(i => spark.catalog.tableExists(s"${base}_labels_$i"))
    assert(gens.size == 1, s"stale label generations left behind: $gens")
    // the co-bucketed layout delivers the promised shuffle budget: both
    // joins read bucketed scans in place, only the aggregation
    // exchanges. Broadcast disabled — a broadcast of the small label
    // table would satisfy the count without exercising the bucketed
    // co-location the claim is about.
    val partKey = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(partKey)
    spark.conf.set(partKey, "8")
    try noBroadcast {
      val stepDf = Components.step(spark.table(s"${base}_edges"),
        spark.table(s"${base}_labels_${gens.head}").select("id", "label"))
      assert(shuffleCount(stepDf) == 1,
        "bucketed edges and labels must join in place; only the " +
          "dst-aggregation may exchange")
    } finally spark.conf.set(partKey, saved)
  }

  test("restartable mode: generations beyond the current bound are honored, strays reaped") {
    import org.apache.spark.sql.functions.col
    val base = "graft_cc_rst2"
    val path = "/tmp/graft_cc_rst2"
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(base))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val pairs = ((0L until 7L).map(i => (i, i + 1)) :+ ((100L, 101L)))
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Components.connectedComponentsRestartable(pairs, base, path, maxIters = 4)
    }
    assert(spark.catalog.tableExists(s"${base}_labels_4"))
    // a resume with a SMALLER bound than the preserved generation must
    // NOT restart from scratch (the old range-scan bug: labels_4 is
    // invisible to a 0..2 scan, so the run redoes iterations 0-2 and
    // orphans labels_4) — the cumulative bound is already exceeded, so
    // it fails loud with the state intact
    intercept[IllegalStateException] {
      Components.connectedComponentsRestartable(pairs, base, path, maxIters = 2)
    }
    assert(spark.catalog.tableExists(s"${base}_labels_4"),
      "the preserved generation must survive a smaller-bound call")
    assert(!spark.catalog.tableExists(s"${base}_labels_0") &&
      !spark.catalog.tableExists(s"${base}_labels_2"),
      "a smaller-bound call must not restart iteration from zero")
    // crash window between write(i+1) and drop(i): plant a stale earlier
    // generation and resume — the newest generation wins, the stray is
    // reaped, and convergence leaves exactly one generation
    spark.table(s"${base}_labels_4")
      .write.bucketBy(8, "id")
      .option("path", s"$path/${base}_labels_2_stale")
      .saveAsTable(s"${base}_labels_2")
    val resumed = Components.connectedComponentsRestartable(pairs, base, path)
      .as[(Long, Long)].collect().toMap
    assert(resumed == Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap)
    val gens = spark.catalog.listTables().collect().map(_.name)
      .filter(_.matches(s"${base}_labels_\\d+"))
    assert(gens.length == 1, s"expected one surviving generation, got ${gens.toSeq}")
  }

  test("dedupClusters: one keeper per cluster with the right size") {
    val clusters = Components.dedupClusters(
        Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 3L, 10L -> 2L))
  }
}
