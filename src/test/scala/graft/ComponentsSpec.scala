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
    // cached, labels checkpointed (id-partitioned from the distinct)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    val a = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = a.unionAll(a.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("src")).cache()
    edges.count()
    val labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    try {
      val next = Components.step(edges, labels)
      assert(shuffleCount(next) == 1,
        "the cached src-partitioning and the checkpointed id-partitioning " +
          "must both be reused — only the dst-aggregation may exchange")
      val got = next.select("id", "label").as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L,
        10L -> 10L, 11L -> 10L, 12L -> 11L),
        "after one step every vertex holds the min over itself and its neighbors")
    } finally {
      edges.unpersist()
      labels.queryExecution.optimizedPlan.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ =>
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
    val got = Components.writeComponents(pairs, s"$dir/cc")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the terminal form frees the final iteration's checkpoint blocks —
    // a long-lived session running clustering repeatedly must not
    // accumulate executor storage
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "no RDD blocks remain cached after the terminal write")
  }

  test("dedupClusters: one keeper per cluster with the right size") {
    val clusters = Components.dedupClusters(
        Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 3L, 10L -> 2L))
  }
}
