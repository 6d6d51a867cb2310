package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Ops

/** Deterministic hash-shard assignment (`Ops.withHashShardId`) — the
  * write-side shard cut between curation and the trainer. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, sf0001, "documents").select("doc_id")

  test("hash shards are fixed-size with a single ragged tail") {
    val sizes = Ops.withHashShardId(docs, $"doc_id", 128)
      .groupBy("shard_id").agg(count(lit(1)).as("n"))
      .orderBy("shard_id").as[(Long, Long)].collect()
    val n = docs.count()
    assert(sizes.map(_._1).toSeq == (0L until sizes.length).map(identity))
    assert(sizes.init.forall(_._2 == 128L))
    assert(sizes.last._2 == (if (n % 128 == 0) 128L else n % 128))
    assert(sizes.map(_._2).sum == n)
  }

  test("hash shard assignment equals the single-task global-window form") {
    val fast = Ops.withHashShardId(docs, $"doc_id", 128)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toSet
    val w = Window.orderBy(
      md5($"doc_id".cast("string").cast("binary")), $"doc_id")
    val ref = docs.withColumn("rn", row_number().over(w))
      .select($"doc_id",
        floor(($"rn" - 1) / lit(128.0)).cast("long").as("shard_id"))
      .as[(Long, Long)].collect().toSet
    assert(fast == ref)
  }

  test("shard assignment is stable across runs (pure function of the data)") {
    def run() = Ops.withHashShardId(docs, $"doc_id", 64)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toSet
    assert(run() == run())
  }

  test("partitionBy(shard_id) fans out one directory per shard and round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val assigned = Ops.withHashShardId(docs, $"doc_id", 128)
    assigned.write.mode("overwrite").partitionBy("shard_id").parquet(out)
    val dirs = new java.io.File(out).listFiles
      .filter(_.isDirectory).map(_.getName).count(_.startsWith("shard_id="))
    assert(dirs == assigned.select("shard_id").distinct().count())
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
  }

  test("withHashShardId refuses a non-positive shard size and reserved columns") {
    intercept[IllegalArgumentException] {
      Ops.withHashShardId(docs, $"doc_id", 0)
    }
    intercept[IllegalArgumentException] {
      Ops.withHashShardId(docs.withColumn("__shx", lit(1)), $"doc_id", 8)
    }
  }

  test("epoch shuffle: each epoch deals a distinct permutation of the same deck") {
    import org.apache.spark.sql.functions.{col, concat, md5, expr}
    // recompute the per-epoch order directly (the registered query
    // aggregates to shard manifests; here we check the deal itself)
    def order(epoch: Int): Seq[Long] = docs
      .withColumn("hx", md5(concat(lit(s"$epoch:"),
        col("doc_id").cast("string")).cast("binary")))
      .orderBy("hx", "doc_id").select("doc_id").as[Long].collect().toSeq
    val e0 = order(0); val e1 = order(1)
    assert(e0.toSet == e1.toSet, "every epoch must cover the full corpus")
    assert(e0 != e1, "epoch salt must change the permutation")
    // the registered manifest totals agree with the direct deal
    val got = SparkEntry.queries("ext_epoch_shuffle")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = e0.grouped(128).zipWithIndex
      .map { case (g, i) => (0, i.toLong) -> g.size.toLong }.toMap
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"epoch-0 shard $k size ${got(k)} != $v")
    }
  }

  test("oversample: spends the whole budget to within one doc; both regimes exercised") {
    import graft.functions.TextAnalysis
    val reps = SparkEntry.queries("ext_source_oversample")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nById = toks.map(t => t._1 -> t._3).toMap
    val budgets = ExtensionQueries.sourceTokenBudgets
      .map { case (s, b) => s -> b * 3 }.toMap
    val bySrc = reps.groupBy(_._2)
    bySrc.foreach { case (src, rows) =>
      val spend = rows.map(r => r._3 * nById(r._1)).sum
      val budget = budgets(src)
      assert(spend <= budget, s"$src overspent: $spend > $budget")
      val maxN = toks.filter(_._2 == src).map(_._3).max
      assert(budget - spend < maxN,
        s"$src left more than one doc's tokens unspent: ${budget - spend}")
    }
    // both regimes must be live on the fixture: some source repeats
    // every doc (true oversampling), some source cuts (plain ledger)
    assert(bySrc.exists { case (_, rows) => rows.forall(_._3 >= 2) },
      "no source oversampled")
    val perSrcDocs = toks.groupBy(_._2).map { case (s, r) => s -> r.size }
    assert(bySrc.exists { case (src, rows) =>
      rows.forall(_._3 == 1) && rows.size < perSrcDocs(src)
    }, "no source downsampled to the plain ledger")
  }

  test("oversampled manifest: dense steps, per-epoch spend accounting, copies scatter") {
    import graft.functions.TextAnalysis
    val m = SparkEntry.queries("ext_training_manifest_oversampled")(
        spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val srcById = toks.map(t => t._1 -> t._2).toMap
    val nById = toks.map(t => t._1 -> t._3).toMap
    val maxN = toks.groupBy(_._2).map { case (s, r) => s -> r.map(_._3).max }
    val budgets = ExtensionQueries.sourceTokenBudgets
      .map { case (s, b) => s -> math.min(b, 2000L) * 3 }.toMap
    m.groupBy(_._1).foreach { case (e, rows) =>
      // steps dense 1..n within the epoch
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length),
        s"epoch $e steps not dense")
      // each source spends its budget to within one doc, every epoch
      rows.groupBy(r => srcById(r._3)).foreach { case (src, inst) =>
        val spend = inst.map(r => nById(r._3)).sum
        assert(spend <= budgets(src), s"epoch $e $src overspent")
        assert(budgets(src) - spend < maxN(src),
          s"epoch $e $src left more than one doc unspent")
      }
      // a repeated doc's copies scatter through the epoch (the repeat
      // index is in the salt): pick the doc with the most instances
      val byDoc = rows.groupBy(_._3).maxBy(_._2.size)
      if (byDoc._2.size >= 3) {
        val steps = byDoc._2.map(_._2).sorted
        val span = steps.last - steps.head
        assert(span > byDoc._2.size,
          s"epoch $e doc ${byDoc._1}'s ${byDoc._2.size} copies clumped")
      }
    }
    // rep indexes are 0..n_reps-1 per (epoch, doc)
    m.groupBy(r => (r._1, r._3)).foreach { case ((e, d), inst) =>
      assert(inst.map(_._4).sorted.toSeq == (0L until inst.size),
        s"epoch $e doc $d rep indexes not dense")
    }
  }

  test("training manifest: window-form parity, dense steps, budgets bite, fresh deal per epoch") {
    import graft.functions.TextAnalysis
    val m = SparkEntry.queries("ext_training_manifest")(spark, sf0001)
      .localCheckpoint()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // dense 1..n steps per epoch
    m.groupBy(_._1).foreach { case (e, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length),
        s"epoch $e steps not dense")
    }
    // parity with the single-task window reference (small fixture only)
    val full = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
    val budgets = ExtensionQueries.sourceTokenBudgets.toMap
    val ref = (1 to 3).flatMap { e =>
      val byDoc = full.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val hx = byDoc.map { case (id, src, n) =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$e:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (id, src, n, h)
      }
      val sel = hx.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._4, r._1)).flatMap { r =>
          cum += r._3
          if (cum <= budgets(src)) Some(r) else None
        }
      }
      sel.sortBy(r => (r._4, r._1)).zipWithIndex
        .map { case (r, i) => (e.toLong, i + 1L, r._1) }
    }
    assert(m.toSeq.sorted == ref.sorted,
      "manifest must equal the per-source greedy prefix in md5 order")
    // budgets actually cut, and the deal changes across epochs
    val perEpoch = m.groupBy(_._1).map { case (e, rows) =>
      e -> rows.map(r => r._2 -> r._3).toSeq.sortBy(_._1).map(_._2)
    }
    assert(perEpoch(1L) != perEpoch(2L),
      "the epoch salt must change the consumption order")
    assert(m.length < 3 * full.count(),
      "at least one source's budget must cut docs")
  }
}
