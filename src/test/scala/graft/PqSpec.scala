package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** Product-quantization serving: codebook/code invariants, planted-copy
  * guarantees, and the measured ADC quality floors (deterministic — the
  * Lloyd loop and the fixture are RNG-free, so these are exact
  * regression pins, not statistical hopes). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private lazy val corpus = Tables.load(spark, sf0001, "embeddings")
    .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))
    .localCheckpoint()
  private lazy val books = Pq.trainCodebooks(corpus, dim)
  private lazy val codes = Pq.encode(corpus, books, dim).localCheckpoint()

  test("codebooks: m x ksub entries of subspace width; codes in range, one per vector") {
    assert(books.size == 8 * 16)
    assert(books.forall(_._3.length == dim / 8))
    assert((0 until 8).forall(s =>
      books.filter(_._1 == s).map(_._2).sorted == (0 until 16)))
    val n = corpus.count()
    assert(codes.count() == n)
    assert(codes.select(explode($"codes").as("c"))
      .where($"c" < 0 || $"c" >= 16).count() == 0)
    assert(codes.select(size($"codes")).where(col("size(codes)") =!= 8)
      .count() == 0)
  }

  test("scaled copies encode identically; ADC ranks every planted copy's source top-1") {
    // x2-scaled copies normalize to the same unit vector -> same codes
    val copies = corpus.where($"vec_id" % 20 === 0)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"vec", x => x * 2.0d).as("vec"))
    val copyCodes = Pq.encode(copies, books, dim)
    val joined = copyCodes.select(($"vec_id" - 100000).as("vec_id"),
        $"codes".as("cc"))
      .join(codes, "vec_id")
    assert(joined.count() > 0)
    assert(joined.where($"cc" =!= $"codes").count() == 0,
      "a scale-invariant copy encoded differently from its source")
    // serving: with the copies IN the code store, each original's
    // top-1 ADC neighbor is its copy — identical codes score the
    // query's own-codeword sum, which no other candidate beat on this
    // corpus (deterministic, so pinned exactly)
    val store = codes.unionByName(copyCodes)
    val queries = corpus.where($"vec_id" % 20 === 0)
    val top = Pq.adcTopK(store, queries, books, dim, k = 1)
      .localCheckpoint()
    val hits = top.where($"rank" === 1 &&
      $"neighbor_id" === $"query_id" + 100000).count()
    // deterministic end to end (RNG-free Lloyd + fixture): measured
    // 25/25, pinned exactly
    assert(hits == queries.count(),
      s"only $hits/${queries.count()} planted copies ranked top-1")
  }

  test("ADC recall and score error against the exact scan (measured pins)") {
    val queries = corpus.where($"vec_id" < 10)
    val k = 10
    val exact = Similarity.cosineTopK(corpus, queries, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Pq.adcTopK(codes, queries, books, dim, k = 30)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      ex.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // measured 0.550 on the RNG-free path — random fixture vectors are
    // the hostile case for any coarse quantizer (the SRP/IVF recall
    // notes); planted near-dups are the production catch and pin at
    // 100% above. Floor holds headroom for Spark-version jitter only.
    assert(mean >= 0.5, f"mean recall $mean%.3f below floor")
    // score fidelity: ADC approximates the true cosine within a
    // bounded band on this corpus
    val adc = Pq.adcTopK(codes, queries, books, dim, k = 30)
      .select($"query_id", $"neighbor_id", $"cos_sim".as("adc"))
    val joined = adc.join(corpus.select($"vec_id".as("query_id"),
        $"vec".as("qv")), "query_id")
      .join(corpus.select($"vec_id".as("neighbor_id"),
        $"vec".as("nv")), "neighbor_id")
      .select(abs($"adc" - Similarity.cosine($"qv", $"nv")).as("err"))
    val maxErr = joined.agg(max($"err")).head().getDouble(0)
    val meanErr = joined.agg(avg($"err")).head().getDouble(0)
    // measured mean 0.0691, max 0.2739 — pinned with margin
    assert(meanErr < 0.12 && maxErr < 0.4,
      f"ADC drifted from cosine: mean $meanErr%.4f max $maxErr%.4f")
  }

  test("IVFADC: scaled copies still rank top-1 through the coarse quantizer; recall tracks the full scan") {
    val copies = corpus.where($"vec_id" % 20 === 0)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"vec", x => x * 2.0d).as("vec"))
    val store = corpus.unionByName(copies).localCheckpoint()
    val queries = corpus.where($"vec_id" % 20 === 0)
    // identical normalized vectors assign to the same list and encode
    // to the same codes, so every copy survives the nprobe cut and
    // scores the query's own-codeword maximum — deterministic, 25/25
    val top = Pq.adcTopKIvf(store, queries, books, dim, k = 1,
      nprobe = 2)
    val hits = top.where($"rank" === 1 &&
      $"neighbor_id" === $"query_id" + 100000).count()
    assert(hits == queries.count(),
      s"only $hits/${queries.count()} copies ranked top-1 through IVFADC")
    // the nprobe cut costs bounded recall vs the full ADC scan
    val queries10 = corpus.where($"vec_id" < 10)
    val full = Pq.adcTopK(codes, queries10, books, dim, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Pq.adcTopKIvf(corpus, queries10, books, dim, k = 10,
        nprobe = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rec = full.map { case (q, f) =>
      f.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / f.size
    }.sum / full.size
    // measured on the RNG-free path; floor with jitter headroom only
    assert(rec >= 0.6, f"IVFADC@nprobe=8 recall $rec%.3f vs full ADC")
  }

  test("exact re-rank over ADC candidates: recall never below the raw scan, ordering exact") {
    val queries = corpus.where($"vec_id" < 10)
    val k = 10
    val exact = Similarity.cosineTopK(corpus, queries, k)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect()
    val exactSets = exact.groupBy(_._1)
      .view.mapValues(_.map(_._3).toSet).toMap
    val raw = Pq.adcTopK(codes, queries, books, dim, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rr = Pq.adcTopKReranked(codes, corpus, queries, books, dim, k,
        overfetch = 3)
      .localCheckpoint()
    val rrSets = rr.select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recall(m: Map[Long, Set[Long]]) = exactSets.map { case (q, ex) =>
      ex.intersect(m.getOrElse(q, Set.empty)).size.toDouble / ex.size
    }.sum / exactSets.size
    assert(recall(rrSets) >= recall(raw),
      "re-ranked candidates recall less than the raw ADC cut")
    // whatever the codes surfaced, the re-ranked ORDER is the exact
    // cosine order: every re-ranked row's neighbor set at each rank
    // prefix is the exact-order prefix of its own candidate pool
    val rrRows = rr.select($"query_id", $"rank", $"neighbor_id", $"cos_sim")
      .as[(Long, Int, Long, Double)].collect()
    rrRows.groupBy(_._1).foreach { case (_, rows) =>
      val sims = rows.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.drop(1)).forall { case (a, b) => a >= b },
        "re-ranked scores are not descending")
    }
  }
}
