package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{IndexStore, IvfIndex, NgramLm, Ops, Similarity, SrpLsh, TemporalJoins, VectorAgg}
import graft.plans.InListToSemiJoin

/** Capability registry, batch 6: analytic operators beyond the
  * reference's surface — sessionization, rollup, a typed Aggregator
  * (vector centroid), and the IN-list→semi-join optimizer rule running
  * in anger.
  */
object AnalyticsQueries {
  import Tables.load

  /** The tableExists-guarded build-once/probe-warm queries of this
    * module: rep 1 of a bench may pay the one-time index build, so the
    * bench must keep running the warm reps (see QueryDef.WarmServe).
    * Tagged via a post-pass (validated against the registry below) so
    * the policy is auditable in one place. */
  private val warmServeNames: Set[String] = Set(
    "ext_ivf_persisted", "ext_ivf_quantized", "ext_ivf_neardup_quant",
    "ext_ivf_incremental", "ext_minhash_persisted",
    "ext_minhash_incremental", "ext_simhash_persisted",
    "ext_srp_persisted", "ext_srp_quantized", "ext_srp_neardup",
    "ext_srp_neardup_quant", "ext_srp_incremental")

  val defs: Seq[QueryDef] = QueryDef.tagWarmServe(defs0, warmServeNames)

  private def defs0: Seq[QueryDef] = Seq(

    // Sessionization: 30-minute-gap sessions per user via lag + running
    // sum — the standard event-log → session-table transform of a
    // training-data pipeline.
    // Oracle CAST: DuckDB's windowed sum() yields HUGEINT, which the
    // compare path materializes as float64; Spark emits BIGINT (same
    // values, different hash). Same pattern as the w4/b1 oracles.
    QueryDef("ext_sessionize",
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |s AS (
             |  SELECT user_id, event_id, ts,
             |         CAST(sum(CASE WHEN prev_ts IS NULL
             |                       OR date_diff('second', prev_ts, ts) > 1800
             |                  THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |       min(ts) AS session_start, max(ts) AS session_end
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        load(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
              .otherwise(0))
          .withColumn("session_id",
            sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .orderBy("user_id", "session_id")
      }),

    // Native session_window operator (the built-in form of
    // ext_sessionize): an event at or past the previous event + 30min
    // opens a new session (window is [start, last+gap)). The oracle
    // reconstructs identical sessions with lag + running sum at
    // microsecond precision.
    QueryDef("ext_session_window",
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts,
             |         sum(CASE WHEN prev_ts IS NULL
             |                       OR date_diff('microsecond', prev_ts, ts) >= 1800000000
             |                  THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin),
      (s, dir) => load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"), col("n_events"))
        .orderBy("user_id", "session_start")),

    // Rollup aggregation (subtotals + grand total) — Spark built-in the
    // reference never had; NULLS FIRST pinned for cross-engine ordering.
    QueryDef("ext_rollup",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |       round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
      (s, dir) => load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Typed Aggregator showpiece: per-label embedding centroid (the
    // coarse-quantizer building block for IVF-style ANN), exploded to
    // (label, dim, mean) for oracle comparison. Accepted risk, stated
    // honestly: both engines sum doubles in their own partition/scan
    // order, so a per-cell mean landing within ~1e-13 of a 0.5e-6
    // rounding boundary could round apart — the groups here are small
    // (~hundreds of rows) and six rounds of gates have not hit it, but
    // at warehouse scale this query belongs rows-only like the IVF
    // centroid queries.
    QueryDef("ext_label_centroids",
      Some("""SELECT label, CAST(i - 1 AS INTEGER) AS dim_idx,
             |       round(avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)), 6) AS mean_val
             |FROM embeddings e, LATERAL unnest(range(1, 65)) AS r(i)
             |GROUP BY label, i ORDER BY label, dim_idx""".stripMargin),
      (s, dir) => load(s, dir, "embeddings")
        .select(col("label"), Similarity.toDoubleArray(col("embedding")).as("vec"))
        .groupBy("label")
        .agg(VectorAgg.centroid(col("vec"), 64).as("centroid"))
        .select(col("label"), posexplode(col("centroid")))
        .toDF("label", "dim_idx", "mean_raw")
        .select(col("label"), col("dim_idx"),
          round(col("mean_raw"), 6).as("mean_val"))
        .orderBy("label", "dim_idx")),

    // The IN-list→semi-join rule applied to a 500-id membership filter;
    // results must be identical to the plain IN-list oracle.
    QueryDef("ext_inlist_semijoin_rule", {
      val inList = (0 until 500).map(_ * 7L).mkString(", ")
      Some(s"""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE o_orderkey IN ($inList)
              |ORDER BY o_orderkey""".stripMargin)
    },
      (s, dir) => {
        // inject the rule only for this query's own optimization: force
        // the plan while the rule is active, then restore the session so
        // later queries' plans are untouched (the optimized plan is
        // cached on this Dataset's QueryExecution)
        val ids = (0 until 500).map(i => java.lang.Long.valueOf(i * 7L))
        // snapshot, don't reset to Nil: a caller's own installed rules
        // must survive this query
        val saved = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = saved :+ InListToSemiJoin
        try {
          val df = load(s, dir, "orders")
            .where(col("o_orderkey").isin(ids: _*))
            .select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey")
          df.queryExecution.optimizedPlan // materialize under the rule
          df
        } finally s.experimental.extraOptimizations = saved
      }),

    // IVF ANN: train coarse centroids, probe 4 of 16 inverted lists per
    // query. Rows-only (k-means centroids are fp-order-sensitive, so no
    // SQL oracle); exactness at nprobe==k and recall bounds are asserted
    // in IvfOpsSpec.
    QueryDef("ext_ivf_topk", None,
      (s, dir) => {
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("vec"))
        val centroids = IvfIndex.trainCentroids(corpus, k = 16, iters = 2)
        IvfIndex.topK(corpus, corpus.where(col("vec_id") < 10), centroids,
            k = 5, nprobe = 4)
          .orderBy("query_id", "rank")
      }),

    // Persisted IVF index: the 100 TB shape ext_ivf_topk only gestures
    // at — inverted lists live in a bucketed external table built once;
    // the probe has zero index-build cost and no index-side shuffle.
    // Rows-only (k-means centroids are fp-order-sensitive); parity with
    // the fresh pipeline and the shuffle proof are in IndexStoreSpec.
    QueryDef("ext_ivf_persisted", None,
      (s, dir) => {
        val tbl = "graft_ivf_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_lists")) {
          val centroids = IvfIndex.trainCentroids(corpus, k = 16, iters = 2)
          IndexStore.buildIvfIndex(corpus, centroids, tbl,
            s"/tmp/graft_index/$tbl")
        }
        IndexStore.probeIvf(s, corpus.where(col("vec_id") < 10), tbl,
            k = 5, nprobe = 4)
          .orderBy("query_id", "rank")
      }),

    // Quantized IVF — the actual 100 TB serving shape: inverted lists
    // stored as int8 codes (array<tinyint>, ~4-8× less index I/O than
    // fp64) + per-vector scale, dequantized INSIDE the scoring kernel
    // (native codegen'd Int8Dequantize); list membership identical to
    // the fp index because assignment runs before quantization.
    // Rows-only (k-means centroids fp-order-sensitive); recall@10 ≥ 0.9
    // vs the fp probe and the zero-index-side-shuffle plan are pinned
    // in IndexStoreSpec.
    QueryDef("ext_ivf_quantized", None,
      (s, dir) => {
        val tbl = "graft_ivfq_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_lists")) {
          val centroids = IvfIndex.trainCentroids(corpus, k = 16, iters = 2)
          IndexStore.buildIvfIndexQuantized(corpus, centroids, tbl,
            s"/tmp/graft_index/$tbl")
        }
        IndexStore.probeIvfQuantized(s, corpus.where(col("vec_id") < 10),
            tbl, k = 5, nprobe = 4)
          .orderBy("query_id", "rank")
      }),

    // Duplicate check served from the QUANTIZED IVF index — the
    // read-mostly dedup probe at 100 TB storage cost: planted scaled
    // copies (cosine 1.0) against int8 inverted lists, dequantized in
    // the kernel, with a guard band on the threshold so grid error
    // never drops a true near-dup. Rows-only (trained k-means);
    // recall-vs-fp parity and the guard-band contract are pinned in
    // IndexStoreSpec.
    QueryDef("ext_ivf_neardup_quant", None,
      (s, dir) => {
        val tbl = "graft_ivfnq_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_lists")) {
          val centroids = IvfIndex.trainCentroids(corpus, k = 16, iters = 2)
          IndexStore.buildIvfIndexQuantized(corpus, centroids, tbl,
            s"/tmp/graft_index/$tbl")
        }
        val probes = corpus.where(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"),
            transform(col("vec"), x => x * 2.0d).as("vec"))
        IndexStore.probeIvfNearDupQuantized(s, probes, tbl, nprobe = 4)
          .orderBy("query_id", "match_id")
      }),

    // Persisted MinHash index probed with NEW documents (planted
    // perturbed copies): build once over the corpus, then near-dup-check
    // incoming docs against it — the incremental-ingest dedup shape.
    // Rows-only (LSH banding not SQL-expressible); IndexStoreSpec proves
    // probe parity with Dedup.minhashNearDupPairs.
    QueryDef("ext_minhash_persisted", None,
      (s, dir) => {
        val tbl = "graft_mh_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val docs = load(s, dir, "documents").select("doc_id", "text")
        if (!s.catalog.tableExists(s"${tbl}_bands"))
          IndexStore.buildMinhashIndex(docs, "doc_id", "text", tbl,
            s"/tmp/graft_index/$tbl")
        val probes = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" graft tail")).as("text"))
        IndexStore.probeMinhash(s, probes, "doc_id", "text", tbl)
          .orderBy("query_id", "match_id")
      }),

    // Persisted SimHash index — the third index kind, same
    // build/append/probe lifecycle: one chunk table (signature rides
    // with each of its 4 pigeonhole chunks, so the Hamming verify is a
    // column op, no second join). Rows-only (bit-level LSH not
    // SQL-expressible); parity/append/erasure proven in IndexStoreSpec.
    QueryDef("ext_simhash_persisted", None,
      (s, dir) => {
        val tbl = "graft_shp_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val docs = load(s, dir, "documents").select("doc_id", "text")
        if (!s.catalog.tableExists(s"${tbl}_chunks"))
          IndexStore.buildSimhashIndex(docs, "doc_id", "text", tbl,
            s"/tmp/graft_index/$tbl")
        val probes = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" graft tail")).as("text"))
        IndexStore.probeSimhash(s, probes, "doc_id", "text", tbl)
          .orderBy("query_id", "match_id")
      }),

    // Persisted SRP (hyperplane) index — the fourth index kind: ANN
    // with data-independent directions, so unlike IVF there is no
    // training step and appends never drift. Band table bucketed on the
    // packed band key; vectors stored once in an id-bucketed table for
    // the exact-cosine re-rank. Rows-only (1024 plane coefficients in
    // SQL would be absurd); parity with the inline SrpLsh.topK and the
    // probe plan shape are pinned in SrpLshSpec.
    QueryDef("ext_srp_persisted", None,
      (s, dir) => {
        val tbl = "graft_srp_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_bands"))
          IndexStore.buildSrpIndex(corpus, tbl, s"/tmp/graft_index/$tbl")
        IndexStore.probeSrp(s, corpus.where(col("vec_id") < 10), tbl, k = 5)
          .orderBy("query_id", "rank")
      }),

    // Quantized SRP — the serving shape of the persisted SRP index:
    // same band table (candidates never change), re-rank table stored
    // as int8 codes + scale (~4-8× less re-rank I/O), dequantized
    // inside the cosine kernel. Rows-only; recall@5 ≥ 0.9 vs the fp
    // probe is pinned in IndexStoreSpec.
    QueryDef("ext_srp_quantized", None,
      (s, dir) => {
        val tbl = "graft_srpq_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_bands"))
          IndexStore.buildSrpIndexQuantized(corpus, tbl,
            s"/tmp/graft_index/$tbl")
        IndexStore.probeSrpQuantized(s, corpus.where(col("vec_id") < 10),
            tbl, k = 5)
          .orderBy("query_id", "rank")
      }),

    // Embedding near-dup served from the persisted SRP index — the
    // dedup-at-ingest shape for vectors: planted scaled copies
    // (cos ≈ 1.0) probe against the built index without re-scanning
    // the corpus. Rows-only (LSH banding not SQL-expressible);
    // planted-copy recall and exact-precision spec in IndexStoreSpec.
    QueryDef("ext_srp_neardup", None,
      (s, dir) => {
        val tbl = "graft_srpn_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_bands"))
          IndexStore.buildSrpIndex(corpus, tbl, s"/tmp/graft_index/$tbl")
        val probes = load(s, dir, "embeddings")
          .where(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"),
            transform(Similarity.toDoubleArray(col("embedding")),
              x => x * 1.001).as("vec"))
        IndexStore.probeSrpNearDup(s, probes, tbl)
          .orderBy("query_id", "match_id")
      }),

    // The SRP near-dup check served from QUANTIZED storage — the int8
    // twin of ext_ivf_neardup_quant: same band-join candidates (bands
    // derive from fp query vectors), verify over dequantized codes with
    // the guard band keeping every true pair. Rows-only; fp-parity and
    // serving-shape refusal pinned in IndexStoreSpec.
    QueryDef("ext_srp_neardup_quant", None,
      (s, dir) => {
        val tbl = "graft_srpnq_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_bands"))
          IndexStore.buildSrpIndexQuantized(corpus, tbl,
            s"/tmp/graft_index/$tbl")
        val probes = corpus.where(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"),
            transform(col("vec"), x => x * 1.001).as("vec"))
        IndexStore.probeSrpNearDupQuantized(s, probes, tbl)
          .orderBy("query_id", "match_id")
      }),

    // Incrementally-maintained SRP index: build over half the corpus,
    // append the other half (band rows land in the same stable buckets,
    // signatures never need recomputation), probe the union. Rows-only;
    // append ≡ one-shot parity in SrpLshSpec.
    QueryDef("ext_srp_incremental", None,
      (s, dir) => {
        val tbl = "graft_srpi_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_bands")) {
          IndexStore.buildSrpIndex(corpus.where(col("vec_id") % 2 === 0),
            tbl, s"/tmp/graft_index/$tbl")
          IndexStore.appendSrpIndex(corpus.where(col("vec_id") % 2 === 1), tbl)
        }
        IndexStore.probeSrp(s, corpus.where(col("vec_id") < 10), tbl, k = 5)
          .orderBy("query_id", "rank")
      }),

    // The incremental-ingest dedup loop for EMBEDDINGS, completing the
    // probe/pairs/append symmetry with the MinHash/SimHash instances:
    // scaled copies of indexed vectors (cos ≈ 1.0) are rejected against
    // the index; negated vectors are genuinely novel (cos = −1 to their
    // source) but arrive with a scaled near-copy, so the inline blocked
    // pass keeps each pair's min id; survivors are appended. Returns
    // the accepted ids — deterministic on re-invocation because
    // accepted docs only ever self-match afterwards (self-id filtered).
    // Rows-only (LSH banding); the decision choreography and
    // stability-under-growth are spec'd in IndexStoreSpec.
    QueryDef("ext_srp_ingest", None,
      (s, dir) => {
        val tbl = "graft_srpg_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        // UNCONDITIONAL rebuild (overwrite): the loop's append is a side
        // effect, so a build-once query would hand every later invocation
        // a larger, duplicate-row index — bench reps would time growing
        // work and the median would mean nothing. A fresh build makes
        // every invocation measure the same build+probe+append lifecycle.
        IndexStore.buildSrpIndex(corpus, tbl, s"/tmp/graft_index/$tbl")
        val every20 = corpus.where(col("vec_id") % 20 === 0)
        val batch = every20
          .select((col("vec_id") + 100000).as("vec_id"),
            transform(col("vec"), x => x * 1.001).as("vec"))
          .unionByName(every20.select((col("vec_id") + 300000).as("vec_id"),
            transform(col("vec"), x => x * -1.001).as("vec")))
          .unionByName(every20.select((col("vec_id") + 400000).as("vec_id"),
            transform(col("vec"), x => x * -1.002).as("vec")))
        val (accepted, _) = IndexStore.dedupIngestSrp(s, batch, tbl)
        accepted.select("vec_id").orderBy("vec_id")
      }),

    // Incrementally-maintained IVF index: build inverted lists over the
    // existing corpus, append a later batch assigned against the SAME
    // persisted centroids (IVF practice: the coarse quantizer is trained
    // once, retrained only on drift), then probe. Rows-only (k-means
    // centroids fp-order-sensitive); append ≡ inline parity is in
    // IndexStoreSpec.
    QueryDef("ext_ivf_incremental", None,
      (s, dir) => {
        val tbl = "graft_ivfi_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"),
            Similarity.toDoubleArray(col("embedding")).as("vec"))
        if (!s.catalog.tableExists(s"${tbl}_lists")) {
          val centroids = IvfIndex.trainCentroids(corpus, k = 16, iters = 2)
          IndexStore.buildIvfIndex(corpus.where(col("vec_id") % 2 === 0),
            centroids, tbl, s"/tmp/graft_index/$tbl")
          IndexStore.appendIvfIndex(s, corpus.where(col("vec_id") % 2 === 1), tbl)
        }
        IndexStore.probeIvf(s, corpus.where(col("vec_id") < 10), tbl,
            k = 5, nprobe = 4)
          .orderBy("query_id", "rank")
      }),

    // Incrementally-maintained MinHash index: build over the existing
    // corpus, APPEND a later batch (no rebuild — new band/shingle rows
    // land in the same stable buckets), then near-dup-probe against the
    // combined index. Rows-only (LSH banding not SQL-expressible);
    // IndexStoreSpec proves append ≡ one-shot build over the union.
    QueryDef("ext_minhash_incremental", None,
      (s, dir) => {
        val tbl = "graft_mhi_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val docs = load(s, dir, "documents").select("doc_id", "text")
        if (!s.catalog.tableExists(s"${tbl}_bands")) {
          IndexStore.buildMinhashIndex(docs.where(col("doc_id") % 2 === 0),
            "doc_id", "text", tbl, s"/tmp/graft_index/$tbl")
          IndexStore.appendMinhashIndex(docs.where(col("doc_id") % 2 === 1),
            "doc_id", "text", tbl)
        }
        val probes = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" graft tail")).as("text"))
        IndexStore.probeMinhash(s, probes, "doc_id", "text", tbl)
          .orderBy("query_id", "match_id")
      }),

    // Runtime Bloom-filter join pruning — the optimizer showpiece beside
    // ext_inlist_semijoin_rule: a Bloom filter built from the selective
    // (delta-shaped) orders side is injected into the lineitem scan, so
    // the big side prunes rows BEFORE the join shuffle — at 100 TB this
    // is the difference between shuffling the full fact table and
    // shuffling the ~matching fraction. Catalyst's InjectRuntimeFilter
    // does the rewrite; the scan-size threshold is lowered only while
    // this plan is built (test-scale inputs are far below the 10 GB
    // production default). Results must equal the plain join — the
    // filter is semantics-free pruning. Plan shape asserted in PlansSpec.
    QueryDef("ext_bloom_join_prune",
      Some("""SELECT l_orderkey, l_linenumber, o_totalprice
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) =>
        // locked scope (Ops.withSessionConf): bloom targets shuffle joins
        graft.operators.Ops.withSessionConf(s, Map(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
          val df = load(s, dir, "lineitem")
            .join(load(s, dir, "orders")
              .where(col("o_orderpriority") === "1-URGENT"),
              col("l_orderkey") === col("o_orderkey"))
            .select("l_orderkey", "l_linenumber", "o_totalprice")
            .orderBy("l_orderkey", "l_linenumber")
          // Pin the optimized plan (the injected bloom subquery) while
          // the confs are lowered. The physical shuffle-join + bloom
          // shape is GUARANTEED only under these build-time confs — and
          // that is where PlansSpec asserts it. Harness consumers wrap
          // this df in their own Dataset (selectExpr / write), which
          // re-runs planning under the restored session confs, so the
          // executed form may broadcast the dim side and skip the bloom
          // rewrite; results are identical either way (the filter is
          // semantics-free pruning) — touching executedPlan here could
          // not change that and would only pay a planning pass nothing
          // reuses.
          df.queryExecution.optimizedPlan
          df
        }),

    // Bloom MEMBERSHIP gate (operators.BloomGate, the Dolma-style
    // dedup accelerator): "which incoming docs duplicate the accepted
    // corpus?" answered as broadcast-local bloom bit-test →
    // exact-confirm semi join. Value-identical to the plain semi join
    // (no false negatives; the confirm removes false positives), which
    // is exactly what the oracle checks — while the plan answers the
    // negative majority inside the scan with NO shuffle. Superset/fpp/
    // empty-reference drills in BloomGateSpec.
    QueryDef("ext_bloom_dedup_probe",
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
             |cand AS (
             |  SELECT doc_id, text FROM base WHERE doc_id % 3 <> 0
             |  UNION ALL
             |  SELECT doc_id + 700000, ' ' || text || '  '
             |  FROM base WHERE doc_id % 3 = 0 AND doc_id % 10 = 0),
             |ref AS (
             |  SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
             |  FROM base WHERE doc_id % 3 = 0),
             |cfp AS (
             |  SELECT doc_id,
             |         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
             |  FROM cand)
             |SELECT c.doc_id FROM cfp c JOIN ref r ON c.fp = r.fp
             |ORDER BY c.doc_id""".stripMargin),
      (s, dir) => {
        val base = load(s, dir, "documents").select("doc_id", "text")
        // incoming stream = the non-accepted slice plus whitespace
        // twins of accepted docs — the planted known duplicates
        val cand = base.where(col("doc_id") % 3 =!= 0)
          .unionByName(base
            .where(col("doc_id") % 3 === 0 && col("doc_id") % 10 === 0)
            .select((col("doc_id") + 700000).as("doc_id"),
              concat(lit(" "), col("text"), lit("  ")).as("text")))
          .select(col("doc_id"),
            graft.functions.TextAnalysis.fingerprintMd5(col("text"))
              .as("fp"))
        val ref = base.where(col("doc_id") % 3 === 0)
          .select(graft.functions.TextAnalysis.fingerprintMd5(col("text"))
            .as("fp"))
        graft.operators.BloomGate.memberProbe(cand, ref,
            col("fp"), col("fp"),
            expectedItems = math.max(1L, ref.count()))
          .select("doc_id").orderBy("doc_id")
      }),

    // As-of join (composed: union-tag + running last-ignoring-nulls):
    // each purchase gets the most recent error at-or-before it per user.
    // Verified against DuckDB's native ASOF LEFT JOIN.
    QueryDef("ext_asof_join",
      Some("""SELECT l.event_id AS purchase_id, l.user_id, l.ts,
             |       r.event_id AS last_error_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
             |  ON l.user_id = r.user_id AND r.ts <= l.ts
             |ORDER BY purchase_id""".stripMargin),
      (s, dir) => {
        val events = load(s, dir, "events")
        val purchases = events.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = events.where(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id"))
        TemporalJoins.asofJoin(purchases, errors, "user_id", "ts",
            "event_id", "last_error_id")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts"), col("last_error_id"))
          .orderBy("purchase_id")
      }),

    // Banded range join: same-user purchase/error pairs within 5 minutes,
    // bucketed equi-join + residual filter (no nested-loop cross product).
    QueryDef("ext_range_join",
      Some("""SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
             |       date_diff('second', r.ts, l.ts) AS delta_sec
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
             |JOIN (SELECT * FROM events WHERE event_type = 'error') r
             |  ON l.user_id = r.user_id
             | AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 300 * 1000000
             |ORDER BY l.user_id, l_id, r_id""".stripMargin),
      (s, dir) => {
        val events = load(s, dir, "events")
        TemporalJoins.bandedRangeJoin(
            events.where(col("event_type") === "purchase"),
            events.where(col("event_type") === "error"),
            "user_id", "ts", "ts", toleranceSec = 300)
          .orderBy("user_id", "l_id", "r_id")
      }),

    // Cube: all grouping combinations incl. cross-subtotals.
    QueryDef("ext_cube",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |       round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
      (s, dir) => load(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Grouping sets through the SQL surface (Tables registered as views).
    QueryDef("ext_grouping_sets",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
      (s, dir) => {
        // only the table this query reads: registerAll would re-load
        // ten tables and clobber any same-named session temp views
        load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n
                 FROM lineitem
                 GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
                 ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      }),

    // Exact interpolated percentiles (both engines: linear interpolation).
    // This is the ORACLE KERNEL, not the at-scale path: Spark's exact
    // `percentile` buffers every value of a group in executor memory.
    // ext_approx_percentiles below is the declared scale path.
    QueryDef("ext_percentiles",
      Some("""SELECT l_returnflag,
             |       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) => load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"))
        .orderBy("l_returnflag")),

    // Corpus-RELATIVE quality gate: drop the bottom quartile (and its
    // ties) by quality score. The cutoff is the ⌈n/4⌉-th order
    // statistic — an exact member of the 1e-4-quantized quality grid —
    // NOT an interpolated percentile, whose last-ulp engine differences
    // could flip docs sitting exactly at the threshold. Strict > makes
    // the tie handling deterministic. Because k here GROWS with n, the
    // cutoff goes through Ops.kthOrderedValue (exact rank via the
    // 3-pass bucketed prefix, then a 1-row max aggregate) and NOT
    // `orderBy().limit(k)` — TakeOrderedAndProject with k ∝ n merges a
    // quarter of the corpus's rows on the driver. The oracle keeps the
    // LIMIT form: value-identical by the rank total order, and DuckDB's
    // single-node executor has no driver-funnel notion to avoid.
    QueryDef("ext_quality_percentile_gate",
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      x -> x <> '')) AS DOUBLE) AS n_toks,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS n_alpha,
             |    CAST(length(text) AS DOUBLE) AS n_chars,
             |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      x -> list_contains(['the','and','of','to','a','in','is','it'], x))) AS DOUBLE)
             |      AS n_stop
             |  FROM documents),
             |q AS (
             |  SELECT doc_id,
             |    floor((least(1.0, n_toks / 100.0) * 0.5
             |          + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END) * 0.3
             |          + least(1.0, (CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END) * 4.0) * 0.2)
             |          * 10000.0 + 0.5) / 10000.0 AS quality
             |  FROM m),
             |kk AS (SELECT (count(*) + 3) // 4 AS k FROM q),
             |cut AS (
             |  SELECT max(quality) AS cutoff
             |  FROM (SELECT quality FROM q ORDER BY quality, doc_id
             |        LIMIT (SELECT k FROM kk)))
             |SELECT q.doc_id, q.quality
             |FROM q, cut WHERE q.quality > cut.cutoff
             |ORDER BY q.doc_id""".stripMargin),
      (s, dir) => {
        val q = load(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextAnalysis.qualityScore(col("text"))
              .as("quality"))
          .localCheckpoint() // three consumers: count, cutoff, filter
        val n = q.count()
        val k = ((n + 3) / 4).max(1L)
        graft.operators.Ops.kthOrderedValue[Double](q, col("quality"),
            col("doc_id"), k) match {
          case None => q.where(lit(false)) // empty corpus → empty gate
          case Some(cutoff) =>
            q.where(col("quality") > cutoff).orderBy("doc_id")
        }
      }),

    // Sketch twin of the quartile gate (ext_approx_percentiles twins
    // ext_percentiles the same way): the cutoff comes from ONE
    // approx_percentile aggregate — mergeable partials, bounded memory,
    // no rank pass at all — for pipelines where the exact 3-pass rank's
    // extra shuffle isn't worth the last ±0.01% of the cutoff.
    // Approximate by design → rows-only; ≥99% keep/drop agreement with
    // the exact gate is asserted in PlansSpec.
    QueryDef("ext_quality_gate_approx", None,
      (s, dir) => {
        val q = load(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextAnalysis.qualityScore(col("text"))
              .as("quality"))
        val cut = q.agg(
          percentile_approx(col("quality"), lit(0.25), lit(10000))
            .as("cutoff"))
        q.crossJoin(broadcast(cut))
          .where(col("quality") > col("cutoff"))
          .select("doc_id", "quality")
          .orderBy("doc_id")
      }),

    // Sketch percentiles — the at-scale percentile path: approx_percentile
    // aggregates mergeable partials (bounded memory per group, map-side
    // combine) where exact `percentile` buffers whole groups. Approximate
    // by design → rows-only; the ±0.5% bound vs the exact kernel is
    // asserted in PlansSpec.
    QueryDef("ext_approx_percentiles", None,
      (s, dir) => load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr(
          "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
          .as("pcts"))
        .select(col("l_returnflag"),
          round(col("pcts")(0), 4).as("p25"),
          round(col("pcts")(1), 4).as("p50"),
          round(col("pcts")(2), 4).as("p75"))
        .orderBy("l_returnflag")),

    // HLL-sketch distinct counts — the at-scale replacement for exact
    // countDistinct. Approximations differ across engines by design →
    // rows-only; the ±5% bound vs exact is asserted in PlansSpec.
    QueryDef("ext_approx_distinct", None,
      (s, dir) => load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag")),

    // Incremental distinct-count maintenance via persisted HLL sketches:
    // sketch the history once, PERSIST the binary sketch rows, and fold
    // each new batch in with a sketch union — distinct counts stay
    // current without ever re-scanning history (the corpus-statistics
    // pattern for "unique docs/users so far" at 100 TB, where the
    // rescan is the cost and the sketch is KBs). The roundtrip through
    // parquet is part of the query: estimates come from UNIONING the
    // persisted history sketch with the fresh batch sketch. Rows-only
    // (DuckDB's approx_distinct is a different sketch); union-tracks-
    // one-shot (±2% — the union path re-estimates through a different
    // target representation, so it is close, not bit-identical) and
    // ±5%-of-exact are spec'd in PlansSpec.
    QueryDef("ext_hll_incremental", None,
      (s, dir) => {
        val li = load(s, dir, "lineitem")
        val hist = li.where(col("l_orderkey") % 10 < 8)
          .groupBy("l_returnflag")
          .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
        val histPath = "/tmp/graft_hll/" +
          dir.replaceAll("[^a-zA-Z0-9]", "_")
        hist.write.mode("overwrite").parquet(histPath)
        val batch = li.where(col("l_orderkey") % 10 >= 8)
          .groupBy("l_returnflag")
          .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
        s.read.parquet(histPath).unionAll(batch)
          .groupBy("l_returnflag")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
            .as("approx_orders"))
          .orderBy("l_returnflag")
      }),

    // Hyperplane (SRP) LSH ANN — data-independent projection directions,
    // banded signature buckets. Rows-only (1024 plane coefficients in a
    // SQL oracle would be absurd); recall and planted-pair recovery are
    // asserted in SrpLshSpec.
    QueryDef("ext_srp_topk", None,
      (s, dir) => {
        val corpus = load(s, dir, "embeddings")
          .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("vec"))
        SrpLsh.topK(corpus, corpus.where(col("vec_id") < 10), k = 5)
          .orderBy("query_id", "rank")
      }),

    // Six-table star join (TPC-H Q5 shape) — the canonical OLAP pattern:
    // fact table joined through a broadcast-dim chain (region → nation →
    // supplier/customer) with the local-supplier correlation
    // (c_nationkey = s_nationkey), selective filters pushed to the
    // scans, and an exact integer-cents revenue sum (per-row floor
    // quantization makes the aggregate order-independent, so it is
    // reproducible across engines AND across partition schedules —
    // summing raw doubles is neither). Catalyst plans the dims as
    // broadcast joins; only fact-side joins shuffle.
    QueryDef("ext_star_join",
      Some("""SELECT n_name,
             |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, dir) => load(s, dir, "lineitem")
        .join(load(s, dir, "orders")
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(load(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(load(s, dir, "region"))
          .where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100 + 0.5).cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")),

    // Corpus-trained bigram-LM perplexity scoring with CCNet-style
    // head/middle/tail banding: train add-one-smoothed bigram counts on
    // the 80% doc_id-hash slice, score the held-out 20% as integer
    // milli-bits of cross-entropy per token (order-independent integer
    // sums — see NgramLm's determinism doctrine), band by exact tercile
    // over the per-doc aggregate. Fully value-checked: every per-bigram
    // quantity is an exact integer or an exactly-rounded double on both
    // engines.
    QueryDef("ext_lm_perplexity",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_prepend('<s>',
             |      CASE WHEN regexp_replace(lower(text), '^\s+|\s+$', '', 'g') = ''
             |           THEN CAST([] AS VARCHAR[])
             |           ELSE string_split_regex(
             |                  regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')
             |      END) AS toks
             |  FROM documents),
             |big AS (
             |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg, toks[i] AS prev
             |  FROM tok, unnest(range(1, len(toks))) AS r(i)),
             |bc AS (
             |  SELECT bg, count(*) AS cb FROM big WHERE doc_id % 10 < 8 GROUP BY 1),
             |cc AS (
             |  SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(cb) AS BIGINT) AS cctx
             |  FROM bc GROUP BY 1),
             |v AS (
             |  SELECT count(DISTINCT t) + 1 AS vsize
             |  FROM (SELECT unnest(toks) AS t FROM tok WHERE doc_id % 10 < 8)),
             |scored AS (
             |  SELECT e.doc_id,
             |    CAST(floor(-log2((coalesce(bc.cb, 0) + 1.0) /
             |                     (coalesce(cc.cctx, 0) + v.vsize))
             |               * 1000.0 + 0.5) AS BIGINT) AS h_milli
             |  FROM big e
             |  LEFT JOIN bc ON e.bg = bc.bg
             |  LEFT JOIN cc ON e.prev = cc.prev
             |  CROSS JOIN v
             |  WHERE e.doc_id % 10 >= 8),
             |agg AS (
             |  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(h_milli) AS BIGINT) AS h_total
             |  FROM scored GROUP BY 1),
             |o AS (
             |  SELECT doc_id, n_bigrams,
             |    CAST(floor(h_total * 1.0 / n_bigrams + 0.5) AS BIGINT) AS h_milli_tok
             |  FROM agg)
             |SELECT doc_id, n_bigrams, h_milli_tok,
             |  CASE ntile(3) OVER (ORDER BY h_milli_tok, doc_id)
             |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS band
             |FROM o ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = load(s, dir, "documents")
        val model = NgramLm.train(docs.where(col("doc_id") % 10 < 8),
          eagerCounts = true) // scored immediately below (convoy fix)
        NgramLm.withBands(
            NgramLm.scoreMicroBits(model, docs.where(col("doc_id") % 10 >= 8)))
          .orderBy("doc_id")
      }),

    // Interpolated (Jelinek-Mercer) LM scoring — half bigram, half
    // unigram evidence, both add-one smoothed; the unigram statistics
    // DERIVE from the bigram count table (second-endpoint rollup), so
    // the persisted model needs no extra state. Fully value-checked
    // like the rest of the LM family.
    QueryDef("ext_lm_interp",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_prepend('<s>',
             |      CASE WHEN regexp_replace(lower(text), '^\s+|\s+$', '', 'g') = ''
             |           THEN CAST([] AS VARCHAR[])
             |           ELSE string_split_regex(
             |                  regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')
             |      END) AS toks
             |  FROM documents),
             |big AS (
             |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg, toks[i] AS prev
             |  FROM tok, unnest(range(1, len(toks))) AS r(i)),
             |bc AS (
             |  SELECT bg, count(*) AS cb FROM big WHERE doc_id % 10 < 8 GROUP BY 1),
             |cc AS (
             |  SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(cb) AS BIGINT) AS cctx
             |  FROM bc GROUP BY 1),
             |uc AS (
             |  SELECT string_split(bg, ' ')[2] AS cur, CAST(sum(cb) AS BIGINT) AS cu
             |  FROM bc GROUP BY 1),
             |nt AS (SELECT CAST(sum(cb) AS BIGINT) AS ntok FROM bc),
             |v AS (
             |  SELECT count(DISTINCT t) + 1 AS vsize
             |  FROM (SELECT unnest(toks) AS t FROM tok WHERE doc_id % 10 < 8)),
             |scored AS (
             |  SELECT e.doc_id,
             |    CAST(floor(-log2(
             |        ((coalesce(bc.cb, 0) + 1.0) / (coalesce(cc.cctx, 0) + v.vsize)
             |         + (coalesce(uc.cu, 0) + 1.0) / (nt.ntok + v.vsize)) / 2.0)
             |      * 1000.0 + 0.5) AS BIGINT) AS h_milli
             |  FROM big e
             |  LEFT JOIN bc ON e.bg = bc.bg
             |  LEFT JOIN cc ON e.prev = cc.prev
             |  LEFT JOIN uc ON string_split(e.bg, ' ')[2] = uc.cur
             |  CROSS JOIN nt
             |  CROSS JOIN v
             |  WHERE e.doc_id % 10 >= 8),
             |agg AS (
             |  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(h_milli) AS BIGINT) AS h_total
             |  FROM scored GROUP BY 1)
             |SELECT doc_id, n_bigrams,
             |  CAST(floor(h_total * 1.0 / n_bigrams + 0.5) AS BIGINT) AS h_milli_tok
             |FROM agg ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = load(s, dir, "documents")
        val model = NgramLm.train(docs.where(col("doc_id") % 10 < 8),
          eagerCounts = true) // scored immediately below (convoy fix)
        NgramLm.scoreInterpolated(model, docs.where(col("doc_id") % 10 >= 8))
          .orderBy("doc_id")
      }),

    // Corpus token heavy hitters with running coverage — the
    // tokenizer-design statistic. Top-k is a distributed
    // TakeOrderedAndProject (never a global sort); the cumulative
    // window runs over the already-limited k rows. The windowed sum is
    // CAST in the oracle (DuckDB windowed sum(BIGINT) → HUGEINT; same
    // pattern as ext_sessionize).
    QueryDef("ext_vocab_coverage",
      Some("""WITH tok AS (
             |  SELECT unnest(
             |    CASE WHEN regexp_replace(lower(text), '^\s+|\s+$', '', 'g') = ''
             |         THEN CAST([] AS VARCHAR[])
             |         ELSE string_split_regex(
             |                regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')
             |    END) AS token
             |  FROM documents),
             |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
             |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 50),
             |r AS (
             |  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
             |    token, cnt,
             |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
             |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
             |  FROM top)
             |SELECT rank, token, cnt, cum_cnt,
             |  CAST(floor(cum_cnt * 1000000.0 / total + 0.5) AS BIGINT) AS cum_share_micro
             |FROM r CROSS JOIN tot ORDER BY rank""".stripMargin),
      (s, dir) => NgramLm.vocabCoverage(load(s, dir, "documents"))),

    // Per-source token-distribution drift — KL(source ‖ corpus) in
    // integer micro-bits, the data-mixing diagnostic. Per-term
    // quantization before the per-source sum keeps the aggregate an
    // order-independent integer sum (the LM determinism doctrine);
    // every source token exists in the corpus, so q > 0 unsmoothed.
    QueryDef("ext_source_kl",
      Some("""WITH tok AS (
             |  SELECT source, unnest(
             |    CASE WHEN regexp_replace(lower(text), '^\s+|\s+$', '', 'g') = ''
             |         THEN CAST([] AS VARCHAR[])
             |         ELSE string_split_regex(
             |                regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')
             |    END) AS token
             |  FROM documents),
             |sc AS (SELECT source, token, count(*) AS cs FROM tok GROUP BY 1, 2),
             |stot AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM sc GROUP BY 1),
             |ct AS (SELECT token, CAST(sum(cs) AS BIGINT) AS c FROM sc GROUP BY 1),
             |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ct),
             |terms AS (
             |  SELECT sc.source,
             |    CAST(floor((sc.cs / stot.ns) *
             |               log2((sc.cs * n.n) / (stot.ns * ct.c)) * 1000000.0 + 0.5)
             |      AS BIGINT) AS term_micro,
             |    sc.cs
             |  FROM sc
             |  JOIN stot USING (source)
             |  JOIN ct USING (token)
             |  CROSS JOIN n)
             |SELECT source, CAST(sum(cs) AS BIGINT) AS n_tokens,
             |  count(*) AS n_types, CAST(sum(term_micro) AS BIGINT) AS kl_micro
             |FROM terms GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => NgramLm.sourceTokenKl(load(s, dir, "documents"),
        eagerCounts = true)), // consumed immediately (convoy fix)

    // Quality-vs-perplexity CALIBRATION matrix: the held-out slice
    // banded into terciles by BOTH quality models — the heuristic
    // score and the corpus-trained LM — with doc counts per cell. A
    // diagonal-heavy matrix means the cheap heuristic agrees with the
    // statistical model; off-diagonal mass is where one filter would
    // cut what the other keeps — the tuning read before swapping
    // filters on a corpus. Both terciles are the exact DISTRIBUTED
    // ntile (Ops.withGlobalNtile over the 3-pass bucketed rank) —
    // value-identical to the windowed ntile the oracle runs, with no
    // single-task global sort in the plan.
    QueryDef("ext_quality_lm_matrix",
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    list_prepend('<s>',
             |      CASE WHEN regexp_replace(lower(text), '^\s+|\s+$', '', 'g') = ''
             |           THEN CAST([] AS VARCHAR[])
             |           ELSE string_split_regex(
             |                  regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')
             |      END) AS toks
             |  FROM documents),
             |big AS (
             |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg, toks[i] AS prev
             |  FROM tok, unnest(range(1, len(toks))) AS r(i)),
             |bc AS (
             |  SELECT bg, count(*) AS cb FROM big WHERE doc_id % 10 < 8 GROUP BY 1),
             |cc AS (
             |  SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(cb) AS BIGINT) AS cctx
             |  FROM bc GROUP BY 1),
             |v AS (
             |  SELECT count(DISTINCT t) + 1 AS vsize
             |  FROM (SELECT unnest(toks) AS t FROM tok WHERE doc_id % 10 < 8)),
             |scored AS (
             |  SELECT e.doc_id,
             |    CAST(floor(-log2((coalesce(bc.cb, 0) + 1.0) /
             |                     (coalesce(cc.cctx, 0) + v.vsize))
             |               * 1000.0 + 0.5) AS BIGINT) AS h_milli
             |  FROM big e
             |  LEFT JOIN bc ON e.bg = bc.bg
             |  LEFT JOIN cc ON e.prev = cc.prev
             |  CROSS JOIN v
             |  WHERE e.doc_id % 10 >= 8),
             |hm AS (
             |  SELECT doc_id,
             |    CAST(floor(sum(h_milli) * 1.0 / count(*) + 0.5) AS BIGINT) AS h_milli_tok
             |  FROM scored GROUP BY 1),
             |qm AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      x -> x <> '')) AS DOUBLE) AS n_toks,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS n_alpha,
             |    CAST(length(text) AS DOUBLE) AS n_chars,
             |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      x -> list_contains(['the','and','of','to','a','in','is','it'], x))) AS DOUBLE)
             |      AS n_stop
             |  FROM documents WHERE doc_id % 10 >= 8),
             |q AS (
             |  SELECT doc_id,
             |    floor((least(1.0, n_toks / 100.0) * 0.5
             |          + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END) * 0.3
             |          + least(1.0, (CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END) * 4.0) * 0.2)
             |          * 10000.0 + 0.5) / 10000.0 AS quality
             |  FROM qm),
             |lb AS (SELECT doc_id, ntile(3) OVER (ORDER BY h_milli_tok, doc_id) AS lm_band FROM hm),
             |qb AS (SELECT doc_id, ntile(3) OVER (ORDER BY quality DESC, doc_id) AS q_band FROM q)
             |SELECT qb.q_band, lb.lm_band, CAST(count(*) AS BIGINT) AS n_docs
             |FROM qb JOIN lb ON qb.doc_id = lb.doc_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val docs = load(s, dir, "documents")
        val model = NgramLm.train(docs.where(col("doc_id") % 10 < 8),
          eagerCounts = true) // scored immediately below (convoy fix)
        val held = docs.where(col("doc_id") % 10 >= 8)
        // both terciles via the exact distributed ntile (Ops
        // .withGlobalNtile) — no partitionBy-less window anywhere;
        // q_band's DESC leading key negates into the bucket key
        val lb = Ops.withGlobalNtile(
            NgramLm.scoreMicroBits(model, held),
            Seq(col("h_milli_tok"), col("doc_id")), col("h_milli_tok"),
            k = 3, outCol = "lm_band")
          .select("doc_id", "lm_band")
        val qb = Ops.withGlobalNtile(
            held.select(col("doc_id"),
              graft.functions.TextAnalysis.qualityScore(col("text"))
                .as("quality")),
            Seq(col("quality").desc, col("doc_id")), -col("quality"),
            k = 3, outCol = "q_band")
          .select("doc_id", "q_band")
        qb.join(lb, "doc_id")
          .groupBy("q_band", "lm_band")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("q_band", "lm_band")
      }),

    // Skew-mitigated salted join: results must equal the plain join.
    QueryDef("ext_salted_join",
      Some("""SELECT l_orderkey, l_linenumber, o_totalprice
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => Ops.saltedJoin(
          load(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
          load(s, dir, "orders").select("o_orderkey", "o_totalprice"),
          "o_orderkey", nSalts = 8)
        .select(col("o_orderkey").as("l_orderkey"), col("l_linenumber"),
          col("o_totalprice"))
        .orderBy("l_orderkey", "l_linenumber")))
}
