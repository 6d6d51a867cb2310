package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.{Centrality, Components, Dedup, IndexStore}

/** Graph-centrality queries — the link-authority signal of web-corpus
  * curation (PageRank, Page et al. 1999). Common Crawl ships host-level
  * PageRank/harmonic-centrality ranks that corpus builders consume as
  * crawl-priority and quality-weight inputs; within a near-dup cluster
  * the highest-centrality copy is the natural canonical document. The
  * reference pipeline has no graph step (its world is one table of 311
  * cases); this family is part of the LLM-training-data surface, like
  * the dedup/DSIR/sketch families.
  *
  * All ranks are [[Centrality]]'s fixed-point longs, so every query
  * here is VALUE-oracle'd in DuckDB — no float tolerance anywhere.
  * Fixtures: the bounded planted near-dup corpus (doc_id < 50 plus
  * ' graft tail' copies — same fixture as ext_dedup_clusters, so the
  * recursive-CTE clustering oracle carries over) and the organic
  * cross-source shared-line graph over the full documents table.
  */
object GraphQueries {

  /** The ext_dedup_clusters bounded corpus (doc_id < 50 so all-pairs
    * exact Jaccard stays DuckDB-expressible; the production pair
    * kernel is the LSH one, d2/ext_crossdoc_*) plus a SECOND plant
    * tier: every 10th doc gets a ' graft tail two' copy as well, so
    * the pair graph has size-3 clusters with varied in/out degrees —
    * a single-tier plant graph ranks every linked node identically,
    * which would leave the update rule under-exercised in the hash. */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "documents").select("doc_id", "text")
      .where(col("doc_id") < 50)
    base
      .unionAll(base.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" graft tail")).as("text")))
      .unionAll(base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" graft tail two")).as("text")))
  }

  /** Directed near-dup pairs (id_a < id_b) over the bounded fixture —
    * the doc-level edge list for the rank queries. */
  private def nearDupPairs(corpus: DataFrame): DataFrame = {
    val sh = corpus.select(col("doc_id"),
      array_distinct(Dedup.wordShingles(col("text"), 3)).as("shingles"))
    sh.alias("a")
      .join(sh.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .where(Dedup.jaccard(col("a.shingles"), col("b.shingles")) >= 0.6)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
  }

  /** corpus/sh/pairs CTE text — identical to the ext_dedup_clusters
    * oracle so the two families stay verifiably on one fixture. */
  private val pairCtes: String =
    """corpus AS MATERIALIZED (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 50
      |  UNION ALL
      |  SELECT doc_id + 100000, text || ' graft tail' FROM documents
      |  WHERE doc_id < 50 AND doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' graft tail two' FROM documents
      |  WHERE doc_id < 50 AND doc_id % 10 = 0),
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS shingles
      |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |        FROM corpus)),
      |pairs AS MATERIALIZED (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
      |        >= 0.6),
      |nodes AS (SELECT doc_id AS id FROM corpus),
      |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst, CAST(1 AS BIGINT) AS w
      |          FROM pairs)""".stripMargin

  /** Shared oracle for the batch (ext_source_authority), persisted
    * (ext_authority_persisted / ext_authority_unlearn) and streaming
    * (sr38) authority forms — serving from the store is value-invisible
    * whenever the indexed corpus IS the documents table, and the
    * unlearn form's junk slice cancels exactly (the commutative-group
    * argument), so ONE SQL checks all four. */
  /** The authority rank derivation as a reusable CTE-chain body
    * (ranks land in `pr_r4(id, r)`) — shared by [[authorityOracleSql]]
    * and the rank-aware corpus-build keeper oracle
    * (ext_corpus_build_authority), so the two queries provably price
    * the same ranks. */
  /** Just the capped shared-shingle EDGE derivation (nodes/edges) —
    * the graph both rank families (PageRank authority, harmonic) read. */
  private[graft] val authorityEdgeCtes: String =
    s"""tok AS MATERIALIZED (
       |  SELECT source,
       |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |      x -> x <> '') AS t
       |  FROM documents),
       |sg AS MATERIALIZED (
       |  SELECT DISTINCT source, md5(array_to_string(t[i:i+7], ' ')) AS ph
       |  FROM tok, unnest(range(1, len(t) - 6)) AS r(i)
       |  WHERE len(t) >= 8),
       |${Centrality.cappedShinglesCte("sg", "sgk")},
       |nodes AS (SELECT DISTINCT source AS id FROM documents),
       |edges AS MATERIALIZED (
       |  SELECT a.source AS src, b.source AS dst,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM sgk a JOIN sgk b ON a.ph = b.ph AND a.source <> b.source
       |  GROUP BY 1, 2)""".stripMargin

  private[graft] val authorityRankCtes: String =
    s"""$authorityEdgeCtes,
       |${Centrality.oracleCtes("nodes", "edges", iters = 4,
          weighted = true)}""".stripMargin

  private[graft] val authorityOracleSql: String =
    s"""WITH $authorityRankCtes
       |SELECT id AS source, r AS rank_fp
       |FROM pr_r4 ORDER BY source""".stripMargin

  /** Inline source-authority ranks (source, rank_fp) — the
    * ext_source_authority computation, reusable as keeper priorities
    * (ext_corpus_build_authority feeds it into
    * [[graft.operators.CorpusBuild.build]]). */
  private[graft] def sourceAuthorityRanks(s: SparkSession, dir: String)
      : DataFrame = {
    val docs = load(s, dir, "documents").select("source", "text")
    // pin the (source, ph) count table: the edge aggregation and the
    // node distinct both consume it, and the bounded serve's two
    // limit-probes would otherwise re-run the corpus shingle pass
    val shingles = graft.operators.Ops.checkpointKeepPartitioning(
      Centrality.sourceShingles(docs), eager = true)
    // bounded-graph serve (r17, the authorityFromIndex stance):
    // driver-exact fixed point when the source graph fits the gates.
    // NODES stay the corpus's distinct sources (not the shingle
    // table's): a source whose docs shingle to nothing is still a
    // vertex — dropping it would shift every rank's baseShare.
    val ranks = Centrality.pageRankBoundedWeighted(
        docs.select(col("source").as("id")).distinct(),
        Centrality.sharedShingleEdges(shingles),
        iters = 4)
      .select(col("id").as("source"), col("rank_fp"))
    graft.operators.Ops.freeLogicalRddBlocks(shingles)
    ranks
  }

  /** Inline source-harmonic ranks (source, harmonic_fp) — the
    * ext_source_harmonic computation (3-hop exact form over the same
    * capped shared-shingle graph), reusable as the SECOND keeper
    * priority signal (ext_corpus_build_harmonic): Common Crawl
    * publishes both ranks because they disagree usefully — PageRank
    * weights by who links, harmonic by how close everyone is. */
  private[graft] def sourceHarmonicRanks(s: SparkSession, dir: String)
      : DataFrame = {
    val docs = load(s, dir, "documents").select("source", "text")
    Centrality.harmonicCentrality(
        docs.select(col("source").as("id")).distinct(),
        Centrality.sharedShingleEdges(Centrality.sourceShingles(docs)),
        maxDist = 3)
      .select(col("id").as("source"), col("harmonic_fp"))
  }

  private[graft] val defs: Seq[QueryDef] = Seq(

    // Fixed-point PageRank over the directed near-dup graph: most
    // fixture nodes have no out-edge, so the dangling-mass
    // redistribution — the term a naive implementation drops — is
    // load-bearing in the oracle hash, not decorative. 5 fixed
    // iterations, damping 0.85, every value an exact BIGINT.
    QueryDef("ext_graph_pagerank",
      Some(s"""WITH $pairCtes,
              |${Centrality.oracleCtes("nodes", "edges", iters = 5)}
              |SELECT id AS doc_id, r AS rank_fp
              |FROM pr_r5 ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val corpus = nearDupCorpus(s, dir)
        Centrality.pageRank(
            corpus.select(col("doc_id").as("id")),
            nearDupPairs(corpus), iters = 5,
            srcCol = "id_a", dstCol = "id_b")
          .select(col("id").as("doc_id"), col("rank_fp"))
          .orderBy("doc_id")
      }),

    // Source-level AUTHORITY from the organic shared-content graph:
    // source A links to source B with weight = #distinct word-8-gram
    // fingerprints they share (the cross-doc span-dedup kernel — the
    // fixture corpus has ~1k organic cross-doc repeats, and two
    // sources share none, so weighted shares AND the dangling path
    // both carry mass in the hash). The per-source DISTINCT
    // fingerprint table bounds the pair join at #sources² rows per
    // fingerprint no matter how hot a boilerplate shingle is — the
    // corpus never self-joins. Weighted fixed-point PageRank, 4
    // iterations: the Common-Crawl-style host-rank a curation
    // pipeline reads as a per-source quality weight.
    QueryDef("ext_source_authority",
      Some(authorityOracleSql),
      (s, dir) => sourceAuthorityRanks(s, dir).orderBy("source")),

    // Rank-aware keeper selection — the composition the scaladoc
    // promises: connected components pick the cluster, PageRank picks
    // the REPRESENTATIVE (highest in-cluster authority, min-id
    // tiebreak) instead of the arbitrary min-id keeper. Keeper choice
    // is a struct-min AGGREGATE (lexicographic on (-rank, id)), never
    // a window over the component — the hot-cluster doctrine.
    QueryDef("ext_graph_rank_keeper",
      Some(s"""WITH RECURSIVE $pairCtes,
              |sym AS (SELECT src, dst FROM edges
              |        UNION SELECT dst, src FROM edges),
              |cc AS (
              |  SELECT src AS id, src AS label FROM sym
              |  UNION
              |  SELECT e.dst, cc.label FROM cc JOIN sym e ON cc.id = e.src),
              |comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id),
              |lab AS (
              |  SELECT n.id, coalesce(p.component, n.id) AS component
              |  FROM nodes n LEFT JOIN comp p ON n.id = p.id),
              |${Centrality.oracleCtes("nodes", "edges", iters = 5)},
              |ranked AS (
              |  SELECT l.id, l.component, r.r
              |  FROM lab l JOIN pr_r5 r ON l.id = r.id),
              |agg AS (
              |  SELECT component, min(ROW(-r, id)) AS mk,
              |    CAST(count(*) AS BIGINT) AS cluster_size
              |  FROM ranked GROUP BY 1)
              |SELECT a.component, k.id AS keeper_id, k.r AS keeper_rank_fp,
              |  a.cluster_size
              |FROM agg a JOIN ranked k
              |  ON k.component = a.component AND ROW(-k.r, k.id) = a.mk
              |ORDER BY a.component""".stripMargin),
      (s, dir) => {
        val corpus = nearDupCorpus(s, dir)
        val pairs = nearDupPairs(corpus)
        val nodes = corpus.select(col("doc_id").as("id"))
        val comp = Components.connectedComponents(pairs)
        val lab = nodes
          .join(comp, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("component"), col("id")).as("component"))
        val ranks = Centrality.pageRank(nodes, pairs, iters = 5,
          srcCol = "id_a", dstCol = "id_b")
        lab.join(ranks, "id")
          .groupBy("component")
          .agg(min(struct(negate(col("rank_fp")).as("negr"),
              col("id").as("keeper_id"),
              col("rank_fp").as("keeper_rank_fp"))).as("mk"),
            count(lit(1)).as("cluster_size"))
          .select(col("component"), col("mk.keeper_id").as("keeper_id"),
            col("mk.keeper_rank_fp").as("keeper_rank_fp"),
            col("cluster_size"))
          .orderBy("component")
      }),

    // Curated-seed EXPANSION via personalized PageRank: the restart
    // distribution concentrates on a trusted seed set, so ranks
    // measure proximity-to-seeds over the near-dup graph (the CCNet
    // seed-expansion shape) — and a doc with NO path from the seeds
    // holds exactly zero, an integer reachability statement the
    // oracle hashes rather than an epsilon cutoff. Output: the
    // seed-reachable docs with their proximity ranks.
    QueryDef("ext_graph_seed_expand",
      Some(s"""WITH $pairCtes,
              |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |        UNION SELECT id_b, id_a FROM pairs),
              |edgesw AS (SELECT src, dst, CAST(1 AS BIGINT) AS w FROM sym),
              |seeds AS (
              |  SELECT doc_id AS id FROM corpus
              |  WHERE doc_id < 50 AND doc_id % 10 = 0),
              |${Centrality.seededOracleCtes("nodes", "edgesw", "seeds",
                 iters = 5)}
              |SELECT id AS doc_id, r AS rank_fp
              |FROM pp_r5 WHERE r > 0 ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val corpus = nearDupCorpus(s, dir)
        val pairs = nearDupPairs(corpus)
        val sym = pairs
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionAll(pairs
            .select(col("id_b").as("src"), col("id_a").as("dst")))
        val seeds = corpus
          .where(col("doc_id") < 50 && col("doc_id") % 10 === 0)
          .select(col("doc_id").as("id"))
        Centrality.personalizedPageRank(
            corpus.select(col("doc_id").as("id")), sym, seeds, iters = 5)
          .where(col("rank_fp") > 0)
          .select(col("id").as("doc_id"), col("rank_fp"))
          .orderBy("doc_id")
      }),

    // HARMONIC centrality beside PageRank over the same near-dup graph
    // — the other rank Common Crawl ships (Boldi & Vigna 2014):
    // H_fp(v) = Σ_u HarmonicScale div d(u,v) within a 4-hop horizon,
    // exact BFS over the symmetrized pair graph (bounded fixture — the
    // all-pairs reach state is the deliberate bounded-vertex-set scope;
    // see the operator scaladoc). Integer distances and divisions, so
    // the whole rank table value-hashes; isolated docs hold exactly 0.
    QueryDef("ext_graph_harmonic",
      Some(s"""WITH $pairCtes,
              |hsym AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |         UNION SELECT id_b, id_a FROM pairs),
              |${Centrality.harmonicOracleCtes("nodes", "hsym",
                 maxDist = 4)}
              |SELECT id AS doc_id, harmonic_fp
              |FROM hc ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val corpus = nearDupCorpus(s, dir)
        val pairs = nearDupPairs(corpus)
        val sym = pairs
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionAll(pairs
            .select(col("id_b").as("src"), col("id_a").as("dst")))
        Centrality.harmonicCentrality(
            corpus.select(col("doc_id").as("id")), sym, maxDist = 4)
          .select(col("id").as("doc_id"), col("harmonic_fp"))
          .orderBy("doc_id")
      }),

    // The SKETCHED form beside the exact one: HyperBall (Boldi & Vigna
    // 2013) over the same symmetrized near-dup graph and horizon —
    // per-node HLL in-ball counters max-merged along edges, O(n·512)
    // register state where the exact form's reached table is O(n²).
    // The whole sketch VALUE-hashes: md5 registers, integer raw
    // estimate, and the linear-counting correction via the integer
    // LcTable spliced into both engines from one Scala array — the
    // oracle replays every level bit-for-bit (no agreement band needed
    // HERE; the band vs the exact rank is asserted in CentralitySpec,
    // where approximation quality — not engine correctness — is the
    // question).
    QueryDef("ext_graph_harmonic_hyperball",
      Some(s"""WITH $pairCtes,
              |hsym AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |         UNION SELECT id_b, id_a FROM pairs),
              |${Centrality.hyperBallOracleCtes("nodes", "hsym",
                 maxDist = 4)}
              |SELECT id AS doc_id, harmonic_fp
              |FROM hb ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val corpus = nearDupCorpus(s, dir)
        val pairs = nearDupPairs(corpus)
        val sym = pairs
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionAll(pairs
            .select(col("id_b").as("src"), col("id_a").as("dst")))
        Centrality.harmonicHyperBall(
            corpus.select(col("doc_id").as("id")), sym, maxDist = 4)
          .select(col("id").as("doc_id"), col("harmonic_fp"))
          .orderBy("doc_id")
      }),

    // The HyperANF neighbourhood report off the SAME counter cascade
    // (Boldi & Vigna 2011): per node, the estimated in-ball size at
    // the horizon (reach — isolated docs report exactly 1, themselves)
    // and the estimated sum of in-distances (total_dist — the
    // closeness denominator). One dataflow serves this and the
    // harmonic rank (two selections of hyperBallState); the oracle's
    // hbr CTE replays both columns off the identical register chain.
    QueryDef("ext_graph_reach_hyperball",
      Some(s"""WITH $pairCtes,
              |hsym AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |         UNION SELECT id_b, id_a FROM pairs),
              |${Centrality.hyperBallOracleCtes("nodes", "hsym",
                 maxDist = 4)}
              |SELECT id AS doc_id, reach, total_dist
              |FROM hbr ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val corpus = nearDupCorpus(s, dir)
        val pairs = nearDupPairs(corpus)
        val sym = pairs
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionAll(pairs
            .select(col("id_b").as("src"), col("id_a").as("dst")))
        Centrality.hyperBallReport(
            corpus.select(col("doc_id").as("id")), sym, maxDist = 4)
          .select(col("id").as("doc_id"), col("reach"),
            col("total_dist"))
          .orderBy("doc_id")
      }),

    // HARMONIC centrality at SOURCE level over the same capped
    // shared-shingle graph the authority rank reads — Common Crawl
    // publishes both ranks over one host graph, and they disagree
    // usefully: PageRank weights by who links, harmonic by how CLOSE
    // everyone is (distance, weights ignored). #sources is bounded, so
    // the exact all-pairs BFS is the right tool here (the operator's
    // declared scope); 3-hop horizon covers the fixture graph's
    // diameter. Organically dangling sources score 0 exactly.
    QueryDef("ext_source_harmonic",
      Some(s"""WITH $authorityEdgeCtes,
              |${Centrality.harmonicOracleCtes("nodes", "edges",
                 maxDist = 3)}
              |SELECT id AS source, harmonic_fp
              |FROM hc ORDER BY source""".stripMargin),
      (s, dir) => {
        val docs = load(s, dir, "documents").select("source", "text")
        Centrality.harmonicCentrality(
            docs.select(col("source").as("id")).distinct(),
            Centrality.sharedShingleEdges(
              Centrality.sourceShingles(docs)),
            maxDist = 3)
          .select(col("id").as("source"), col("harmonic_fp"))
          .orderBy("source")
      }),

    // Authority served from the PERSISTED source-shingle table (16th
    // index kind): build on half the corpus, append the other half —
    // the counts form a commutative group over document sets, so
    // append ≡ one-shot rebuild and the serving ranks hash-match the
    // inline form's oracle exactly. At 100 TB the shingle pass runs
    // once at build/append time; every rank read after that is
    // O(#sources² edges + fixed iterations), zero corpus reads.
    QueryDef("ext_authority_persisted",
      Some(authorityOracleSql),
      (s, dir) => {
        val tbl = "graft_auth_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        s.sql(s"DROP TABLE IF EXISTS ${tbl}_aph")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"/tmp/graft_index/$tbl"))
        val docs = load(s, dir, "documents")
          .select("doc_id", "source", "text")
        IndexStore.buildAuthorityIndex(
          docs.where(col("doc_id") % 2 === 0), "source", "doc_id",
          "text", tbl, s"/tmp/graft_index/$tbl", batchKey = 0L)
        IndexStore.appendAuthorityIndex(
          docs.where(col("doc_id") % 2 =!= 0), "source", "doc_id",
          "text", tbl, batchKey = 1L)
        IndexStore.authorityFromIndex(s, tbl).orderBy("source")
      }),

    // Exact UNLEARNING on the authority graph: junk docs (a shared
    // cross-source boilerplate tail — exactly the contamination that
    // would inflate shared-content authority) are indexed, then taken
    // down by negated count rows. The ranks REVERT to the clean
    // corpus's bit-for-bit — same oracle as the never-contaminated
    // form, the span-DF/LM commutative-group argument at the rank
    // level: an erasure request provably removes a document's entire
    // influence on the published source ranks.
    QueryDef("ext_authority_unlearn",
      Some(authorityOracleSql),
      (s, dir) => {
        val tbl = "graft_authu_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        s.sql(s"DROP TABLE IF EXISTS ${tbl}_aph")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"/tmp/graft_index/$tbl"))
        val docs = load(s, dir, "documents")
          .select("doc_id", "source", "text")
        val junk = docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("source"),
            concat(col("text"), lit(" shared junk boiler plate of " +
              "exactly twelve tokens for graft authority testing"))
              .as("text"))
        IndexStore.buildAuthorityIndex(
          docs.unionByName(junk), "source", "doc_id", "text",
          tbl, s"/tmp/graft_index/$tbl", batchKey = 0L)
        IndexStore.unlearnFromAuthorityIndex(junk, "source", "doc_id",
          "text", tbl, batchKey = -1L)
        IndexStore.authorityFromIndex(s, tbl).orderBy("source")
      })
  )
}
