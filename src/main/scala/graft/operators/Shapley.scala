package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Shapley valuation of source GROUPS (Data Shapley, Ghorbani &
  * Zou 2019, arXiv:1904.02868) over the bigram-LM eval loss — the step
  * past leave-one-source-out ablation: ablation measures each source's
  * marginal value against the FULL remainder only, so two redundant
  * sources both score ~0 (either alone suffices); the Shapley value
  * averages the marginal over EVERY coalition and splits their shared
  * credit instead of erasing it. The game's players are source GROUPS
  * (a deterministic bounded partition of the sources), because exact
  * Shapley enumerates 2^P coalitions: P stays small by construction
  * and the machinery is one corpus pass regardless of P — per-group
  * count slices (the [[NgramLm.keyedBigramCounts]] sliced-ablation
  * trick), coalition models as membership-joined slice SUMS (counts
  * are a commutative group, so a coalition's counts ARE the sum of its
  * groups' slices — no retraining), and ONE scoring pass of the frozen
  * eval set under all 2^P models.
  *
  * Everything after the per-bigram milli-bit quantization is integer:
  * coalition losses are exact BIGINT sums, Shapley numerators are
  * Σ |S|!·(P−1−|S|)!·(v(S)−v(S∪{p})) in longs (factorial weights
  * bounded by the P ≤ 12 guard), and the final scale-down divides by
  * P! with truncation — Spark `div`, DuckDB `//` and Scala `/` all
  * truncate toward zero, so the whole result table value-hashes in
  * the oracle even when a value is negative (a group that HURTS).
  *
  * One deliberate modeling choice, stated for the oracle: every
  * coalition model scores with the FULL training vocabulary size
  * (fixed event space), not its own — coalition losses must be
  * comparable across coalitions including the empty one (whose
  * add-one model is otherwise degenerate). */
object Shapley {

  /** Deterministic source→player grouping: "g" + (numeric suffix of
    * the source id, mod nGroups). Contract: sources carry a numeric
    * suffix (src0…src19); production callers pass their own bounded
    * grouping column to [[sourceShapley]] instead. */
  def sourceGroup(source: Column, nGroups: Int): Column =
    concat(lit("g"),
      pmod(regexp_extract(source, "[0-9]+", 0).cast("long"),
        lit(nGroups.toLong)))

  /** Exact Shapley numerators from the 2^P coalition losses, driver
    * side — the bounded-state loop the EG/BPE/IVF steps also use
    * (2^P ≤ 4096 rows, never data). `losses(S)` = v_milli of coalition
    * bitmask S; returns (playerIdx → (phiNumer, phiMilli)) with
    * phiNumer = Σ_{S ∌ p} |S|!·(P−1−|S|)!·(v(S) − v(S∪{p})) — positive
    * = adding the group LOWERS eval loss — and phiMilli its P!-scaled
    * truncation. Efficiency property (spec-asserted): Σ_p phiNumer_p =
    * P!·(v(∅) − v(full)). */
  def shapleyFromLosses(losses: Map[Long, Long], nPlayers: Int)
      : Seq[(Int, Long, Long)] = {
    require(nPlayers >= 1 && nPlayers <= 12,
      s"exact Shapley enumerates 2^P coalitions and P!·Δ must fit a " +
        s"long: P must be in [1, 12], got $nPlayers")
    val full = (1L << nPlayers) - 1
    (0L to full).foreach(s => require(losses.contains(s),
      s"missing coalition loss for bitmask $s"))
    val fact = (0 to nPlayers)
      .map(i => (1 to i).foldLeft(1L)(_ * _)).toArray
    (0 until nPlayers).map { p =>
      val bit = 1L << p
      var numer = 0L
      var s = 0L
      while (s <= full) {
        if ((s & bit) == 0L) {
          val k = java.lang.Long.bitCount(s)
          numer = Math.addExact(numer,
            Math.multiplyExact(fact(k) * fact(nPlayers - 1 - k),
              Math.subtractExact(losses(s), losses(s | bit))))
        }
        s += 1
      }
      (p, numer, numer / fact(nPlayers))
    }
  }

  /** The whole game over a document corpus: frozen eval split
    * (doc_id % evalMod = 0), per-group slices from ONE corpus pass,
    * 2^P coalition models as slice sums, one eval-scoring pass, exact
    * Shapley. Output (player, phi_numer, phi_milli) sorted by player.
    * `broadcastModel=false` is the beyond-broadcast path for the
    * coalition count tables (≤ 2^P × vocabulary rows — the panel
    * argument times the coalition count; the exponential factor is
    * why P is a GROUP count, never the raw source count). */
  def sourceShapley(docs: DataFrame, nGroups: Int = 5,
      evalMod: Long = 97L, idCol: String = "doc_id",
      srcCol: String = "source", textCol: String = "text",
      broadcastModel: Boolean = true): DataFrame =
    groupShapley(
      docs.where(col(idCol) % evalMod =!= 0)
        .withColumn("player", sourceGroup(col(srcCol), nGroups)),
      docs.where(col(idCol) % evalMod === 0)
        .select(col(idCol).as("doc_id"), col(textCol).as("text")),
      nGroups, textCol, broadcastModel)

  /** The game itself over explicit frames: `train` carries a `player`
    * column (any bounded deterministic grouping mapped onto
    * g0..g{nGroups−1} — strays fail loud), `evals` is the frozen eval
    * set. This is the composition surface — [[Doremi.shapleyWeights]]
    * feeds the values into the mixture budget loop. */
  def groupShapley(train: DataFrame, evals: DataFrame, nGroups: Int,
      textCol: String = "text", broadcastModel: Boolean = true)
      : DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val losses = coalitionLosses(train, evals, nGroups,
      0L until (1L << nGroups), textCol, broadcastModel, "groupShapley")
    val phi = shapleyFromLosses(losses, nGroups)
      .map { case (p, numer, milli) => (s"g$p", numer, milli) }
    phi.toDF("player", "phi_numer", "phi_milli").orderBy("player")
  }

  /** Shared loss kernel of the exact and sampled games: bigram-LM eval
    * loss v_milli for every coalition bitmask in `masks` — one corpus
    * count pass (per-player slices), membership-joined slice SUMS as
    * the coalition models (counts form a commutative group: zero
    * retrains), ONE eval-scoring pass across all requested coalitions.
    * The exact game passes all 2^P masks; the sampled game passes only
    * the ≤ 2·M·P distinct prefix masks its permutations visit — that
    * narrowing is the whole point of sampling (P = 20 exact would be
    * 2^20 models; 32 permutations visit ~1 300). */
  private def coalitionLosses(train: DataFrame, evals: DataFrame,
      nGroups: Int, masks: Seq[Long], textCol: String,
      broadcastModel: Boolean, op: String): Map[Long, Long] = {
    val spark = train.sparkSession
    import spark.implicits._
    def side(df: DataFrame) = if (broadcastModel) broadcast(df) else df

    // one corpus pass; every coalition model below is bounded-table work
    val slices = Ops.checkpointKeepPartitioning(
      NgramLm.keyedBigramCounts(train, "player", textCol), eager = true)
    // membership below enumerates players g0..g{P-1} ONLY: a row whose
    // player value is outside that domain would silently drop out of
    // every coalition (including the full one) and skew all values with
    // no error. Fail loud on strays instead — the observed domain is
    // bounded (it's a grouping), so this is a bounded-table check.
    // NULL is a stray too (isin returns NULL for NULL, which a bare
    // negation filter would silently drop — the exact failure mode
    // this guard exists for)
    val stray = slices.select("player").distinct()
      .where(col("player").isNull || !col("player")
        .isin((0 until nGroups).map(p => s"g$p"): _*))
      .limit(6).collect()
      .map(r => if (r.isNullAt(0)) "NULL" else r.getString(0))
    require(stray.isEmpty,
      s"$op: player value(s) ${stray.mkString(", ")} are " +
        s"outside the coalition domain g0..g${nGroups - 1} — every " +
        "coalition (including the full one) would silently exclude " +
        "their rows. Map the grouping onto g0..g{nGroups-1} " +
        "(Shapley.sourceGroup does) or raise nGroups.")

    val membership = masks
      .flatMap(s => (0 until nGroups).collect {
        case p if ((s >> p) & 1L) == 1L => (s, s"g$p")
      }).toDF("subset_id", "player")
    // membership is ≤ #masks × P rows — always broadcast; the
    // coalition models are slice SUMS, never retrains
    val subCounts = Ops.checkpointKeepPartitioning(
      slices.join(broadcast(membership), "player")
        .groupBy("subset_id", "bg").agg(sum(col("cb")).as("cb")),
      eager = true)
    val cc = subCounts
      .groupBy(col("subset_id"),
        substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum(col("cb")).as("cctx"))
    // FIXED event space: the full training vocabulary (both bigram
    // endpoints), shared by every coalition including the empty one
    val vFull = slices
      .select(substring_index(col("bg"), " ", 1).as("t"))
      .union(slices.select(substring_index(col("bg"), " ", -1).as("t")))
      .agg((countDistinct(col("t")) + 1).as("vsize"))

    val scored = NgramLm.bigrams(evals)
      .crossJoin(broadcast(masks.toDF("subset_id")))
      .join(side(subCounts), Seq("subset_id", "bg"), "left")
      .join(side(cc), Seq("subset_id", "prev"), "left")
      .crossJoin(broadcast(vFull))
      .select(col("subset_id"),
        NgramLm.hMilli(col("cb"), col("cctx"), col("vsize"))
          .cast("long").as("h_milli"))
    val losses = scored.groupBy("subset_id")
      .agg(sum(col("h_milli")).as("v_milli"))
      .as[(Long, Long)].collect().toMap // bounded: #masks rows
    // empty-eval degenerate case, failed HERE with its cause named:
    // zero eval bigrams leave the losses map empty, and letting it
    // reach the fold surfaces as the far-from-cause "missing
    // coalition loss for bitmask 0" (the pageRank empty-node-set
    // stance). The DuckDB oracle returns an empty shv table there, so
    // engine and oracle would also silently disagree.
    require(losses.nonEmpty,
      s"$op: the eval split produced zero bigrams (empty or " +
        "token-less eval docs) — coalition losses are undefined. Widen " +
        "the eval split (e.g. the evalMod sieve) or check the text " +
        "column.")
    // everything the caller needs is driver-local now — free the
    // corpus/vocab-sized checkpoint blocks so repeated valuation calls
    // in a long session don't accumulate executor storage (the
    // Centrality freeBlocks discipline)
    Ops.freeLogicalRddBlocks(slices)
    Ops.freeLogicalRddBlocks(subCounts)
    losses
  }

  // ── sampled (permutation) Shapley ─────────────────────────────────

  /** md5 hex of a UTF-8 string — the permutation-ordering hash. Chosen
    * because DuckDB's md5(VARCHAR) computes the identical lowercase hex
    * over the same text, so the sampled permutations replay bit-for-bit
    * inside the oracle SQL ([[sampledOracleSql]]). */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Prefix bitmasks of explicit player orders: for each permutation
    * (by index) and each player p, the bitmask of players appearing
    * BEFORE p in that order. The sampled estimator's whole coalition
    * demand is these masks and their +p successors. */
  def prefixMasksOf(orders: Seq[Seq[Int]])
      : Seq[(Int, Int, Long)] =
    orders.zipWithIndex.flatMap { case (order, m) =>
      var mask = 0L
      order.map { p =>
        val row = (m, p, mask)
        mask |= (1L << p)
        row
      }
    }

  /** Deterministic hash-derived permutations: permutation m orders
    * players by (md5(s"$seed:$m:g$p"), p). No RNG state — the set is a
    * pure function of (seed, nPerms, nGroups), which is what keeps the
    * sampled estimator VALUE-oracle-checkable: DuckDB re-derives the
    * identical permutations from the identical hashes. */
  def permPrefixMasks(nGroups: Int, nPerms: Int,
      seed: String): Seq[(Int, Int, Long)] =
    prefixMasksOf((0 until nPerms).map(m =>
      (0 until nGroups).sortBy(p => (md5Hex(s"$seed:$m:g$p"), p))))

  /** Monte-Carlo fold (Castro et al. 2009): per player p,
    * phi_numer = Σ_m (v(pre_m(p)) − v(pre_m(p) ∪ {p})) over the given
    * prefix masks, phi_milli its nPerms-scaled truncation. With the
    * masks of ALL P! distinct permutations this equals
    * [[shapleyFromLosses]]' exact numerator EXACTLY (each coalition S
    * is p's prefix in precisely |S|!·(P−1−|S|)! permutations) — the
    * convergence anchor ShapleySpec asserts bit-for-bit. */
  def sampledFromLosses(losses: Map[Long, Long],
      nGroups: Int, pre: Seq[(Int, Int, Long)], nPerms: Int)
      : Seq[(Int, Long, Long)] =
    (0 until nGroups).map { p =>
      val bit = 1L << p
      var numer = 0L
      pre.foreach { case (_, pp, mask) =>
        if (pp == p)
          numer = Math.addExact(numer,
            Math.subtractExact(losses(mask), losses(mask | bit)))
      }
      (p, numer, numer / nPerms)
    }

  /** SAMPLED Shapley valuation — the estimator past the exact
    * enumerator's P ≤ 12 guard (Castro et al. 2009's permutation
    * sampling; the Monte-Carlo form Ghorbani & Zou's TMC variant
    * refines). Where the exact game prices 2^P coalition models, the
    * sampled game walks `nPerms` deterministic permutations and prices
    * only the ≤ 2·nPerms·P distinct prefix coalitions they visit —
    * P ≈ 20–50 sources become directly valuable with a few dozen
    * permutations. Same loss kernel, same fixed event space, same
    * integer milli-bit algebra as [[groupShapley]]; phi_milli is the
    * per-permutation MEAN marginal (truncated), so at equal games the
    * sampled and exact phi_milli are on the same scale and converge as
    * permutations accumulate. Output
    * (player, phi_numer, phi_milli) ordered by player; phi_numer is
    * the raw Σ over permutations (units: milli-bits·perms). */
  def sampledGroupShapley(train: DataFrame, evals: DataFrame,
      nGroups: Int, nPerms: Int, seed: String = "graft",
      textCol: String = "text", broadcastModel: Boolean = true)
      : DataFrame = {
    // 62: prefix bitmasks live in a signed long. The per-player
    // accumulator is addExact-guarded like the exact fold.
    require(nGroups >= 1 && nGroups <= 62,
      s"sampled Shapley bitmasks need P in [1, 62], got $nGroups")
    require(nPerms >= 1, s"need >= 1 permutation, got $nPerms")
    val spark = train.sparkSession
    import spark.implicits._
    val pre = permPrefixMasks(nGroups, nPerms, seed)
    val masks = pre.flatMap { case (_, p, mask) =>
      Seq(mask, mask | (1L << p))
    }.distinct.sorted
    val losses = coalitionLosses(train, evals, nGroups, masks, textCol,
      broadcastModel, "sampledGroupShapley")
    val phi = sampledFromLosses(losses, nGroups, pre, nPerms)
      .map { case (p, numer, milli) => (s"g$p", numer, milli) }
    phi.toDF("player", "phi_numer", "phi_milli").orderBy("player")
  }

  /** [[sourceShapley]]'s sampled twin: same frozen eval split and
    * player grouping, the permutation estimator instead of the 2^P
    * enumeration — nGroups may exceed 12 (e.g. one player per source). */
  def sampledSourceShapley(docs: DataFrame, nGroups: Int, nPerms: Int,
      seed: String = "graft", evalMod: Long = 97L,
      idCol: String = "doc_id", srcCol: String = "source",
      textCol: String = "text", broadcastModel: Boolean = true)
      : DataFrame =
    sampledGroupShapley(
      docs.where(col(idCol) % evalMod =!= 0)
        .withColumn("player", sourceGroup(col(srcCol), nGroups)),
      docs.where(col(idCol) % evalMod === 0)
        .select(col(idCol).as("doc_id"), col(textCol).as("text")),
      nGroups, nPerms, seed, textCol, broadcastModel)

  /** DuckDB oracle CTE chain for [[groupShapley]] — generated next to
    * the operator so the two cannot drift. Expects CTEs `trainpl`
    * (player, text) and `evald` (doc_id, text) upstream; ends with
    * `shv(player, phi_numer, phi_milli)` so compositions (the
    * Shapley-driven budget build) can keep chaining. Factorial
    * weights are inlined as literals from the same guard-bounded P. */
  def oracleCtes(nGroups: Int): String = {
    require(nGroups >= 1 && nGroups <= 12)
    val fact = (0 to nGroups).map(i => (1 to i).foldLeft(1L)(_ * _))
    val nSubsets = 1L << nGroups
    val wCases = (0 until nGroups)
      .map(k => s"WHEN ${k} THEN ${fact(k) * fact(nGroups - 1 - k)}")
      .mkString(" ")
    def toksOf(rel: String, cols: String, name: String) =
      s"""$name AS (
         |  SELECT $cols,
         |    list_prepend('<s>',
         |      CASE WHEN regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g') = ''
         |           THEN CAST([] AS VARCHAR[])
         |           ELSE string_split_regex(
         |                  regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g'), '\\s+')
         |      END) AS toks
         |  FROM $rel)""".stripMargin
    s"""${toksOf("trainpl", "player", "ttok")},
       |tbig AS (
       |  SELECT player, toks[i] || ' ' || toks[i+1] AS bg
       |  FROM ttok, unnest(range(1, len(toks))) AS r(i)),
       |slices AS MATERIALIZED (
       |  SELECT player, bg, CAST(count(*) AS BIGINT) AS cb
       |  FROM tbig GROUP BY 1, 2),
       |mem AS MATERIALIZED (
       |  SELECT CAST(s.range AS BIGINT) AS subset_id,
       |    'g' || CAST(p.range AS VARCHAR) AS player
       |  FROM range(0, $nSubsets) s, range(0, $nGroups) p
       |  WHERE (s.range >> p.range) & 1 = 1),
       |subc AS MATERIALIZED (
       |  SELECT m.subset_id, sl.bg, CAST(sum(sl.cb) AS BIGINT) AS cb
       |  FROM mem m JOIN slices sl ON m.player = sl.player
       |  GROUP BY 1, 2),
       |subcc AS MATERIALIZED (
       |  SELECT subset_id, string_split(bg, ' ')[1] AS prev,
       |    CAST(sum(cb) AS BIGINT) AS cctx
       |  FROM subc GROUP BY 1, 2),
       |vfull AS MATERIALIZED (
       |  SELECT count(DISTINCT t) + 1 AS vsize FROM (
       |    SELECT string_split(bg, ' ')[1] AS t FROM slices
       |    UNION
       |    SELECT string_split(bg, ' ')[-1] AS t FROM slices)),
       |${toksOf("evald", "doc_id", "etok")},
       |ebig AS (
       |  SELECT toks[i] || ' ' || toks[i+1] AS bg, toks[i] AS prev
       |  FROM etok, unnest(range(1, len(toks))) AS r(i)),
       |escore AS (
       |  SELECT s.range AS subset_id,
       |    CAST(floor(-log2((coalesce(c.cb, 0) + 1.0) /
       |                     (coalesce(x.cctx, 0) + v.vsize))
       |               * 1000.0 + 0.5) AS BIGINT) AS h_milli
       |  FROM ebig e
       |  CROSS JOIN range(0, $nSubsets) s
       |  LEFT JOIN subc c ON c.subset_id = s.range AND c.bg = e.bg
       |  LEFT JOIN subcc x ON x.subset_id = s.range AND x.prev = e.prev
       |  CROSS JOIN vfull v),
       |v AS MATERIALIZED (
       |  SELECT subset_id, CAST(sum(h_milli) AS BIGINT) AS v_milli
       |  FROM escore GROUP BY 1),
       |sizes AS MATERIALIZED (
       |  SELECT CAST(s.range AS BIGINT) AS subset_id,
       |    CAST(count(p.range) AS INT) AS k
       |  FROM range(0, $nSubsets) s
       |  LEFT JOIN range(0, $nGroups) p ON (s.range >> p.range) & 1 = 1
       |  GROUP BY 1),
       |pl AS (
       |  SELECT CAST(range AS INT) AS idx,
       |    'g' || CAST(range AS VARCHAR) AS player
       |  FROM range(0, $nGroups)),
       |contrib AS (
       |  SELECT pl.player,
       |    (CASE z.k $wCases END)
       |      * (vs.v_milli - vu.v_milli) AS term
       |  FROM pl
       |  JOIN sizes z ON (z.subset_id >> pl.idx) & 1 = 0
       |  JOIN v vs ON vs.subset_id = z.subset_id
       |  JOIN v vu ON vu.subset_id = z.subset_id + (CAST(1 AS BIGINT) << pl.idx)),
       |shv AS (
       |  SELECT player, CAST(sum(term) AS BIGINT) AS phi_numer,
       |    CAST(sum(term) // ${fact(nGroups)} AS BIGINT) AS phi_milli
       |  FROM contrib GROUP BY 1)""".stripMargin
  }

  /** [[oracleCtes]] closed with the value-table SELECT — the
    * standalone ext_source_shapley oracle tail. */
  def oracleSql(nGroups: Int): String =
    oracleCtes(nGroups) +
      "\nSELECT player, phi_numer, phi_milli FROM shv ORDER BY player"

  /** DuckDB oracle CTE chain for [[sampledGroupShapley]] — the
    * permutations are RE-DERIVED inside SQL from the same md5 ordering
    * keys the engine used, so the sampled estimator stays fully
    * value-oracle'd (not merely rows-checked) at any P. Expects
    * `trainpl`(player, text) and `evald`(doc_id, text); ends with
    * `sp_shv(player, phi_numer, phi_milli)`. All CTEs are sp_-prefixed
    * so exact and sampled chains can coexist in one query. */
  def sampledOracleCtes(nGroups: Int, nPerms: Int,
      seed: String = "graft"): String = {
    require(nGroups >= 1 && nGroups <= 62)
    require(nPerms >= 1)
    def toksOf(rel: String, cols: String, name: String) =
      s"""$name AS (
         |  SELECT $cols,
         |    list_prepend('<s>',
         |      CASE WHEN regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g') = ''
         |           THEN CAST([] AS VARCHAR[])
         |           ELSE string_split_regex(
         |                  regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g'), '\\s+')
         |      END) AS toks
         |  FROM $rel)""".stripMargin
    s"""sp_rk AS MATERIALIZED (
       |  SELECT CAST(m.range AS BIGINT) AS m, CAST(p.range AS INT) AS p,
       |    row_number() OVER (PARTITION BY m.range
       |      ORDER BY md5(concat('$seed:', CAST(m.range AS VARCHAR),
       |                          ':g', CAST(p.range AS VARCHAR))),
       |               p.range) AS rk
       |  FROM range(0, $nPerms) m, range(0, $nGroups) p),
       |sp_pref AS MATERIALIZED (
       |  SELECT a.m, a.p,
       |    CAST(coalesce(sum(CAST(1 AS BIGINT) << b.p), 0) AS BIGINT)
       |      AS mask_excl
       |  FROM sp_rk a LEFT JOIN sp_rk b ON b.m = a.m AND b.rk < a.rk
       |  GROUP BY a.m, a.p),
       |sp_dmask AS MATERIALIZED (
       |  SELECT DISTINCT mask_excl AS subset_id FROM sp_pref
       |  UNION
       |  SELECT DISTINCT mask_excl + (CAST(1 AS BIGINT) << p)
       |  FROM sp_pref),
       |${toksOf("trainpl", "player", "sp_ttok")},
       |sp_tbig AS (
       |  SELECT player, toks[i] || ' ' || toks[i+1] AS bg
       |  FROM sp_ttok, unnest(range(1, len(toks))) AS r(i)),
       |sp_slices AS MATERIALIZED (
       |  SELECT player, bg, CAST(count(*) AS BIGINT) AS cb
       |  FROM sp_tbig GROUP BY 1, 2),
       |sp_mem AS MATERIALIZED (
       |  SELECT d.subset_id, 'g' || CAST(p.range AS VARCHAR) AS player
       |  FROM sp_dmask d, range(0, $nGroups) p
       |  WHERE (d.subset_id >> p.range) & 1 = 1),
       |sp_subc AS MATERIALIZED (
       |  SELECT m.subset_id, sl.bg, CAST(sum(sl.cb) AS BIGINT) AS cb
       |  FROM sp_mem m JOIN sp_slices sl ON m.player = sl.player
       |  GROUP BY 1, 2),
       |sp_subcc AS MATERIALIZED (
       |  SELECT subset_id, string_split(bg, ' ')[1] AS prev,
       |    CAST(sum(cb) AS BIGINT) AS cctx
       |  FROM sp_subc GROUP BY 1, 2),
       |sp_vfull AS MATERIALIZED (
       |  SELECT count(DISTINCT t) + 1 AS vsize FROM (
       |    SELECT string_split(bg, ' ')[1] AS t FROM sp_slices
       |    UNION
       |    SELECT string_split(bg, ' ')[-1] AS t FROM sp_slices)),
       |${toksOf("evald", "doc_id", "sp_etok")},
       |sp_ebig AS (
       |  SELECT toks[i] || ' ' || toks[i+1] AS bg, toks[i] AS prev
       |  FROM sp_etok, unnest(range(1, len(toks))) AS r(i)),
       |sp_escore AS (
       |  SELECT s.subset_id,
       |    CAST(floor(-log2((coalesce(c.cb, 0) + 1.0) /
       |                     (coalesce(x.cctx, 0) + v.vsize))
       |               * 1000.0 + 0.5) AS BIGINT) AS h_milli
       |  FROM sp_ebig e
       |  CROSS JOIN sp_dmask s
       |  LEFT JOIN sp_subc c ON c.subset_id = s.subset_id AND c.bg = e.bg
       |  LEFT JOIN sp_subcc x ON x.subset_id = s.subset_id AND x.prev = e.prev
       |  CROSS JOIN sp_vfull v),
       |sp_v AS MATERIALIZED (
       |  SELECT subset_id, CAST(sum(h_milli) AS BIGINT) AS v_milli
       |  FROM sp_escore GROUP BY 1),
       |sp_contrib AS (
       |  SELECT pf.p, v1.v_milli - v2.v_milli AS term
       |  FROM sp_pref pf
       |  JOIN sp_v v1 ON v1.subset_id = pf.mask_excl
       |  JOIN sp_v v2
       |    ON v2.subset_id = pf.mask_excl + (CAST(1 AS BIGINT) << pf.p)),
       |sp_shv AS (
       |  SELECT 'g' || CAST(p AS VARCHAR) AS player,
       |    CAST(sum(term) AS BIGINT) AS phi_numer,
       |    CAST(sum(term) // $nPerms AS BIGINT) AS phi_milli
       |  FROM sp_contrib GROUP BY 1)""".stripMargin
  }

  /** [[sampledOracleCtes]] closed with the value-table SELECT — the
    * standalone ext_source_shapley_sampled oracle tail. */
  def sampledOracleSql(nGroups: Int, nPerms: Int,
      seed: String = "graft"): String =
    sampledOracleCtes(nGroups, nPerms, seed) +
      "\nSELECT player, phi_numer, phi_milli FROM sp_shv ORDER BY player"
}
