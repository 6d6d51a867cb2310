package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SimHash

/** Deduplication operators for training-data pipelines, all designed to
  * avoid the O(n²) all-pairs trap: exact dedup is a hash groupBy; MinHash
  * and SimHash restrict comparisons to LSH-bucket collisions, so the only
  * shuffles are by bucket key and work scales with collision counts, not
  * corpus².
  */
object Dedup {

  /** Each pipeline's first select narrows its input to (id, derived
    * columns), so the only caller name that can collide with internal
    * columns is the id column itself — checked loudly, matching
    * Ops/TemporalJoins' reserved-name stance. */
  private def requireIdColFree(idCol: String, reserved: Seq[String],
      op: String): Unit =
    require(!reserved.contains(idCol),
      s"$op reserves column names ${reserved.mkString(", ")}; " +
        s"idCol=$idCol collides")

  /** Conf key electing DURABLE inline boundaries: "true" swaps every
    * lazy localCheckpoint boundary in this file for a reliable
    * checkpoint (requires `SparkContext.setCheckpointDir`). The trade
    * being chosen: localCheckpoint blocks are executor-local AND
    * lineage-free, so losing an executor (dynamic allocation shrink,
    * preemption, OOM kill) makes them unrecomputable and FAILS the
    * query instead of recomputing — fine on a static local/dedicated
    * cluster, a real regression under dynamic allocation at warehouse
    * scale. The reliable form writes the boundary to the checkpoint
    * dir (HDFS/object store): slower per run, but executor loss only
    * re-reads. Session-scoped so a deployment flips it once; per-call
    * code stays identical (DedupSpec pins value parity across both
    * modes, and that flipping the flag without a checkpoint dir refuses
    * up front — the require in [[Ops.checkpointKeepPartitioning]] —
    * instead of failing mid-query with Spark's opaque error). */
  val ReliableBoundaryConf = "spark.graft.boundary.reliable"

  /** Lazy localCheckpoint that keeps the child's hash-partitioning —
    * see [[Ops.checkpointKeepPartitioning]] for the AQE subtlety — or a
    * reliable checkpoint when [[ReliableBoundaryConf]] elects
    * durability over speed (executor-loss trade documented there). */
  private def checkpointKeepPartitioning(frame: DataFrame,
      eager: Boolean = false): DataFrame =
    Ops.checkpointKeepPartitioning(frame, eager = eager,
      reliable = frame.sparkSession.conf
        .getOption(ReliableBoundaryConf).contains("true"))

  /** Word n-gram shingles of the lowercased text; documents shorter than
    * `n` tokens collapse to a single whole-text shingle. Tokenization is
    * the codegen'd built-in split; the window construction is the native
    * [[graft.functions.NgramShingles]] expression (the transform/slice/
    * concat_ws tree it replaces is CodegenFallback — interpreted per
    * row; parity pinned in DedupSpec). */
  def wordShingles(text: Column, n: Int = 3): Column =
    graft.functions.Shingles.ngramShingles(
      split(trim(lower(text)), "\\s+"), n)

  /** The expression-tree formulation of [[wordShingles]] — parity
    * reference. */
  def wordShinglesFold(text: Column, n: Int = 3): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the shingle set. Delegates to the native
    * codegen'd MinHashSignature expression (see functions.MinHash for
    * why the higher-order-function formulation was replaced). */
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    graft.functions.MinHash.minhashSignature(shingles, numHashes)

  /** Bucket-population cap above which the all-pairs join inside an LSH
    * bucket is replaced by star-linking through the bucket representative
    * (the minimum id). A bucket of m members normally contributes
    * m(m-1)/2 candidate pairs on ONE reducer — a boilerplate-heavy corpus
    * (thousands of near-identical docs sharing a band hash) turns that
    * quadratic blow-up into the job's straggler at exactly the data shape
    * dedup exists for. Star-linking emits m-1 pairs (rep, member)
    * instead: output is linear, every member remains a candidate, and
    * for the boilerplate shape that creates hot buckets — thousands of
    * near-IDENTICAL docs — members verify against the representative
    * and connected-component clustering sees the same components
    * transitively. The honest limit of the trade: a pair (x, y) whose
    * ONLY shared bucket is hot survives only through the verification
    * step of its (rep, x) / (rep, y) star pairs, so if both x and y
    * clear the similarity threshold with each other but NOT with the
    * representative, that pair is dropped. This is inherent to any
    * bounded-work cap (skipping the bucket outright would drop the
    * pair too, plus the star pairs); pairs sharing any non-hot bucket
    * are unaffected, and callers can raise the threshold when full
    * enumeration matters more than the straggler. Guarded recall on
    * the near-identical shape is pinned by DedupSpec's
    * planted-boilerplate corpus. */
  val DefaultHotBandThreshold = 1000

  /** LSH banding: hash `rowsPerBand`-sized slices of the signature; docs
    * sharing any band hash become candidate pairs. Returns (id_a, id_b)
    * with id_a < id_b, distinct. The join key is (band index, band hash),
    * so the shuffle is by bucket — never all-pairs. Band hashes come
    * from the native codegen'd BandKeys expression (band index folded
    * into the hash; posexplode recovers the band_id).
    *
    * Buckets larger than `hotBandThreshold` are star-linked through
    * their representative instead of all-paired — see
    * [[DefaultHotBandThreshold]] for the semantics and why. The
    * population count and representative come from a window over the
    * band key, which the subsequent self-join shuffles on anyway, so
    * the guard adds no new exchange — only a per-bucket sort. */
  def lshCandidatePairs(sigs: DataFrame, idCol: String, sigCol: String,
      bands: Int = 16, rowsPerBand: Int = 4,
      hotBandThreshold: Int = DefaultHotBandThreshold): DataFrame = {
    require(hotBandThreshold >= 2,
      s"hotBandThreshold=$hotBandThreshold: a bucket needs at least two " +
        "members to form a pair, so a cap below 2 disables banding entirely")
    requireIdColFree(idCol,
      Seq("band_id", "band_hash", "band_n", "band_rep", "id_a", "id_b"),
      "lshCandidatePairs")
    val banded = sigs.select(col(idCol),
      posexplode(graft.functions.MinHash.bandKeys(col(sigCol), bands,
        rowsPerBand)))
      .toDF(idCol, "band_id", "band_hash")
    val w = Window.partitionBy("band_id", "band_hash")
    // Materialization boundary AFTER the sizing window: `sized` feeds
    // both self-join sides plus the hot branch, so without it the
    // signature hashing and the window each run three times (Catalyst
    // inlines the chain into every consumer). Lazy localCheckpoint
    // computes once; blocks drain via the context cleaner when the
    // frame drops, and checkpointKeepPartitioning captures the window's
    // band-key partitioning so the self-join is co-partitioned for free
    // (DedupSpec pins the single-exchange plan).
    // no-silent-caps (the persisted probes' stance, extended inline):
    // guard activity is observed on the checkpointed rows every consumer
    // already reads — rows_suppressed counts hot-bucket members whose
    // pairing was star-bounded through the representative rather than
    // fully enumerated. CollectMetrics passes partitioning through, so
    // the single-exchange plan pin holds; read with
    // IndexStore.capActivity on the pairs frame after an action.
    // eager (the sharedShingleFractions convoy stance, applied to the
    // dedup kernels in r17): the three consumers below are parallel
    // subplans of ONE statement, so a lazy pin is first-forced by all
    // of them concurrently — each re-running the banding+window chain
    // against the unmaterialized blocks' locks (profiled in sr37 as 6
    // concurrent 2-3.4 s jobs inside one execution). One count job
    // materializes it once; every consumer then reads blocks.
    val sized = IndexStore.observeCap(checkpointKeepPartitioning(banded
        .withColumn("band_n", count(lit(1)).over(w))
        .withColumn("band_rep", min(col(idCol)).over(w)), eager = true),
      col("band_n") > hotBandThreshold && col(idCol) =!= col("band_rep"),
      col("band_n") > hotBandThreshold, col("band_n"))
    val small = sized.where(col("band_n") <= hotBandThreshold)
      .select(col(idCol), col("band_id"), col("band_hash"))
    val smallPairs = small.alias("a")
      .join(small.alias("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    // band_rep = min(id) over the bucket, so id_a < id_b holds here too
    val hotPairs = sized
      .where(col("band_n") > hotBandThreshold && col(idCol) =!= col("band_rep"))
      .select(col("band_rep").as("id_a"), col(idCol).as("id_b"))
    smallPairs.unionByName(hotPairs).distinct()
  }

  /** Exact Jaccard similarity of two shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash estimate of Jaccard: fraction of agreeing signature slots. */
  def minhashJaccardEstimate(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA).cast("double")

  /** Full MinHash+LSH near-dup pipeline over (id, text): candidate pairs
    * via banding, then exact n-gram Jaccard verification ≥ threshold. */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8,
      hotBandThreshold: Int = DefaultHotBandThreshold): DataFrame = {
    // Materialize shingles and signatures once: they feed the 16 band
    // projections plus both sides of the verification join, and Catalyst
    // would otherwise inline (= recompute) the hashing into every
    // consumer. At warehouse scale this materialization is a signature
    // table ([[IndexStore.buildMinhashIndex]] is that path). Here it is
    // a LAZY localCheckpoint, not a CacheManager persist: blocks still
    // compute once (MEMORY_AND_DISK) on first use, but they belong to
    // the returned frame's RDD and the context cleaner reclaims them
    // once the caller drops it — repeated inline runs in a long session
    // accumulate no pinned storage (DedupSpec asserts the drain). The
    // repartition spreads the hash-heavy compute across all cores even
    // when the input is a single small file (one split) — BY ID, not
    // round-robin, with the partitioning captured through the
    // checkpoint: the shingle table is the fattest frame in the
    // pipeline (corpus × shingle arrays) and both verification joins
    // key on the doc id, so a round-robin layout re-shuffles it twice
    // while the captured id-hash layout feeds both joins in place
    // (only the thin pairs side moves; plan-pinned in DedupSpec).
    requireIdColFree(idCol, Seq("shingles", "sig", "sh_a", "sh_b", "jaccard"),
      "minhashNearDupPairs")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // eager for the same convoy reason as lshCandidatePairs' `sized`:
    // the signature chain and the two verification-join sides force
    // this pin concurrently within one statement
    val shingled = checkpointKeepPartitioning(docs.repartition(par, col(idCol))
      .select(col(idCol),
        array_distinct(wordShingles(col(textCol), shingleN)).as("shingles")),
      eager = true)
    val sigs = shingled.select(col(idCol),
      minhashSignature(col("shingles"), numHashes).as("sig"))
    val pairs = lshCandidatePairs(sigs, idCol, "sig", bands, numHashes / bands,
      hotBandThreshold)
    pairs
      .join(shingled.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shingled.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), "id_b")
      // threshold the RAW jaccard; the rounded form is display-only in
      // the output column — rounding first would let a value up to 5e-7
      // below the threshold round across the boundary (the same stance
      // as probeSrpNearDup's raw-cosine filter; both similarity
      // families now agree on boundary semantics)
      .withColumn("__j_raw", jaccard(col("sh_a"), col("sh_b")))
      .where(col("__j_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__j_raw"), 6).as("jaccard"))
  }

  /** SimHash near-dup candidates: 64-bit SimHash banded into 4×16-bit
    * chunks — any pair within Hamming distance ≤ 3 shares at least one
    * chunk (pigeonhole), so bucketing by (chunk index, chunk value) finds
    * all of them without all-pairs. Returns pairs with exact Hamming
    * distance ≤ maxHamming. */
  /** The canonical SimHash signature of a text column — the ONE
    * tokenization both the inline pipeline and the persisted index
    * ([[IndexStore]]) must share: two hand-copied expression trees would
    * be a silent-divergence channel for persisted probes. */
  def simhashSignature(textCol: Column): Column =
    SimHash.simhash64(split(trim(lower(textCol)), "\\s+"))

  /** The j-th 16-bit pigeonhole chunk of a 64-bit signature — shared
    * chunk kernel for the same reason. */
  def simhashChunk(sim: Column, j: Int): Column =
    shiftrightunsigned(sim, j * 16).bitwiseAND(lit(0xFFFFL))

  /** Number of pigeonhole chunks; guarantees candidate recall only for
    * Hamming ≤ SimhashChunks - 1. */
  val SimhashChunks = 4

  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      hotBandThreshold: Int = DefaultHotBandThreshold): DataFrame = {
    require(maxHamming <= SimhashChunks - 1,
      s"the ${SimhashChunks}x16-bit pigeonhole only guarantees candidate " +
        s"recall for Hamming <= ${SimhashChunks - 1}; maxHamming=$maxHamming " +
        "would silently miss pairs")
    require(hotBandThreshold >= 2,
      s"hotBandThreshold=$hotBandThreshold: a bucket needs at least two " +
        "members to form a pair, so a cap below 2 disables chunking entirely")
    requireIdColFree(idCol,
      Seq("sim", "chunk_id", "chunk", "chunk_n", "rep", "id_a", "id_b",
        "hamming"), "simhashNearDupPairs")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val sigs = docs.repartition(par).select(col(idCol),
      simhashSignature(col(textCol)).as("sim"))
    val chunked = sigs.select(col(idCol), col("sim"),
      posexplode(array((0 until SimhashChunks)
        .map(j => simhashChunk(col("sim"), j)): _*)))
      .toDF(idCol, "sim", "chunk_id", "chunk")
    // Same hot-bucket guard as lshCandidatePairs (see
    // DefaultHotBandThreshold): oversized chunk buckets star-link through
    // the bucket representative — min(struct(id, sim)) carries the
    // representative's signature along so the exact Hamming verify stays
    // a column comparison, no extra join.
    val w = Window.partitionBy("chunk_id", "chunk")
    // same boundary + partitioning-capture + cap-observability rationale
    // as lshCandidatePairs' `sized`
    // eager: same multi-consumer convoy stance as lshCandidatePairs
    val sized = IndexStore.observeCap(checkpointKeepPartitioning(chunked
        .withColumn("chunk_n", count(lit(1)).over(w))
        .withColumn("rep", min(struct(col(idCol), col("sim"))).over(w)),
        eager = true),
      col("chunk_n") > hotBandThreshold && col(idCol) =!= col("rep")(idCol),
      col("chunk_n") > hotBandThreshold, col("chunk_n"))
    val small = sized.where(col("chunk_n") <= hotBandThreshold)
      .select(col(idCol), col("sim"), col("chunk_id"), col("chunk"))
    val smallPairs = small.alias("a")
      .join(small.alias("b"),
        col("a.chunk_id") === col("b.chunk_id") &&
          col("a.chunk") === col("b.chunk") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
    val hotPairs = sized
      .where(col("chunk_n") > hotBandThreshold &&
        col(idCol) =!= col("rep")(idCol))
      .select(col("rep")(idCol).as("id_a"), col(idCol).as("id_b"),
        bit_count(col("rep")("sim").bitwiseXOR(col("sim"))).as("hamming"))
    smallPairs.unionByName(hotPairs)
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact duplicate groups by canonical fingerprint: returns one row per
    * duplicated content value with the keeper (min id) and count. */
  def exactDuplicateGroups(docs: DataFrame, idCol: String, keyCol: Column): DataFrame =
    docs.groupBy(keyCol.as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact-duplicate keeper selection by QUALITY rather than min-id:
    * within each canonical-fingerprint group keep the highest-quality
    * RENDERING (ties to the lowest id) — reformatted duplicates share a
    * fingerprint but not a quality score (whitespace inflation dilutes
    * the alpha ratio), and a curation pipeline wants the cleanest
    * variant, not the first-crawled one. The argmax is an AGGREGATE
    * (max of a (quality, -id) struct with map-side partials), not a
    * per-group window — a boilerplate fingerprint with millions of
    * copies stays a linear rollup instead of one window task. Returns
    * every input doc with its group's keeper and a kept flag. */
  def qualityKeepers(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextAnalysis
    val scored = docs.select(col(idCol),
      TextAnalysis.fingerprintMd5(col(textCol)).as("fp"),
      TextAnalysis.qualityScore(col(textCol)).as("quality"))
    val keepers = scored.groupBy("fp")
      .agg(max(struct(col("quality"), (-col(idCol)).as("neg_id"))).as("best"))
      .select(col("fp"), (-col("best.neg_id")).as("keeper_id"))
    scored.join(keepers, "fp")
      .select(col(idCol), col("quality"), col("keeper_id"),
        (col(idCol) === col("keeper_id")).cast("int").as("kept"))
      .orderBy(idCol)
  }

  /** Soft-dedup keep decision: keep with probability ~1/cluster_size by
    * deterministic 52-bit hash thinning — kept iff
    * `h52(id) < 2^52 div size` (integer FLOOR division). Stated as a
    * division, not the superficially-equivalent `h52·size < 2^52`: the
    * multiply form overflows 63-bit longs once size > 2^11 and Spark
    * wraps silently (often negative, so the comparison passes), which
    * over-retains exactly the boilerplate mega-clusters soft dedup
    * exists to thin. Here both comparands stay in [0, 2^52] for ANY
    * cluster size. Singletons are always kept (h52 ≤ 2^52−1 < 2^52).
    * The decision is a pure function of (id, size) — no RNG — so the
    * whole keep table replays through a SQL oracle
    * (`h < 4503599627370496 // cluster_size` in DuckDB). */
  def softDedupKeep(id: Column, clusterSize: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graft.ColumnBridge
    val h52 = conv(substring(md5(id.cast("string").cast("binary")), 1, 13),
      16, 10).cast("long")
    val cut = ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(lit(4503599627370496L)),
      ColumnBridge.expression(clusterSize.cast("long"))))
    (h52 < cut).cast("int")
  }

  /** Source-PRIORITY dedup keeper: within each exact-duplicate group
    * the copy from the highest-priority source survives (the curated
    * copy beats the crawl copy — the cross-source precedence rule of
    * multi-source corpus assembly); ties fall to min id. Same
    * hot-fingerprint-safe struct-max aggregate as [[qualityKeepers]] —
    * never a window over the fingerprint. `priorities` is a tiny
    * (source, priority) table, broadcast. */
  def priorityKeepers(docs: DataFrame, priorities: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    import graft.functions.TextAnalysis
    val scored = docs.select(col(idCol), col(srcCol),
        TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))
      .join(broadcast(priorities), srcCol)
    val keepers = scored.groupBy("fp")
      .agg(max(struct(col("priority"), (-col(idCol)).as("neg_id"))).as("best"))
      .select(col("fp"), (-col("best.neg_id")).as("keeper_id"))
    scored.join(keepers, "fp")
      .select(col(idCol), col(srcCol), col("priority"), col("keeper_id"),
        (col(idCol) === col("keeper_id")).cast("int").as("kept"))
      .orderBy(idCol)
  }

  // ---- cross-document repeated substrings (boilerplate spans) -------
  // Document-level near-dup (MinHash/SimHash) misses the other failure
  // mode of crawled training data: long VERBATIM repeats embedded in
  // otherwise-distinct documents — license headers, navigation chrome,
  // templated disclaimers. The literature's exact-substring dedup
  // builds a corpus-wide suffix array (Lee et al., "Deduplicating
  // Training Data Makes Language Models Better", arXiv:2107.06499, §4);
  // a suffix array is a single giant sorted structure — the wrong shape
  // for a shared-nothing cluster. The distributed form here fingerprints
  // every token window and WINNOWS them (Schleimer/Wilkerson/Aiken,
  // "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  // 2003): keep, for every run of `guarantee` consecutive window
  // hashes, the minimum — a CONTENT-defined selection, so two
  // occurrences of the same substring select the same fingerprints no
  // matter where in their documents they sit (a fixed stride grid would
  // only match when the offsets happen to align mod stride). The
  // winnowing theorem gives structural recall: any verbatim repeat of
  // ≥ window + guarantee - 1 tokens shares ≥ 1 selected fingerprint,
  // at expected density ~2/(guarantee+1) of all windows. The entire
  // selection runs INSIDE array expressions per document row — zero
  // shuffle before the fingerprint aggregation, which itself is a
  // map-side-partial groupBy; never all-pairs, no global sorted
  // structure. md5 fingerprints keep every step SQL-expressible, so
  // the operator is oracle-checked end to end (a production deployment
  // would swap in a rolling hash to make each offset O(1) instead of
  // O(window); md5 is the engine-portable choice).

  /** Winnowing-selected window fingerprints: (id, win_start, fp) with
    * win_start 1-based. Documents shorter than `window` tokens have no
    * windows (whole-short-doc duplication is [[exactDuplicateGroups]]'
    * job); documents with fewer than `guarantee` windows select the
    * single overall minimum. Ties on identical fingerprint values break
    * by position (the fingerprint is what downstream matching keys on,
    * so ties never cost recall). At warehouse scale this is the table
    * you'd persist once per crawl snapshot. */
  def winnowedFingerprints(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 20, guarantee: Int = 10): DataFrame = {
    require(window > 0 && guarantee > 0,
      s"window=$window guarantee=$guarantee")
    requireIdColFree(idCol, Seq("t", "selkey", "win_start", "fp"),
      "winnowedFingerprints")
    docs
      .select(col(idCol), split(trim(lower(col(textCol))), "\\s+").as("t"))
      .where(size(col("t")) >= window)
      // native codegen'd hash-and-winnow (the HOF tree below is the
      // interpreted parity twin; at crawl scale this per-token kernel
      // is the hot path — same rationale as MinHashSignature)
      .select(col(idCol),
        explode(graft.functions.Winnow.winnowedKeys(col("t"), window,
          guarantee)).as("selkey"))
      .select(col(idCol),
        expr("cast(substr(selkey, 34, 10) as bigint)").as("win_start"),
        expr("substr(selkey, 1, 32)").as("fp"))
  }

  /** CHAR-granularity winnowed fingerprints: (id, win_start, fp) with
    * windows sliding over the CHARACTERS of the whitespace-normalized
    * lowercase text (runs of whitespace collapse to one space, so
    * formatting variants share a char stream) — win_start is a 1-based
    * CHAR position. This closes the word-k-gram cover's gap for
    * scripts without whitespace word boundaries (where the word form
    * sees one giant token and selects nothing) and for repeats whose
    * boundaries cut words mid-token: any verbatim repeat of
    * ≥ window+guarantee−1 normalized chars shares a selected
    * fingerprint REGARDLESS of where word boundaries fall — the
    * char-granularity approximation of Lee et al.'s suffix-array
    * ExactSubstr (arXiv:2107.06499), over the SAME native winnow
    * kernel ([[graft.functions.Winnow.winnowedKeys]]: single-char
    * tokens make the space-joined window encoding injective, so no new
    * hashing path). Positions are UTF-16 code units on the Spark side
    * and code points in the DuckDB twin — identical for the BMP text
    * the fixtures carry; a surrogate-heavy corpus should normalize
    * first. Defaults: window=40 chars, guarantee=20 → any ≥59-char
    * verbatim repeat is guaranteed a shared fingerprint (≈ a 10-word
    * sentence, the same detection floor as the word form's 29 tokens
    * scaled to char density). */
  def charWinnowedFingerprints(docs: DataFrame, idCol: String,
      textCol: String, window: Int = 40, guarantee: Int = 20): DataFrame = {
    require(window > 0 && guarantee > 0,
      s"window=$window guarantee=$guarantee")
    requireIdColFree(idCol, Seq("t", "selkey", "win_start", "fp"),
      "charWinnowedFingerprints")
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    docs
      // split("") leaves a trailing empty element (Java regex split
      // semantics); the filter drops it so the char array matches
      // DuckDB's string_split(s, '') exactly
      .select(col(idCol), filter(split(norm, ""), t => t =!= "").as("t"))
      .where(size(col("t")) >= window)
      .select(col(idCol),
        explode(graft.functions.Winnow.winnowedKeys(col("t"), window,
          guarantee)).as("selkey"))
      .select(col(idCol),
        expr("cast(substr(selkey, 34, 10) as bigint)").as("win_start"),
        expr("substr(selkey, 1, 32)").as("fp"))
  }

  /** [[repeatedWindowSpans]] at CHAR granularity — same heavy-
    * fingerprint aggregation and flag-back join over
    * [[charWinnowedFingerprints]], same scale shape (one materialized
    * fingerprint pass, broadcast-or-salted heavy join). */
  def charRepeatedWindowSpans(docs: DataFrame, idCol: String,
      textCol: String, window: Int = 40, guarantee: Int = 20,
      minDocs: Int = 2, broadcastHeavy: Boolean = true,
      nSalts: Int = 8): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    spansFromWins(
      checkpointKeepPartitioning(charWinnowedFingerprints(
        docs.repartition(par), idCol, textCol, window, guarantee),
        eager = true), // convoy stance: heavy agg + flag-back join
      idCol, minDocs, broadcastHeavy, nSalts)
  }

  /** Expression-tree twin of [[graft.functions.Winnow.winnowedKeys]] —
    * parity reference (interpreted HOFs; DedupSpec pins equality).
    * Caller must pre-filter `size(toks) >= window` — Spark's
    * `sequence(1, k)` with k ≤ 0 counts DOWN, so a shorter document
    * would produce nonsense windows rather than none. */
  def winnowedKeysFold(toks: Column, window: Int, guarantee: Int): Column = {
    val hk = transform(
      sequence(lit(1), size(toks) - (window - 1)),
      p => concat(
        md5(concat_ws(" ", slice(toks, p, lit(window))).cast("binary")),
        lit(":"), lpad(p.cast("string"), 10, "0")))
    array_distinct(transform(
      sequence(lit(1), greatest(lit(1), size(hk) - (guarantee - 1))),
      q => array_min(slice(hk, q, lit(guarantee)))))
  }

  /** Fingerprints occurring in ≥ minDocs distinct documents — the one
    * definition both span reporting and the boilerplate drop-list key
    * on (they must agree or the drop-list diverges from the spans). */
  private def heavyFingerprints(wins: DataFrame, idCol: String,
      minDocs: Int): DataFrame =
    wins.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .where(col("n_docs") >= minDocs)

  // The wins ⨝ heavy(fp) flag-back join is where zipfian skew lives for
  // this operator: fp frequencies follow the corpus's repeat
  // distribution, and one license-header fingerprint present in 10M
  // documents puts 10M wins rows on a single reducer if the join falls
  // to sort-merge. Same two skew-safe paths as Tfidf's term join:
  //
  //  - broadcastHeavy = true (default): broadcast the (fp, n_docs)
  //    side. SAFE under the documented bound: heavy fingerprints are
  //    those repeated across ≥ minDocs documents — the tail of the
  //    fingerprint distribution, orders of magnitude smaller than the
  //    winnow-selected set (itself ~2/(guarantee+1) of all windows) —
  //    and each row is 44 bytes. A corpus that is MOSTLY boilerplate
  //    can exceed broadcast range;
  //  - broadcastHeavy = false: [[Ops.saltedJoin]] spreads each hot
  //    fingerprint over nSalts shuffle partitions. Value-identical
  //    (DedupSpec pins parity and both plan shapes, mirroring
  //    TfidfSpec).

  /** Selected fingerprints occurring in ≥ `minDocs` DISTINCT documents:
    * (id, win_start, fp, n_docs) — the repeated spans to mask or cut.
    * The distinct-doc count aggregates with map-side partials; skew
    * stance of the flag-back join documented above. */
  def repeatedWindowSpans(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 20, guarantee: Int = 10, minDocs: Int = 2,
      broadcastHeavy: Boolean = true, nSalts: Int = 8): DataFrame =
    spansFromWins(inlineWins(docs, idCol, textCol, window, guarantee),
      idCol, minDocs, broadcastHeavy, nSalts)

  /** One-shot materialization boundary for the INLINE consumers: the
    * fingerprint projection feeds both the heavy aggregation and the
    * flag-back join, and without a boundary Catalyst inlines (= fully
    * recomputes) the md5+winnow pass into each — two corpus passes per
    * consumer. Lazy localCheckpoint computes it once and is reclaimed
    * by the context cleaner when the frame drops (the
    * minhashNearDupPairs stance, including the construction-stays-
    * job-free property of [[Ops.checkpointKeepPartitioning]]); the
    * persisted form of the same boundary is
    * [[IndexStore.buildWinnowIndex]]. */
  private def inlineWins(docs: DataFrame, idCol: String, textCol: String,
      window: Int, guarantee: Int): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    checkpointKeepPartitioning(
      winnowedFingerprints(docs.repartition(par), idCol, textCol, window,
        guarantee),
      eager = true) // convoy stance: heavy agg + flag-back join
  }

  /** [[repeatedWindowSpans]] over an already-materialized fingerprint
    * table — the shape [[IndexStore.repeatedWindowSpansFromIndex]]
    * serves, where the md5+winnow pass ran ONCE at build time instead
    * of once per consumer. */
  def spansFromWins(wins: DataFrame, idCol: String, minDocs: Int = 2,
      broadcastHeavy: Boolean = true, nSalts: Int = 8): DataFrame = {
    val heavy = heavyFingerprints(wins, idCol, minDocs)
    val flagged =
      if (broadcastHeavy) wins.join(broadcast(heavy), "fp")
      else Ops.saltedJoin(wins, heavy, "fp", nSalts)
    flagged.select(col(idCol), col("win_start"), col("fp"), col("n_docs"))
  }

  /** Boilerplate-heavy documents: fraction of a document's selected
    * fingerprints that are cross-document repeats, for documents with
    * ≥ `minDocs`-way repeated content — the drop-list a curation
    * pipeline feeds from this signal. Returns (id, n_windows,
    * n_repeated, repeat_frac ≥ `minFrac`). One LEFT join + one per-doc
    * aggregation: repeated and total counts come from the same pass
    * (heavy fingerprints are unique per fp, so the join never
    * multiplies rows), and the threshold filters the RAW ratio — the
    * rounded output column would let a just-under-`minFrac` document
    * round its way across the boundary and diverge from the oracle.
    * The winnow projection evaluates ONCE (materialization boundary in
    * [[inlineWins]]); a crawl deployment persists the fingerprints once
    * per snapshot via [[IndexStore.buildWinnowIndex]] and feeds both
    * consumers from the table
    * ([[IndexStore.boilerplateDocsFromIndex]]). */
  def boilerplateDocs(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 20, guarantee: Int = 10, minDocs: Int = 2,
      minFrac: Double = 0.5,
      broadcastHeavy: Boolean = true, nSalts: Int = 8): DataFrame =
    boilerplateFromWins(inlineWins(docs, idCol, textCol, window,
      guarantee), idCol, minDocs, minFrac, broadcastHeavy, nSalts)

  /** Batch-internal verbatim-overlap pairs: documents sharing ≥
    * `minSharedFps` winnowed fingerprints — i.e. a verbatim repeat of
    * ≥ window + guarantee − 1 tokens (guaranteed detected; shorter
    * repeats best-effort). Returns (id_a, id_b, n_shared_fps) with
    * id_a < id_b. The self-join keys on fp with the same hot-bucket
    * star-link guard as [[lshCandidatePairs]]: a boilerplate
    * fingerprint present in thousands of docs contributes (rep, member)
    * pairs instead of the quadratic bucket — for the ingest-gate use
    * (minSharedFps = 1) every member stays linked to the keeper, which
    * is exactly the drop-all-but-one outcome dedup wants; with higher
    * minSharedFps, star-linked fingerprints under-count shared spans
    * (documented trade, same as the LSH guard). */
  def winnowNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 20, guarantee: Int = 10, minSharedFps: Int = 1,
      hotFpThreshold: Int = DefaultHotBandThreshold): DataFrame = {
    require(hotFpThreshold >= 2,
      s"hotFpThreshold=$hotFpThreshold: a bucket needs at least two " +
        "members to form a pair")
    requireIdColFree(idCol, Seq("fp_n", "fp_rep", "id_a", "id_b",
      "n_shared_fps"), "winnowNearDupPairs")
    // distinct (id, fp): a fingerprint repeated WITHIN one doc must
    // count once toward bucket sizes and shared-fp counts. The
    // materialization boundary sits AFTER the sizing window (the
    // lshCandidatePairs shape): `sized` feeds both self-join sides plus
    // the hot branch, so a pre-window boundary would still compute the
    // window three times, and the captured fp-partitioning makes the
    // self-join co-partitioned for free.
    val wins = winnowedFingerprints(docs, idCol, textCol, window, guarantee)
      .select(col(idCol), col("fp")).distinct()
    val w = Window.partitionBy("fp")
    // same cap-observability stance as lshCandidatePairs' `sized`
    // eager: same multi-consumer convoy stance as lshCandidatePairs
    val sized = IndexStore.observeCap(checkpointKeepPartitioning(wins
        .withColumn("fp_n", count(lit(1)).over(w))
        .withColumn("fp_rep", min(col(idCol)).over(w)), eager = true),
      col("fp_n") > hotFpThreshold && col(idCol) =!= col("fp_rep"),
      col("fp_n") > hotFpThreshold, col("fp_n"))
    val small = sized.where(col("fp_n") <= hotFpThreshold)
      .select(col(idCol), col("fp"))
    val smallPairs = small.alias("a")
      .join(small.alias("b"),
        col("a.fp") === col("b.fp") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.fp").as("fp"))
    val hotPairs = sized
      .where(col("fp_n") > hotFpThreshold && col(idCol) =!= col("fp_rep"))
      .select(col("fp_rep").as("id_a"), col(idCol).as("id_b"), col("fp"))
    smallPairs.unionByName(hotPairs)
      .groupBy("id_a", "id_b")
      .agg(countDistinct(col("fp")).as("n_shared_fps"))
      .where(col("n_shared_fps") >= minSharedFps)
  }

  /** [[boilerplateDocs]] over an already-materialized fingerprint
    * table. */
  def boilerplateFromWins(wins: DataFrame, idCol: String,
      minDocs: Int = 2, minFrac: Double = 0.5,
      broadcastHeavy: Boolean = true, nSalts: Int = 8): DataFrame = {
    val heavy = heavyFingerprints(wins, idCol, minDocs)
    val flagged =
      if (broadcastHeavy) wins.join(broadcast(heavy), Seq("fp"), "left")
      else Ops.saltedJoin(wins, heavy, "fp", nSalts, "left_outer")
    flagged
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"),
        count(col("n_docs")).as("n_repeated"))
      .where(col("n_repeated") > 0 &&
        col("n_repeated").cast("double") / col("n_windows") >= minFrac)
      .select(col(idCol), col("n_windows"), col("n_repeated"),
        round(col("n_repeated").cast("double") / col("n_windows"), 6)
          .as("repeat_frac"))
  }

  /** Paragraph-level exact dedup — CCNet's dedup granularity (Wenzek
    * et al. arXiv:1911.00359 §3.1: normalized PARAGRAPH hashes, not
    * whole documents): keep only the corpus-wide FIRST occurrence
    * (smallest (doc, line) position) of every normalized line, then
    * re-assemble the surviving lines per document. Returns
    * (idCol, n_kept, clean_text); a document whose every line is some
    * earlier document's duplicate drops out entirely.
    *
    * Scale shape: the first-occurrence keeper is
    * groupBy(hash).agg(min(position)) + an equi-join back — partial
    * aggregation absorbs a boilerplate hash's millions of copies
    * map-side, where a window over the hash would funnel them through
    * one task (the hot-fingerprint doctrine). Reassembly groups by the
    * document id, a uniform key; the per-doc sort happens inside
    * `array_sort` over that document's own lines, never as a global
    * sort. The first-occurrence key is a STRUCT min over
    * (doc_id, line_idx) — lexicographic struct ordering, so no
    * arithmetic encoding and no overflow at any id scale (the
    * superseded doc_id·10⁶ + line_idx form wraps 63-bit longs once
    * doc ids pass ~9.2e12 — silent at fixture scale, real for 64-bit
    * hash ids; the softDedupKeep lesson applied here). */
  def paragraphDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val paras = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("para_idx", "para")))
    val keyed = paras
      .withColumn("ph", graft.functions.TextAnalysis.fingerprintMd5(col("para")))
      .withColumn("__pk", struct(col(idCol), col("para_idx")))
    val fst = keyed.groupBy("ph").agg(min(col("__pk")).as("__first"))
    keyed.join(fst, "ph")
      .where(col("__pk") === col("__first"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("para_idx"), col("para")))),
          s => s.getField("para"))).as("clean_text"))
  }
}
