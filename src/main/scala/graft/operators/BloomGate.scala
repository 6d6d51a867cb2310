package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership gate for dedup probes — the Dolma-style
  * accelerator for the most common question the engine asks at scale:
  * "has this fingerprint been seen before?"
  *
  * The exact answer is a semi join against the reference fingerprint
  * set, which shuffles the FULL candidate stream by fingerprint even
  * though, on a forever-sync ingesting fresh crawl, the overwhelming
  * majority of candidates are new and the join discards them. A Bloom
  * filter built over the reference flips that cost: membership of the
  * negative majority is answered by a broadcast-local bit test inside
  * the scan's projection (no shuffle, no join), and only the
  * Bloom-POSITIVE sliver proceeds to the exact semi join — which also
  * removes the filter's false positives, so the composed operator is
  * VALUE-IDENTICAL to the plain semi join (Bloom filters have no false
  * negatives). That identity is what makes the gate oracle-checkable
  * end to end (`ext_bloom_dedup_probe`).
  *
  * Built on Spark's own sketch machinery rather than re-implementing
  * it: [[BloomFilterAggregate]] (the TypedImperativeAggregate behind
  * runtime bloom join pruning — distributed build, OR-merged across
  * partitions) and [[BloomFilterMightContain]] (whose codegen
  * deserializes the filter once per task, not per row). Keys hash to
  * long via the codegen'd xxhash64 on BOTH sides; a 64-bit hash
  * collision is just one more false positive for the confirm join to
  * remove.
  *
  * Scale stance: the serialized filter is driver-held and shipped as a
  * literal — bounded by numBits/8 bytes, NOT by corpus rows (1%-fpp
  * sizing is ~1.2 bytes/item, so a billion-fingerprint reference is
  * ~1.2 GB: beyond the comfortable-literal band, at which point the
  * filter shards per id-bucket exactly like every persisted index kind
  * and the probe routes by bucket first). At verify scale one filter
  * is the right shape, and the bound is stated rather than discovered.
  */
object BloomGate {

  /** Serialized filter over `key` (hashed to long) — one distributed
    * aggregation; null when `df` is empty (the empty set). */
  def buildFilter(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    buildFilterSized(df, key, expectedItems,
      org.apache.spark.util.sketch.BloomFilter
        .optimalNumOfBits(expectedItems, fpp))
  }

  /** [[buildFilter]] with the bit count pinned explicitly — the layout
    * (expectedItems, numBits) fixes the hash family, so two filters
    * built through this with the same pair are bitwise-OR mergeable
    * (the IndexStore sidecar's append path). */
  def buildFilterSized(df: DataFrame, key: Column, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    require(expectedItems > 0 && numBits > 0)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits))
    val row = df.agg(
      ColumnBridge.column(agg.toAggregateExpression()).as("bloom")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Membership test against a built filter — a scan-local predicate
    * (codegen'd, filter deserialized once per task). A null filter is
    * the empty set: always false. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    if (filter == null) lit(false)
    else ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** The composed gate: candidates whose `key` IS in the reference
    * set, computed as Bloom prefilter → exact-confirm semi join.
    * Value-identical to `candidates SEMI JOIN reference` — the Bloom
    * stage only shrinks the join's streamed side to the positive
    * sliver (true members + fpp·negatives). */
  def memberProbe(candidates: DataFrame, reference: DataFrame,
      candKey: Column, refKey: Column, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val f = buildFilter(reference, refKey, expectedItems, fpp)
    candidates
      .where(mightContain(f, candKey))
      .join(reference.select(refKey.as("__bloom_ref_key")).distinct(),
        candKey === col("__bloom_ref_key"), "left_semi")
  }
}
