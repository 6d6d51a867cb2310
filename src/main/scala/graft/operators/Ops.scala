package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic distributed-join utilities. */
object Ops {

  /** Skew-mitigated equi-join: the left (large, skewed) side gets a
    * deterministic salt in [0, nSalts); the right side is replicated
    * once per salt value. A hot key's rows then spread over nSalts
    * shuffle partitions instead of one straggler. Join results are
    * identical to the unsalted join (the salt only routes rows).
    *
    * AQE's skew-join splitting covers sort-merge joins at runtime;
    * explicit salting remains the tool when the skew is extreme or the
    * join is hash-partitioned upstream (e.g. into a bucketed write).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    // right/full outer would surface each unmatched (replicated) right
    // row nSalts times — parity with the unsalted join breaks.
    val jt = joinType.toLowerCase.replace("_", "")
    require(!jt.contains("right") && !jt.contains("full") && jt != "outer",
      s"saltedJoin does not support $joinType (replicated right side " +
        "would duplicate unmatched rows); salt the other side instead")
    // Salt derives from the whole left row hash — deterministic, and
    // uniform within a hot key (unlike hashing the key itself, which
    // would put the entire hot key in one salt bucket again).
    val l = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(nSalts)))
    val r = right.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
