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

  /** Exact global row enumeration without the single-task global window.
    *
    * `Window.orderBy(...)` with no partitionBy is correct but funnels
    * the whole table through one task — the straggler that kills a
    * 100 TB run. Same result in three fully-parallel passes:
    *
    *   1. bucket rows by approximate quantiles of the leading order key
    *      (every tie of that key lands in ONE bucket, so bucket
    *      boundaries are consistent with the lexicographic total order
    *      over `orderCols`);
    *   2. `row_number()` inside each bucket — parallel window partitions;
    *   3. add each bucket's exclusive cumulative count (≤ nBuckets rows
    *      collected to the driver, broadcast-joined back).
    *
    * Output is value-identical to `row_number().over(Window.orderBy(...))`
    * (as LONG); quantile error only shifts load balance, never values.
    * Rows with a null leading key fall into bucket 0, matching Spark's
    * NULLS FIRST ascending default.
    *
    * @param leadingNumeric a numeric/castable expression that is
    *        non-strictly monotone in `orderCols.head` (usually the
    *        column itself, or `ts.cast("double")`).
    */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column],
      leadingNumeric: Column, outCol: String = "rn",
      nBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val keyed = df.withColumn("__gk", leadingNumeric.cast("double"))
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = keyed.stat.approxQuantile("__gk", probes, 0.001)
      .distinct.sorted
    val bucketOf = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__gk") > lit(b), 1).otherwise(0)
    }
    val bucketed = keyed.withColumn("__bkt", bucketOf)
    // Tiny by construction: one row per bucket.
    val counts = bucketed.groupBy("__bkt").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = acc; acc += c; (b, o) }
    val offDf = spark.createDataFrame(offsets.toIndexedSeq).toDF("__bkt", "__off")
    val w = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
    bucketed.join(broadcast(offDf), "__bkt")
      .withColumn(outCol, row_number().over(w).cast("long") + col("__off"))
      .drop("__bkt", "__gk", "__off")
  }
}
