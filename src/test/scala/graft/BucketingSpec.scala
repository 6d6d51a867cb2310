package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Evidence for the ARCHITECTURE.md claim that bucketing the merge
  * target by pk removes the merge shuffle: bucketed-by-key tables join
  * with zero ShuffleExchange on the bucketed sides. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-pk tables join without a shuffle; unbucketed need two") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, sf0001, "orders")
      val target = orders.withColumn("o_orderpriority", lit("OLD"))
      spark.sql("DROP TABLE IF EXISTS graft_target_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_delta_bkt")
      // a previous crashed run can leave the location without metadata
      Seq("graft_target_bkt", "graft_delta_bkt").foreach { t =>
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"/tmp/graft_warehouse/$t"))
      }
      target.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_target_bkt")
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_delta_bkt")

      val bkt = spark.table("graft_target_bkt")
        .join(spark.table("graft_delta_bkt"), "o_orderkey")
      val plain = target.join(orders.select(col("o_orderkey"),
        col("o_totalprice").as("tp2")), "o_orderkey")

      assert(shuffleCount(bkt) == 0, "bucketed join must not shuffle")
      withClue(plain.queryExecution.executedPlan.toString) {
        assert(shuffleCount(plain) >= 2, "unbucketed SMJ shuffles both sides")
      }

      // and the bucketed merge produces the same result as the df merge
      val merged = graft.operators.Incremental.merge(
        spark.table("graft_target_bkt"), spark.table("graft_delta_bkt"),
        "o_orderkey")
      assert(merged.count() == orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
