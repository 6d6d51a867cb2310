package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries so
  * pushdown/broadcast/codegen can be inspected. Not part of the driver
  * contract. Usage: runMain graft.PlanCheck [sfDir] [name...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("s1_scan_pruned_filtered", "j1_semi_join_count",
        "s8_point_lookup_batch", "e2e_incremental_agg", "j4_merge_upsert",
        "ext_bloom_join_prune", "ext_minhash_persisted", "ext_hash_sample",
        "ext_curation_pipeline", "ext_tfidf_topterms",
        "ext_contamination_shuffle", "ext_srp_persisted",
        "ext_repeated_spans", "ext_winnow_persisted", "ext_srp_ingest",
        "ext_semantic_dedup", "ext_shard_assign", "ext_source_token_budget",
        "ext_ccnet_pipeline", "t7_gopher_repetition",
        "t9_gopher_quality", "t10_c4_filter")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
