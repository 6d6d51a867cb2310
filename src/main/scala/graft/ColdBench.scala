package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): times each named query's
  * FIRST execution in this JVM — the regime the driver bench actually
  * applies to every multi-second lifecycle query (Standard timing +
  * 3 s cutoff ⇒ one cold shot). [[AbBench]]'s warmup pass deliberately
  * hides exactly the cold costs (driver-side planning, codegen cache
  * misses, catalog/file-index population, JIT) that dominate those
  * one-shot numbers, so warm medians cannot adjudicate an optimization
  * aimed at statement-count/plan-size overheads. Run this in a FRESH
  * JVM per comparison arm; between arms, only the code under test may
  * differ. One warmup query (the same trivial aggregate the bench
  * uses) absorbs session init so the first named query is not charged
  * ~4 s of one-time setup the driver bench also excludes.
  *
  * Usage: runMain graft.ColdBench [sfDir] [queryName...]
  */
object ColdBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: ColdBench sfDir query...")
    names.foreach(n =>
      require(SparkEntry.queries.contains(n), s"unknown query $n"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.selectExpr("bit_xor(xxhash64(struct(*)))").collect()
    names.foreach { n =>
      val t0 = System.nanoTime()
      run(SparkEntry.queries(n)(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"q":"$n","cold_sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
