package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JIT, codegen cache, file-index) so the first
    // measured query doesn't absorb ~4s of one-time init.
    spark.range(1000).selectExpr("sum(id)").collect()
    // Materialize via a full-row hash aggregate, not count(): under a
    // bare count Catalyst prunes computed projections and eliminates
    // sorts, so expression-heavy queries would be timed as bare scans.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.selectExpr("sum(xxhash64(struct(*)))").collect()
    SparkEntry.queries.keys.toSeq.sorted.headOption
      .foreach(n => try run(SparkEntry.queries(n)(spark, sfDir))
        catch { case _: Throwable => () })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { run(fn(spark, sfDir)) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
