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
    // bit_xor, not sum: summing full-range 64-bit hashes overflows Long
    // within a couple of rows and ANSI mode (Spark 4 default) throws —
    // xor consumes every row and column and cannot overflow.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.selectExpr("bit_xor(xxhash64(struct(*)))").collect()
    SparkEntry.queries.keys.toSeq.sorted.headOption
      .foreach(n => try run(SparkEntry.queries(n)(spark, sfDir))
        catch { case _: Throwable => () })
    // A failed query must be VISIBLE: a swallowed exception times as ~0s
    // and makes the bench read *faster* the more queries break. Record
    // the error per query and exit non-zero if any failed.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { run(fn(spark, sfDir)); None }
        catch { case t: Throwable =>
          Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(200)}")
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // escape EVERY control character — exception messages can embed
    // arbitrary bytes, and one raw control char makes the single JSON
    // result line unparseable exactly when its diagnostics matter
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(s"$k: $e") }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
