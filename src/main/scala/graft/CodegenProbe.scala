package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: count WholeStageCodegen subtrees per query (AQE disabled —
  * the adaptive wrapper hides codegen spans in pre-execution explain).
  * Usage: runMain graft.CodegenProbe <queryName...> */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val s = df.queryExecution.explainString(ExplainMode.fromString("codegen"))
      val fallbacks = s.linesIterator.count(_.contains("CodegenFallback"))
      println(s"$n: ${s.linesIterator.find(_.contains("WholeStageCodegen"))
        .getOrElse("?")}; fallbackLines=$fallbacks")
    }
    spark.stop()
  }
}
