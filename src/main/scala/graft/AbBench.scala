package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): interleaved same-JVM A/B
  * of the streaming queries whose BENCH_r09 medians jumped with no code
  * change on their paths (sr1_streaming_window 1.25 → 4.46 s,
  * sr2_streaming_merge 1.50 → 3.88 s, amid a broad slowdown of
  * untouched sub-second batch scans), to separate machine noise from a
  * genuine regression — ARCHITECTURE.md's measurement doctrine says
  * multi-second movers are only exonerated by exactly this run.
  *
  * Shape: one JVM, same session config as [[Bench]], a warmup pass,
  * then `reps` strict-interleave rounds of control → sr1 → sr2 → sr3.
  * The interleave means any machine-state drift hits the control and
  * the suspects alike within each round; the control (an untouched
  * batch scan that also inflated in BENCH_r09) calibrates the round.
  * Per-rep seconds print as one JSON line per (query, rep); medians
  * at the end. Reading the verdict: suspect medians back at their
  * BENCH_r08 level with round-9 code present ⇒ the code is innocent
  * and the r9 numbers were machine load; suspect medians still at the
  * r9 level while the control sits at ITS r8 level ⇒ a real
  * regression, bisect the round-9 conf-registry rework.
  *
  * Usage: runMain graft.AbBench [sfDir] [reps] [queryName...]
  * (extra args replace the default control+suspect list — the tool is
  * the repo's general interleaved A/B, the default list documents the
  * round-9/10 run that exonerated the conf-registry rework)
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the Bench materialization: full-row hash aggregate, so nothing is
    // pruned and the timing covers the same work the driver bench times
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.selectExpr("bit_xor(xxhash64(struct(*)))").collect()
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("s7_ordered_key_scan", "sr1_streaming_window",
        "sr2_streaming_merge", "sr3_streaming_dedup_state")
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query $n"))
    // warmup round (JIT, codegen cache, file index) — not recorded
    names.foreach(n => run(SparkEntry.queries(n)(spark, sfDir)))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      run(SparkEntry.queries(n)(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      times(n) = times(n) :+ sec
      println(f"""{"q":"$n","rep":$r,"sec":$sec%.3f}""")
    }
    names.foreach { n =>
      val s = times(n).sorted
      println(f"""{"q":"$n","median":${s((s.length - 1) / 2)}%.3f,""" +
        f""""min":${s.head}%.3f,"max":${s.last}%.3f,"reps":$reps}""")
    }
    spark.stop()
  }
}
