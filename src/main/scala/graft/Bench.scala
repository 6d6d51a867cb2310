package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Fixed CONTROL queries, always timed at FULL reps regardless of the
    * expensive-query cutoff: three CPU-bound (expression-heavy,
    * page-cache-insensitive) and three IO-bound (scan/stream-heavy).
    * This machine measurably degrades under sustained IO (DAMON-style
    * page-cache reclaim — ARCHITECTURE.md "Measurement honesty"), so a
    * raw per-query number from the driver's bench has an unknowable
    * machine-state multiplier; the control sums are emitted in the
    * truncation-surviving TAIL of the JSON line so any two rounds can
    * be compared control-calibrated (suspect ratio vs control ratio)
    * without same-JVM A/B archaeology. Membership is asserted against
    * the registry in ExtensionsSpec — a rename fails the suite, not
    * the driver's run. */
  val ControlCpu: Seq[String] =
    Seq("x10_conditional_column", "t4_fingerprint",
      "ss2_cosine_topk_blocked")
  val ControlIo: Seq[String] =
    Seq("s1_scan_pruned_filtered", "w8_partition_fanout",
      "sr2_streaming_merge")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query repetitions, LOWER median reported. A single-shot bench
    // is at the mercy of machine-state noise (JIT, page cache, a
    // co-tenant burning cores): round 6's driver run showed phantom
    // 4-10× jumps on untouched queries that an immediate re-run
    // disproved — repetition absorbs the one upward spike. Three
    // timing regimes by design (see QueryDef.Timing): WarmServe
    // queries (build-once indexes, the memoized capstone's report
    // consumers) build on the first rep and serve on the rest, so
    // their figure is warm serving cost; Standard queries above the
    // expensive-query cutoff run ONCE (lifecycle drills — stream
    // drains, in-query rebuilds — whose runtime swamps per-rep noise
    // and whose reps re-run whole builds); everything else repeats.
    // The ingest-loop queries (ext_srp_ingest, ext_winnow_ingest)
    // rebuild their index UNCONDITIONALLY per invocation, so a rep
    // never appends onto the previous rep's grown index.
    // Default 2 as of round 15 (was 3): the reported figure is the
    // LOWER median, which for two reps is the min — still absorbing
    // the one upward machine-state spike per query that motivated
    // multi-rep timing (noise here is one-sided: spikes, never
    // phantom speed). The third rep bought sub-5% precision on
    // sub-second queries at the cost of ~2.5 min of wall the driver's
    // budget no longer affords.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // Expensive-query cutoff (seconds): a Standard-timing query whose
    // FIRST rep runs at least this long is not re-run — that one
    // measurement stands. Rationale: the registry is ~300 queries and
    // the end-of-round bench must fit a fixed driver budget (rounds 13
    // and 14 both overran it, blanking the round's hard artifacts); the
    // multi-second queries are lifecycle drills (index rebuilds, stream
    // drains) where (a) per-rep machine noise is small RELATIVE to the
    // measurement and (b) each extra rep re-runs a whole build for a
    // digit the median would not change. Sub-cutoff queries — the vast
    // majority — keep the median-of-reps noise absorption unchanged.
    // WarmServe queries (tableExists-guarded build-once indexes) are
    // exempt: their rep 1 pays a one-time build and the warm median IS
    // their number, so they always run full reps. CONTROL queries are
    // exempt too — their whole purpose is a like-for-like figure every
    // round, so the regime must never bend them.
    val cutoff = sys.env.getOrElse("SPARK_GRAFT_BENCH_CUTOFF", "3.0").toDouble
    // Optional full per-query dump (sec + reps actually run per query)
    // — the judge-verifiable artifact the one-line tail can't carry
    // (the archiving harness keeps only ~2000 trailing chars, losing
    // ~250 of 311 per-query numbers). The builder commits a
    // quiet-machine run of this as BENCH_LOCAL_r{N}.json each round.
    // Best-effort: a write failure must never fail the bench.
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT").filter(_.nonEmpty)
    val timings = SparkEntry.timings
    val controls = (ControlCpu ++ ControlIo).toSet
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
    // the error per query (first failing rep, remaining reps skipped)
    // and exit non-zero if any failed.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      var lastElapsed = 0.0
      val fullReps = controls(name) ||
        timings.get(name).contains(QueryDef.WarmServe)
      var i = 0
      while (i < reps && err.isEmpty &&
          (i == 0 || fullReps || times.head < cutoff)) {
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)); times += (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          lastElapsed = (System.nanoTime() - t0) / 1e9
          err = Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(200)}")
        }
        i += 1
      }
      // lower median (index (n-1)/2 of the sorted reps) — for reps=3
      // the true median. A failed query reports its FAILING elapsed even
      // when earlier reps succeeded: the error is the headline, and a
      // median of the surviving reps would make a flaky query read as a
      // healthy timing right next to its own error entry.
      val med = if (err.isDefined || times.isEmpty) lastElapsed
        else times.sorted.apply((times.length - 1) / 2)
      (name, med, err, i)
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
    // The harness that archives this line keeps only its TAIL (2000
    // chars in round 9 — 57 of 147 queries survived, and the leading
    // total was cut). Defend against truncation-from-the-front: times
    // render at 1e-3 (machine noise swamps finer digits anyway, and a
    // shorter line keeps more queries visible), queries stay
    // alphabetical (a STABLE visible suffix across rounds, so
    // round-over-round comparisons see the same names), and the
    // summary fields — errors, the control-calibration sums, and the
    // timing-regime parameters (reps/cutoff/how many queries actually
    // ran single-rep, so a regime change is never mistaken for a
    // speedup) — come LAST so they always survive.
    val qs = results.map { case (k, v, _, _) => jstr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _) => jstr(s"$k: $e") }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val byName = results.map(r => r._1 -> r).toMap
    def controlSum(names: Seq[String]): Double =
      names.flatMap(byName.get).map(_._2).sum
    // errored queries are carried in `errors`, not here — counting a
    // rep-1 failure as "single-rep" would make breakage read as a
    // cutoff-regime shift, the exact confusion this field prevents
    val nSingle = results.count(r => r._3.isEmpty && r._4 == 1)
    // "stat" names the per-query statistic truthfully: index (n-1)/2 of
    // the sorted reps is the LOWER median — the min when reps=2 (the
    // default), the true median for odd reps. Echoed so a regime change
    // (reps knob) is never mistaken for a speedup; the timing semantics
    // themselves are unchanged (round-over-round comparability).
    val tail = f""""errors":$errs,"reps":$reps,"cutoff":$cutoff%.1f,""" +
      f""""n_single_rep":$nSingle,"stat":"lower_median",""" +
      f""""control_cpu":${controlSum(ControlCpu)}%.3f,""" +
      f""""control_io":${controlSum(ControlIo)}%.3f,""" +
      f""""n_queries":${results.length},"unit":"sec","value":$total%.3f"""
    println(s"""{"metric":"total","queries":$qs,"sf":"$sfDir",$tail}""")
    // COMPACT summary as the very LAST stdout line: the full line above
    // (the original one-line contract, kept verbatim — per-query map and
    // all) is ~12 KB at 314 queries, and the archiving harness keeps
    // only a ~2000-char TAIL of the run's output, so in 16 rounds it has
    // never parsed it (BENCH_r*.json parsed: null). This line carries
    // every summary field but no per-query map (~400 bytes — it survives
    // any truncation window and parses standalone); the per-query map
    // lives in the full line and in the SPARK_GRAFT_BENCH_OUT dump.
    println(s"""{"metric":"total","sf":"$sfDir",$tail}""")
    outPath.foreach { p =>
      val perQuery = results.map { case (k, v, e, n) =>
        jstr(k) + ":{" + f""""sec":$v%.3f,"reps":$n""" +
          e.fold("")(m => s""","err":${jstr(m)}""") + "}"
      }.mkString("{", ",", "}")
      val doc = s"""{"sf":${jstr(sfDir)},"queries":$perQuery,$tail}\n"""
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), doc)
      catch { case t: Throwable =>
        System.err.println(s"[bench] could not write $p: ${t.getMessage}")
      }
    }
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
