package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run CONCURRENTLY across a small worker pool (the registry is
  * ~300 queries and a sequential dump outgrew the driver's wall budget —
  * rounds 13/14 both came back with an empty correctness artifact). Each
  * worker drives its own `spark.newSession()`: session-scoped state —
  * runtime conf (and Ops' scoped-conf registry, which is keyed per
  * session and whose error text prescribes exactly this), temp views,
  * memory-sink names, streaming query managers — is then per-worker,
  * while the SparkContext, persisted catalog tables and FAIR task
  * scheduling are shared. Persisted index tables / /tmp staging paths
  * are query-name-unique by construction (audited round 15); the one
  * deliberate exception — queries SHARING a build-once index — is
  * serialized through `sharedLanes` below. */
object Verify {
  /** Queries that intentionally share a persisted index table (a
    * tableExists-guarded build reused across consumers) must not race
    * each other's build: same lane ⇒ same worker, sequential. */
  private val sharedLanes: Map[String, String] = Map(
    "ext_winnow_persisted" -> "lane_win_idx",
    "ext_boilerplate_persisted" -> "lane_win_idx")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Default to the machine, not a fixed 4: the full dump is ~300
    // queries (many rebuilding indexes in-query) and a 4-thread run
    // can exceed a driver-side timeout — an empty correctness artifact
    // where the repo gate is green (the round-13 anomaly).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val workers = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8")
      .toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // concurrent per-query jobs share the cores instead of queueing
      // behind one wide stage
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev convenience: SPARK_GRAFT_ONLY=q1,q2 restricts the dump to the
    // named queries (fast oracle iteration via scripts/check.py). The
    // driver never sets it — its runs stay full.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    // Lane = unit of sequential work. Heavy lifecycle lanes (streaming
    // drains, in-query index rebuilds) go FIRST so the long poles start
    // while the pool still has spare capacity (LPT-style makespan);
    // within a band, name order keeps runs deterministic.
    val lanes: Seq[Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]] =
      selected.toSeq.sortBy(_._1)
        .groupBy { case (n, _) => sharedLanes.getOrElse(n, n) }
        .toSeq.sortBy { case (lane, _) =>
          val heavy = lane.startsWith("sr") || lane.startsWith("e2e") ||
            lane.startsWith("ext_authority") ||
            lane.startsWith("ext_corpus_build") ||
            lane.startsWith("ext_doc_novelty") || lane == "lane_win_idx"
          (if (heavy) 0 else 1, lane)
        }.map(_._2)
    val queue = new java.util.concurrent.ConcurrentLinkedQueue(
      scala.jdk.CollectionConverters.SeqHasAsJava(lanes).asJava)
    val failed = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    val pool = (1 to workers.min(lanes.size).max(1)).map { _ =>
      val t = new Thread(() => {
        val sess = spark.newSession()
        SparkSession.setActiveSession(sess)
        var lane = queue.poll()
        while (lane != null) {
          lane.foreach { case (name, fn) =>
            try fn(sess, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            catch { case e: Throwable =>
              failed.incrementAndGet()
              failures.put(name, s"${e.getClass.getSimpleName}: " +
                Option(e.getMessage).getOrElse("").take(500))
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
          }
          lane = queue.poll()
        }
      })
      t.setDaemon(true)
      t.start()
      t
    }
    pool.foreach(_.join())
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-detectable partial-dump marker: failures.json (query →
    // error) sits next to oracle_sql.json, ALWAYS written — an empty
    // object is the positive "dump complete" statement, so a consumer
    // never has to distinguish "no failures" from "file never written"
    // or parse stderr.
    val fjson = {
      import scala.jdk.CollectionConverters._
      failures.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
    }
    Files.writeString(Paths.get(s"$outDir/failures.json"), fjson)
    // Failure visibility WITHOUT failing the process: the driver's
    // compare detects missing query dirs itself, and a non-zero exit
    // here could abort its pipeline and zero the whole artifact — the
    // exact round-13 failure mode. One summary line keeps a partial
    // dump diagnosable from the log alone.
    if (failed.get() > 0)
      System.err.println(s"[verify] ${failed.get()} quer" +
        s"${if (failed.get() == 1) "y" else "ies"} failed — " +
        "their dirs are missing from the dump")
    spark.stop()
  }
}
