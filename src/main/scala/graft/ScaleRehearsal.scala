package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexStore}

/** Dev tool (not part of the driver contract): measures the dedup-path
  * scaling slope by running the inline near-dup kernels and the winnow
  * ingest loop on the sf corpus at 1× and ~10×. The 10× corpus is 9
  * perturbed replicas with per-replica DISJOINT vocabulary (every token
  * prefixed with the replica tag), so each replica reproduces the base
  * corpus's near-dup structure without near-dupping any other replica:
  * output volume then scales linearly by construction and the measured
  * slope is ENGINE scaling, not output blow-up. A slope well above the
  * corpus ratio on any query is the superlinearity red flag
  * (quadratic bucket, straggler, driver funnel).
  *
  * Prints one JSON line per (query, scale) with rows, seconds, and the
  * hot-bucket cap activity of the guarded kernels (collect, not count —
  * a derived count() aggregate would record observed metrics on its own
  * execution, not the measured frame's).
  *
  * Usage: runMain graft.ScaleRehearsal [sfDir]
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    def replicated(n: Int): DataFrame = {
      val toks = split(trim(lower(col("text"))), "\\s+")
      (1 until n).foldLeft(docs) { (acc, k) =>
        acc.unionByName(docs.select(
          (col("doc_id") + k * 10000000L).as("doc_id"),
          concat_ws(" ", transform(toks, t => concat(lit(s"r${k}x"), t)))
            .as("text")))
      }
    }
    def time(name: String, scale: Int, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val frame = df
      val rows = frame.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      val cap = IndexStore.capActivity(frame)
        .map(a => s""","suppressed":${a.rowsSuppressed}""" +
          s""","hotRows":${a.hotBucketRows},"maxBucket":${a.maxBucketN}""")
        .getOrElse("")
      println(f"""{"q":"$name","scale":$scale,"rows":$rows,"sec":$sec%.2f$cap}""")
    }
    for (scale <- Seq(1, 10)) {
      // eager boundary: replication cost is excluded from every timing
      val corpus = replicated(scale).localCheckpoint()
      time("d2_minhash_pairs", scale,
        Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
          threshold = 0.8))
      time("winnow_pairs", scale,
        Dedup.winnowNearDupPairs(corpus, "doc_id", "text"))
      val tbl = s"graft_rehearsal_s$scale"
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_wins")
      val t0 = System.nanoTime()
      IndexStore.buildWinnowIndex(corpus, "doc_id", "text", tbl,
        s"/tmp/graft_rehearsal/$tbl")
      val batch = corpus.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 500000000L).as("doc_id"),
          concat(col("text"), lit(" rtail rcoda")).as("text"))
      val (accepted, _) = IndexStore.dedupIngestWinnow(spark, batch,
        "doc_id", "text", tbl)
      val nAcc = accepted.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"q":"winnow_ingest_lifecycle","scale":$scale,""" +
        f""""accepted":$nAcc,"sec":$sec%.2f}""")

      // composed multi-gate lifecycle (exact → winnow → minhash): the
      // three builds plus one gated batch of byte-copies (exact-gate
      // rejects) and disjoint-vocabulary rewrites (survivors)
      val (gx, gw, gm) = (s"graft_rh_gx_s$scale", s"graft_rh_gw_s$scale",
        s"graft_rh_gm_s$scale")
      Seq(s"${gx}_fps", s"${gw}_wins", s"${gm}_bands", s"${gm}_shingles")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val tg = System.nanoTime()
      IndexStore.buildExactIndex(corpus, "doc_id", "text", gx,
        s"/tmp/graft_rehearsal/$gx")
      IndexStore.buildWinnowIndex(corpus, "doc_id", "text", gw,
        s"/tmp/graft_rehearsal/$gw")
      IndexStore.buildMinhashIndex(corpus, "doc_id", "text", gm,
        s"/tmp/graft_rehearsal/$gm")
      val toksG = split(trim(lower(col("text"))), "\\s+")
      val batchG = corpus.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 600000000L).as("doc_id"), col("text"))
        .unionByName(corpus.where(col("doc_id") % 10 === 1)
          .select((col("doc_id") + 700000000L).as("doc_id"),
            concat_ws(" ", transform(toksG,
              (t, i) => concat(lit("zz"), t, i.cast("string")))).as("text")))
      val (accG, decG) = IndexStore.dedupIngestGate(spark, batchG,
        "doc_id", "text", gx, gw, gm)
      val nAccG = accG.count()
      val nCutExact = decG.where(col("gate") === "exact").count()
      val secG = (System.nanoTime() - tg) / 1e9
      println(f"""{"q":"gate_ingest_lifecycle","scale":$scale,""" +
        f""""accepted":$nAccG,"cutExact":$nCutExact,"sec":$secG%.2f}""")
    }
    spark.stop()
  }
}
