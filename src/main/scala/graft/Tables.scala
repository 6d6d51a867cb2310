package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table catalog. Every query takes an `sfDir` (a scale-factor
  * directory such as /root/testdata/sf0.01) and reads the driver-generated
  * parquet from it. At production scale these reads become partitioned
  * object-store scans; parquet + Catalyst give pushdown/pruning for free.
  *
  * Timestamp normalization: the driver's parquet stores `events.ts` as
  * TIMESTAMP(NANOS) (which Spark only reads via the nanosAsLong legacy
  * flag) and the other timestamps as non-UTC-adjusted MILLIS (which Spark
  * reads as TIMESTAMP_NTZ). Both are normalized here to plain
  * `TimestampType` — an identity on wall-clock values since every session
  * in this repo pins `spark.sql.session.timeZone=UTC` — so all queries see
  * one uniform timestamp type and DuckDB agrees on values.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns stored as TIMESTAMP(NANOS): surfaced as nano-longs by the
    * legacy flag, converted to micros timestamps here. */
  private val nanoCols: Map[String, Set[String]] =
    Map("events" -> Set("ts")).withDefaultValue(Set.empty)

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // a session CONSTANT, not a scope: the flag must stay live for every
    // later lazy scan of the returned frame, so a set/restore scope would
    // silently revert it under the first reader. setSessionConstant keeps
    // the every-conf-write-routes-through-Ops invariant checkable (it
    // refuses to fire while a scope holds the key).
    graft.operators.Ops.setSessionConstant(spark,
      "spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if nanoCols(name).contains(f.name) =>
          acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case _ => acc
      }
    }
  }

  /** Register every table as a temp view named after itself, so that
    * spark.sql(...) queries line up 1:1 with the DuckDB oracle SQL. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
