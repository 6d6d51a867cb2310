package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a named Spark query over a
  * scale-factor directory, plus (when expressible in the DuckDB∩Spark
  * SQL intersection) the ANSI-SQL oracle the driver runs in DuckDB over
  * the same parquet tables. Names trace back to SURVEY.md §2 operator ids.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QueryDef {
  def toQueries(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  def toOracles(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
