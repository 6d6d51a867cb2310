package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by capability modules; names trace to
  * SURVEY.md §2 operator ids.
  */
object SparkEntry {
  private def allDefs: Seq[QueryDef] = {
    val ds = CoreQueries.defs ++ InventoryQueries.defs ++ ExtensionQueries.defs ++
      StreamingQueries.defs ++ Case311Queries.defs ++ AnalyticsQueries.defs ++
      SelectionQueries.defs ++ SketchQueries.defs ++ DistillQueries.defs ++
      GraphQueries.defs ++ ValuationQueries.defs
    // toMap would silently keep only the LAST def of a duplicated name —
    // a query (and its oracle) could vanish from the gate without error
    val dups = ds.groupBy(_.name).filter(_._2.sizeIs > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueries(allDefs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryDef.toOracles(allDefs)

  /** Bench repetition policy per query (see QueryDef.Timing). */
  def timings: Map[String, QueryDef.Timing] = QueryDef.toTimings(allDefs)
}
