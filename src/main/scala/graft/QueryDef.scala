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
    fn: (SparkSession, String) => DataFrame,
    timing: QueryDef.Timing = QueryDef.Standard)

object QueryDef {
  /** How the bench should repeat this query. The registry grew to ~300
    * queries and the end-of-round bench must fit a fixed driver budget
    * (round 13/14 both overran it, blanking the round's hard signals) —
    * the repetition policy is therefore part of each query's contract,
    * stated where the query is defined. */
  sealed trait Timing
  /** Timed as-is: full reps with the median reported — unless the FIRST
    * rep already exceeds the bench's expensive-query cutoff, in which
    * case that single measurement stands. Multi-second queries are
    * lifecycle drills (index rebuilds, stream drains) whose runtime
    * swamps per-rep machine noise; repeating them re-runs whole builds
    * for a digit the median never changes. */
  case object Standard extends Timing
  /** Build-once/serve-warm: rep 1 may pay a one-time persisted-index
    * build (the tableExists-guarded queries), so the bench must keep
    * running the later reps — the warm serving cost is the query's
    * number — no matter how long rep 1 took. */
  case object WarmServe extends Timing

  /** Applies a WarmServe tag set to a registry — shared by the module
    * post-passes so the tag-and-validate pattern lives once. Unknown
    * names fail loudly (a typo would silently leave a build-once query
    * on the cutoff path, mis-measuring its build as its number). */
  def tagWarmServe(defs: Seq[QueryDef], names: Set[String]): Seq[QueryDef] = {
    val missing = names -- defs.map(_.name).toSet
    require(missing.isEmpty, s"warmServeNames not in registry: $missing")
    defs.map(d => if (names(d.name)) d.copy(timing = WarmServe) else d)
  }

  def toQueries(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  def toOracles(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
  def toTimings(defs: Seq[QueryDef]): Map[String, Timing] =
    defs.map(d => d.name -> d.timing).toMap
}
