package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule mirroring the reference's hand-rolled optimization of
  * batching 1000-id IN-lists ("Much faster than one at a time",
  * delete-removed-tickets.py:114,127): a Filter over a very large
  * literal IN-list is rewritten into a semi join against a
  * LocalRelation of the values. Spark then plans the small relation as
  * a broadcast-hash semi join — O(1) hash probes per row instead of a
  * linear (or even codegen'd switch) scan over the list, and the same
  * shape the reference's chunked SOQL existence checks collapse into.
  *
  * Null semantics are preserved for filtering: `x IN (lits)` is true
  * only on an equal match (null/no-match rows are dropped by Filter
  * either way), which is exactly LeftSemi-on-equality. The rewrite is
  * skipped if any list element is null (the tri-valued edge case).
  */
object InListToSemiJoin extends Rule[LogicalPlan] {
  val MinListSize = 64

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // As written by users: In(attr, literal list). In practice Spark's
    // own OptimizeIn has usually already folded big lists into InSet by
    // the time user-provided rules run, so both shapes are handled.
    case Filter(In(attr: Attribute, list), child)
        if list.size >= MinListSize &&
          list.forall(e => e.isInstanceOf[Literal] &&
            e.asInstanceOf[Literal].value != null) =>
      semiJoin(child, attr, list.map(_.asInstanceOf[Literal].value).distinct)
    case Filter(InSet(attr: Attribute, hset), child)
        if hset.size >= MinListSize && !hset.contains(null) =>
      semiJoin(child, attr, hset.toSeq)
  }

  private def semiJoin(child: LogicalPlan, attr: Attribute,
      values: Seq[Any]): LogicalPlan = {
    val out = AttributeReference(s"__inlist_${attr.name}", attr.dataType,
      nullable = false)()
    val rel = LocalRelation(Seq(out), values.map(InternalRow(_)))
    Join(child, rel, LeftSemi, Some(EqualTo(attr, out)), JoinHint.NONE)
  }
}

/** Deployment entry point: launch with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (a static
  * conf — read when the SparkContext is created) or build with
  * `SparkSession.builder().withExtensions(new GraftExtensions)`; either
  * way every session picks the rules up at session-state construction —
  * the builder form is verified end-to-end in ExtensionsSpec.
  * `spark.experimental.extraOptimizations` remains the right tool for
  * scoping a rule to a single query (ext_inlist_semijoin_rule); this
  * installs it fleet-wide. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => InListToSemiJoin)
}
