package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, InterpretedMutableProjection, InterpretedPredicate}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** Driver-local plan plumbing for the recursive-CTE fast path
  * (graft.operators.RecursiveCTE). Lives in the spark.sql namespace to
  * reach `Dataset.ofRows` and Catalyst's `LocalRelation` — the public
  * createDataFrame/collect round-trip would re-convert every row and run
  * physical planning per iteration, which is exactly the overhead the
  * fast path exists to avoid.
  */
object LocalPlans {

  /** The optimized plan's rows IF Catalyst folded it to a literal
    * `LocalRelation` (`ConvertToLocalRelation` evaluates
    * project/filter-over-local-data chains at optimization time). No
    * physical planning, no job, no row conversion — the InternalRows are
    * returned as materialized by the optimizer. `None` when any leaf
    * survived folding (a scan/join/aggregate keeps the plan distributed).
    */
  def foldedRows(df: DataFrame): Option[(Seq[InternalRow], Seq[Attribute])] =
    df.queryExecution.optimizedPlan match {
      case l: LocalRelation => Some((l.data, l.output))
      case _                => None
    }

  /** A DataFrame over driver-held InternalRows — a plain `LocalRelation`
    * leaf, zero conversion.
    */
  def dfFromInternal(
      spark: SparkSession, attrs: Seq[Attribute], rows: Seq[InternalRow]): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], LocalRelation(attrs.map(_.newInstance()), rows))

  /** Compile a recursion step to a pure driver-side row function, when the
    * step's analyzed plan is a deterministic Project/Filter chain over the
    * frontier relation alone. The projections/predicates are bound ONCE;
    * every iteration after that is plain interpreted expression evaluation
    * — no analyzer, no optimizer, no job. Returns the row function plus
    * the step's output attributes (the recursion's steady-state schema).
    * `None` whenever the step involves any other operator (join,
    * aggregate, scan…) — the caller falls back to per-iteration plan
    * folding, and beyond that to distributed batches.
    */
  def compileStep(
      spark: SparkSession,
      attrs: Seq[Attribute],
      step: DataFrame => DataFrame): Option[(Seq[InternalRow] => Seq[InternalRow], Seq[Attribute])] = {
    val leaf = attrs.map(_.newInstance())
    val stepDf = step(Dataset.ofRows(
      spark.asInstanceOf[ClassicSession], LocalRelation(leaf, Nil)))
    val analyzed = stepDf.queryExecution.analyzed

    def walk(p: LogicalPlan): Option[Seq[InternalRow] => Seq[InternalRow]] = p match {
      case l: LocalRelation if l.output.map(_.exprId) == leaf.map(_.exprId) =>
        Some(identity)
      case SubqueryAlias(_, child) => walk(child)
      case Project(list, child) if list.forall(_.deterministic) =>
        walk(child).map { inner =>
          val proj = new InterpretedMutableProjection(list, child.output)
          rows => inner(rows).map(r => proj(r).copy())
        }
      case Filter(cond, child) if cond.deterministic =>
        walk(child).map { inner =>
          val pred = InterpretedPredicate(BindReferences.bindReference(cond, child.output))
          pred.initialize(0)
          rows => inner(rows).filter(pred.eval)
        }
      case _ => None
    }
    // the step must be schema-stable: output rows are fed straight back as
    // the next frontier AND accumulated under the base attributes, so a
    // type-changing step (e.g. int → long widening) would corrupt the
    // rebuilt LocalRelation — such steps take the distributed path, where
    // unionAll coerces properly
    if (analyzed.output.map(_.dataType) != attrs.map(_.dataType)) None
    else walk(analyzed).map(fn => (fn, analyzed.output))
  }

  /** Free the storage blocks behind a `localCheckpoint()`ed DataFrame.
    * The checkpoint materializes into a persisted RDD that only the
    * context cleaner would otherwise release (best-effort, GC-driven);
    * driver loops that retire a checkpoint per round release it
    * deterministically here.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** External (value-equality) rows for driver-side dedup sets. */
  def toExternal(rows: Seq[InternalRow], attrs: Seq[Attribute]): Seq[Row] = {
    val schema = StructType(attrs.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable, a.metadata)))
    val conv = CatalystTypeConverters.createToScalaConverter(schema)
    rows.map(r => conv(r).asInstanceOf[Row])
  }
}
