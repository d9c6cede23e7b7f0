package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** The reference's `disable_timestamptz_casts` setting
  * (test/sql/timezone/disable_timestamptz_casts.test): when enabled,
  * TIMESTAMP↔TIMESTAMPTZ (and TIMESTAMPTZ→DATE) casts reject — they
  * silently depend on the session zone, and the setting forces users to
  * spell the zone with AT TIME ZONE instead. Duck TIMESTAMP is Spark
  * TIMESTAMP_NTZ, duck TIMESTAMPTZ is Spark TIMESTAMP (instant).
  *
  * Guarded on a runtime conf lookup so the rule is a single map probe
  * per analysis pass when the setting (its near-universal state) is off.
  */
object DisableTzCasts extends Rule[LogicalPlan] {
  private def enabled: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("disable_timestamptz_casts", "false").toBoolean
    catch { case _: Throwable => false }

  private def reject(from: String, to: String): Nothing =
    throw new IllegalArgumentException(
      s"Not implemented Error: Casting from $from to $to without an " +
        "explicit time zone has been disabled - use AT TIME ZONE instead")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.foreachUp(_.expressions.foreach(_.foreach {
      case c: Cast if c.childrenResolved =>
        (c.child.dataType, c.dataType) match {
          case (TimestampNTZType, TimestampType) =>
            reject("TIMESTAMP", "TIMESTAMP WITH TIME ZONE")
          case (TimestampType, TimestampNTZType) =>
            reject("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")
          case (TimestampType, DateType) =>
            reject("TIMESTAMP WITH TIME ZONE", "DATE")
          case _ =>
        }
      case _ =>
    }))
    plan
  }
}
