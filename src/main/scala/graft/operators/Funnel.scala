package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered conversion funnel over an event stream (SURVEY §2 F8).
  *
  * A user completes step i when an event of `steps(i)`'s type occurs
  * STRICTLY after that user's earliest completion of step i-1 (ties in
  * the (ts, tieCol) order do not convert — a same-timestamp view+click
  * pair is simultaneous, not sequential).
  *
  * The naive formulation is one groupBy per step chained by joins —
  * `steps.length` shuffles of the event table. This plan is ONE
  * corpus-scale exchange: every step's "earliest qualifying time so
  * far" is a running-min window over the SAME (user, ts, tie)
  * partition/sort, so Spark plans a single Exchange + sort and stacks
  * the dependent WindowExecs on top of it (each step's predicate
  * references the previous step's running min AT THAT ROW, which is
  * exactly the ordered-funnel semantics), followed by a per-user
  * groupBy of `steps.length` scalar columns — which reuses the
  * window's hash partitioning and adds no exchange — and a final
  * single-partition reduce of one row per partition.
  */
object Funnel {

  /** Per-step report: (step 1-based, event_type, users, conv_prev)
    * where conv_prev = users(i)/users(i-1) (null when the previous
    * step converted nobody; 1.0 for the first step). Floats are
    * UNROUNDED — callers on the oracle surface round once at output.
    */
  def orderedFunnel(events: DataFrame, userCol: String, tsCol: String,
                    tieCol: String, typeCol: String,
                    steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val run = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = steps.zipWithIndex.foldLeft(
      events.select(col(userCol), col(tsCol), col(tieCol), col(typeCol))) {
      case (df, (step, i)) =>
        val qualifies =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step && col(s"_t$i") < col(tsCol)
        df.withColumn(s"_t${i + 1}",
          min(when(qualifies, col(tsCol))).over(run))
    }
    val mins = steps.indices.map(i => min(col(s"_t${i + 1}")).as(s"_m${i + 1}"))
    val perUser = staged.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    val counts = steps.indices.map(i => count(col(s"_m${i + 1}")).as(s"_u${i + 1}"))
    val totals = perUser.agg(counts.head, counts.tail: _*)
    totals.select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit((i + 1).toLong).as("step"), lit(step).as("event_type"),
          col(s"_u${i + 1}").as("users"),
          (if (i == 0) lit(1.0)
           else when(col(s"_u$i") === 0, lit(null).cast("double"))
             .otherwise(col(s"_u${i + 1}") / col(s"_u$i"))).as("conv_prev"))
      }: _*)).as("_r"))
      .select(col("_r.step"), col("_r.event_type"), col("_r.users"),
        col("_r.conv_prev"))
  }
}
