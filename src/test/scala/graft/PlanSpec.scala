package graft

import graft.queries._

/** Plan-shape assertions: the 100 TB guarantees the Scaladoc promises
  * (pushdown, pruning, broadcasts, no accidental cartesian products)
  * hold in the actual executed plans at sf0.001.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1_agg pushes the shipdate filter and prunes columns at the parquet scan") {
    val plan = planOf(RelationalQueries.q1Agg(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"))
    // projection pruning: partkey/suppkey never read
    assert(plan.contains("ReadSchema") && !plan.contains("l_partkey"))
  }

  test("q3_join broadcasts the customer dim; no cartesian product") {
    val plan = planOf(RelationalQueries.q3Join(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("no query plan contains a cartesian product (bounded NLJ broadcasts excepted)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = planOf(fn(spark, dir))
      assert(!plan.contains("CartesianProduct"),
        s"$name has a cartesian product:\n$plan")
    }
  }

  test("ts_clip_window pushes the time range to the parquet scan as raw-nanos bounds") {
    val plan = planOf(TimeSeriesQueries.tsClipWindow(spark, dir))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts") && plan.contains("LessThan(ts"),
      s"time clip not pushed down:\n$plan")
  }

  test("window operators shuffle once on the series key (single Exchange before Window)") {
    val plan = planOf(TimeSeriesQueries.tsRollingCenter(spark, dir))
    assert(plan.contains("Window"))
    // exactly one shuffle: the hashpartitioning on user_id
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
  }

  test("as-of join is union + window: no join node at all") {
    val plan = planOf(TimeSeriesQueries.tsAsofJoin(spark, dir))
    assert(plan.contains("Union"))
    assert(!plan.contains("Join"), s"asof should be join-free:\n$plan")
  }

  test("plain extrema is one partial-aggregating hash agg: no window, one exchange") {
    val plan = planOf(DiurnalQueries.diurnalExtrema(spark, dir))
    // the struct-min/max form must not sort observations in a WindowExec
    assert(!plan.contains("Window"), s"extrema regressed to a window:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"extrema should shuffle once, post-combine:\n$plan")
    // partial aggregation below the exchange (map-side combine)
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"no partial aggregation before the shuffle:\n$plan")
  }

  test("boundary-checked extrema are join-free: one obs pass, two exchanges") {
    val plan = planOf(DiurnalQueries.diurnalBoundary(spark, dir))
    assert(!plan.contains("Join"),
      s"boundary check should evaluate on the pick's own obs row:\n$plan")
    // one Exchange for the ±5-row neighborhood (keys), one for the
    // per-day stats + final aggregation (keys, day)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"boundary check re-shuffles:\n$plan")
  }
}
