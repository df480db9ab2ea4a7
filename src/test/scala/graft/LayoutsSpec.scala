package graft

import java.nio.file.Files

import graft.engine.Layouts

/** Plan-shape assertions for the layout choices standing in for the
  * reference's B-tree indexes (SURVEY §4): partition pruning fires and
  * bucketed joins need no shuffle.
  */
class LayoutsSpec extends SparkSpec {

  test("date-partitioned events prune partitions for a single-day predicate") {
    val out = Files.createTempDirectory("graft-part").toString + "/events_by_date"
    Layouts.writeDatePartitionedEvents(spark, "/root/testdata/sf0.001", out)
    val df = Layouts.readDatePartitionedEvents(spark, out)
      .filter("event_date = date'2024-01-05'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"), s"no partition pruning in:\n$plan")
    // pruned read still returns exactly that day's rows
    val expected = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter("to_date(ts) = date'2024-01-05'").count()
    assert(df.count() === expected && expected > 0)
  }

  test("bucketed orders x lineitem join has no shuffle exchange") {
    // the session is shared across suites — restore the PRIOR values,
    // not hardcoded defaults, or later suites run misconfigured
    val priorBucketing = spark.conf.get("spark.sql.sources.bucketing.enabled")
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      Layouts.writeBucketedOrderTables(spark, "/root/testdata/sf0.001", buckets = 4)
      val df = Layouts.bucketedOrderRevenue(spark)
      val plan = df.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the final agg
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(df.count() ===
        graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "orders")
          .join(graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "lineitem"))
          .where("o_orderkey = l_orderkey")
          .select("o_orderkey").distinct().count())
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.enabled", priorBucketing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}
