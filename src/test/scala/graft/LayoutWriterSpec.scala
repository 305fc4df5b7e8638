package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.{Layout, Tables}

/** The layout PRODUCER (q79 / graft.sources.Layout) — the claims that
  * make it a 100 TB component: the bucketed write is semantics-free
  * (same results as the plain layout) and buys the plan (the re-read
  * orderkey join needs no ShuffleExchange, ever again). */
class LayoutWriterSpec extends SparkSpec {
  import spark.implicits._

  test("q79: the re-read bucketed join plans zero ShuffleExchange") {
    val (li, ord) = Layout.bucketedLineitemOrders(spark, sfDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ — at real scale neither fact side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      // collect() on THIS DataFrame so its queryExecution carries the
      // executed final plan
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange (hash|range)partitioning".r.findFirstIn(plan).isEmpty,
        s"bucketed layout still shuffles:\n$plan")
      val plain = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == plain && n > 0, "layout changed the join result")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q79 result == the identical aggregate over the plain layout") {
    val got = Relational.bucketedLayout(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(graft.functions.Fns.revenue(col("l_extendedprice"), col("l_discount")))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == plain && got.nonEmpty)
  }

  test("the writer is idempotent per (session, dir): second call re-reads, not re-writes") {
    val (li1, _) = Layout.bucketedLineitemOrders(spark, sfDir)
    val before = li1.inputFiles.toSet
    val (li2, _) = Layout.bucketedLineitemOrders(spark, sfDir)
    assert(li2.inputFiles.toSet == before, "second call must not rewrite the table")
  }
}
