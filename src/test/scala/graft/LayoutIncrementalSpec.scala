package graft

import org.apache.spark.sql.functions._
import graft.sources.{Layout, Tables}

/** Snapshot-to-snapshot layout maintenance (round-6 surface): the
  * incremental lifecycle — base write, new-partition append, late-data
  * dynamic partition overwrite, bucketed append — must reconstruct the
  * one-shot layout exactly AND keep every plan property the full write
  * bought (day pruning, zero-shuffle orderkey joins). */
class LayoutIncrementalSpec extends SparkSpec {

  test("incremental events layout is row-identical to the raw table") {
    val inc = Layout.incrementalEvents(spark, sfDir)
    // full row parity, not just counts: every event id exactly once
    // (nothing lost in the append, nothing doubled by the late-day swap)
    val got = inc.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    val want = Tables.events(spark, sfDir)
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
    // and the day column agrees with the timestamp it was derived from
    val bad = inc.filter(to_date(col("ts")) =!= col("day")).count()
    assert(bad == 0, s"$bad rows landed in the wrong day partition")
  }

  test("the late day and the appended days hold exactly their rows") {
    val inc = Layout.incrementalEvents(spark, sfDir)
    val perDay = inc.groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(perDay == want)
  }

  test("day filters still prune after the incremental lifecycle") {
    val all = Layout.incrementalEvents(spark, sfDir)
    val oneDay = all.filter(col("day") === lit("2024-01-05").cast("date"))
    assert(oneDay.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    oneDay.collect()
    val scanFiles = oneDay.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
    assert(scanFiles < all.inputFiles.length / 10,
      s"expected <1/10th of ${all.inputFiles.length} files, scan read $scanFiles")
  }

  test("orderkey join plans zero ShuffleExchange AFTER the bucketed append") {
    val (li, ord) = Layout.bucketedIncremental(spark, sfDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange (hash|range)partitioning".r.findFirstIn(plan).isEmpty,
        s"append broke the co-located layout:\n$plan")
      val plain = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == plain && n > 0, "append lost or duplicated join rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compaction: one file per bucket, same rows, join zero-shuffle AND sort-free") {
    val (liRaw, ordRaw) = Layout.bucketedIncremental(spark, sfDir)
    val (liName, ordName) = Layout.bucketedIncrementalNames(sfDir)
    val li = Layout.compactBucketed(spark, liName, "l_orderkey")
    val ord = Layout.compactBucketed(spark, ordName, "o_orderkey")
    // each bucket collapsed to a single file...
    assert(li.inputFiles.length == Layout.Buckets,
      s"expected ${Layout.Buckets} files, got ${li.inputFiles.length}")
    assert(ord.inputFiles.length == Layout.Buckets)
    // ...with nothing lost
    assert(li.count() == liRaw.count() && ord.count() == ordRaw.count())
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // harvest switch for the compaction dividend: Spark only emits
      // the sorted-bucket scan ordering behind this conf (SPARK-28595),
      // and only when every bucket is a single file — exactly the
      // invariant compaction establishes
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange (hash|range)partitioning".r.findFirstIn(plan).isEmpty,
        s"compaction broke co-location:\n$plan")
      // the compaction dividend: one file per bucket makes the sortBy
      // metadata usable, so the SMJ plans with NO per-query sorts
      assert("""Sort \[""".r.findFirstIn(plan).isEmpty,
        s"compacted join still sorts per query:\n$plan")
      assert(n == Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("bucketed append grew the table without rewriting the base files") {
    val (li, _) = Layout.bucketedIncremental(spark, sfDir)
    // base + append both present: per-bucket file count must exceed one
    // write's worth (8 buckets, two writes => more than 8 files)
    assert(li.inputFiles.length > Layout.Buckets,
      s"expected base+append files, got ${li.inputFiles.length}")
    val total = li.count()
    assert(total == Tables.lineitem(spark, sfDir).count())
  }
}
