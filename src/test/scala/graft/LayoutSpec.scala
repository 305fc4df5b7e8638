package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §9 table-layout claims, proven on real written layouts:
  * date-partitioned facts prune partitions at scan time. (The bucketed
  * shuffle-free join twin lives in JoinShapesSpec.) */
class LayoutSpec extends SparkSpec {

  test("date-partitioned events: a day filter prunes to 1/30th of the files") {
    // the layout is written by the PRODUCT writer (graft.sources.Layout),
    // not test-local code — the spec proves the shipped component
    val all = graft.sources.Layout.partitionedEvents(spark, sfDir)
    val oneDay = all.filter(col("day") === lit("2024-01-05").cast("date"))
    // pruning is visible in the plan and in the files actually read:
    // the day predicate becomes a PartitionFilter and the executed
    // scan's numFiles metric counts post-pruning files only
    assert(oneDay.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val nRows = oneDay.collect().length
    val scanFiles = oneDay.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
    val totalFiles = all.inputFiles.length
    assert(scanFiles < totalFiles / 10,
      s"expected <1/10th of $totalFiles files, scan read $scanFiles")
    // and it is purely a layout change — same rows as the unpartitioned scan
    val expected = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === lit("2024-01-05").cast("date")).count()
    assert(nRows == expected && expected > 0)
  }
}
