package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import graft.sources.{Layout, ShardManifest, ShardSource}

/** Scan statistics (round 19 — `SupportsReportStatistics`): the
  * connector reports pushdown-scoped size/row estimates from the
  * manifest, so Catalyst's join selection sees a pruned layout read
  * for what it is and BROADCASTS it — without this every DSv2 scan
  * weighs `spark.sql.defaultSizeInBytes` and a one-shard dimension
  * read sort-merges against the fact table. */
class ScanStatsSpec extends SparkSpec {

  private def build(tag: String): String = {
    import spark.implicits._
    val p = Layout.warehousePath(spark, Layout.tableName(sfDir, tag))
    Layout.deleteWarehouseDir(spark, p)
    def gen(r: Range) = r
      .map(i => (i.toLong, s"t-$i", "en", 4L, i.toLong, (i % 4).toLong))
      .toDF("doc_id", "text", "lang", "n_chars", "u", "shard_id")
      .repartition(4, col("shard_id"))
    gen(1 to 80).write.format("graft.sources.ShardSource")
      .option("path", p).mode("overwrite").save()
    gen(81 to 120).write.format("graft.sources.ShardSource")
      .option("path", p).mode("append").save()
    p
  }

  private def src(p: String) = spark.read
    .format("graft.sources.ShardSource").option("path", p).load()

  private def relStats(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.stats
    }.head

  test("the scan reports manifest-exact rows and on-disk bytes, " +
      "scoped by shard pruning") {
    val p = build("ssbase")
    val hconf = spark.sessionState.newHadoopConf()
    val (_, entries) = ShardManifest.readSnapshot(hconf, p).get
    val allBytes = entries.flatMap(_.files)
      .filter(_.name.split("/").last.startsWith("part-")).map(_.len).sum
    val full = relStats(src(p))
    assert(full.rowCount.contains(BigInt(120)),
      s"full-scan rowCount must be the manifest's: ${full.rowCount}")
    assert(full.sizeInBytes == BigInt(allBytes),
      s"sizeInBytes must be the selected files' on-disk bytes")
    // shard pruning scopes the estimate
    val oneShard = relStats(src(p).filter(col("shard_id") === 1L))
    val shard1Bytes = entries.filter(_.shardId == 1L).flatMap(_.files)
      .filter(_.name.split("/").last.startsWith("part-")).map(_.len).sum
    assert(oneShard.rowCount.contains(BigInt(30)) &&
      oneShard.sizeInBytes == BigInt(shard1Bytes),
      "a pruned scan must report only the kept shard")
    // a zone-map skip makes the row count unknown (absent is safe,
    // a fabricated estimate is not) while bytes stay file-scoped
    val skipped = relStats(src(p).filter(col("doc_id") === 100L))
    assert(skipped.rowCount.isEmpty,
      "a zone-skipped scan must not fabricate a row count")
    assert(skipped.sizeInBytes < full.sizeInBytes,
      "the skipped scan's bytes must shrink with the kept files")
  }

  test("join selection BROADCASTS the pruned connector read on its " +
      "own — no hint") {
    import spark.implicits._
    val p = build("ssjoin")
    // AQE off for this arm: its runtime re-plan could convert a
    // sort-merge to a broadcast AFTER the first shuffle materializes,
    // masking whether the STATIC stats carried the decision — the
    // claim under test is that they do (no shuffle ever planned)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val facts = spark.range(1L, 200001L).select(
      (col("id") % 120L + 1L).as("doc_id"),
      (col("id") * 7L).as("v"))
    val pruned = src(p).filter(col("shard_id") === 1L)
      .select(col("doc_id"), col("n_chars"))
    val joined = facts.join(pruned, "doc_id")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val n = joined.collect()(0).getLong(0)
    // shard 1 holds ids ≡ 1 mod 4 → 30 ids, each hit 200000/120 ≈
    // 1666 or 1667 times
    assert(n == facts.join(
      (1L to 120L).filter(_ % 4 == 1).toDF("doc_id"), "doc_id").count())
    assert(graft.operators.Pipeline.countBroadcastJoins(joined) == 1 &&
      graft.operators.Pipeline.countSortMergeJoins(joined) == 0,
      "the small pruned scan must broadcast, not sort-merge")
    // ...and the BUILD side is the connector scan (the reported stats
    // are what made it eligible: the fact side is 200k rows)
    val bhj = graft.operators.Pipeline
      .flattenExecutedPlan(joined.queryExecution.executedPlan).collectFirst {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.get
    val buildChild = bhj.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => bhj.left
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => bhj.right
    }
    assert(graft.operators.Pipeline.flattenExecutedPlan(buildChild).exists {
      case _: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => true
      case _ => false
    }, "the broadcast side must be the connector scan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("degraded layouts stay honest: a manifest-less listing reports " +
      "bytes but no row count") {
    val p = build("ssdeg")
    val (fs, _) = Layout.hfs(spark, p)
    fs.delete(ShardManifest.manifestPath(p), false)
    val st = relStats(src(p))
    assert(st.rowCount.isEmpty,
      "without a manifest there is no row count to report")
    assert(st.sizeInBytes > BigInt(0) &&
      st.sizeInBytes < BigInt(Long.MaxValue) / 2,
      "bytes still come from the live listing, not defaultSizeInBytes")
  }
}
