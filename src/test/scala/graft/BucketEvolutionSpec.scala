package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Round-13: BUCKET-COUNT EVOLUTION — a store that has outgrown its
  * bucket count gets REBUCKETED at the natural rewrite point, the
  * compaction ([[Layout.compactDeleted]] already takes the target
  * bucket spec; this spec claims and pins the capability). At 100 TB
  * "bucket count is forever" is a real operational trap: the count
  * chosen at snapshot build caps per-bucket parallelism and file
  * sizes as the artifact grows. Here the fix costs nothing extra —
  * compaction already rewrites the survivors once, so passing a wider
  * spec re-buckets in the same pass. Pinned: content identity across
  * the rebucket, the new spec's one-file-per-bucket layout, the
  * bucket-pruned point read at the new count, and that the post-
  * rebucket lifecycle (events append at the new spec) keeps composing. */
class BucketEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction rebuckets a store; content, layout, pruning and later events hold") {
    val dir = sfDir
    val k1 = Layout.Buckets      // 8 — the snapshot-build count
    val k2 = Layout.Buckets * 2  // 16 — the outgrown store's new count
    val base = (0L until 400L).map(k => (k, k % 64)).toDF("vec_id", "cent_id")
    val batch = (1000L until 1100L).map(k => (k, k % 64)).toDF("vec_id", "cent_id")
    Layout.appendRewrite(spark, dir, "rebkt",
      Some((k1, Seq("cent_id"))), batch)(base)                 // gens 1, 2 at k1
    Layout.deleteSegment(spark, dir, "rebkt",
      (0L until 400L by 50L).toDF("vec_id"), Seq("vec_id"))    // gen 3
    val name = Layout.tableName(dir, "rebktupd")
    val before = spark.table(name).select("vec_id", "cent_id")
      .as[(Long, Long)].collect().toSet

    // the rebucketing compaction: same fold, wider spec
    val compacted = Layout.compactDeleted(spark, dir, "rebktupd",
      Some((k2, Seq("cent_id"))))                              // gen 4 at k2
    assert(compacted.select("vec_id", "cent_id").as[(Long, Long)]
      .collect().toSet == before, "rebucketing changed content")

    // physical layout: one file per NEW bucket (the compactBucketed
    // invariant at the new count)
    assert(compacted.inputFiles.length <= k2)
    assert(compacted.inputFiles.length > k1,
      "rebucket did not spread past the old bucket count")

    // the new spec serves bucket-pruned point reads: a bucket-keyed
    // aggregation over a cent_id literal scans a strict subset of the
    // NEW bucket count (the DeleteLifecycleSpec pin, at k2)
    val pruned = spark.table(name).filter(col("cent_id").isin(7L))
      .groupBy(col("cent_id")).agg(count(lit(1)).as("n"))
    pruned.collect()
    val pplan = pruned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(pplan.contains("Bucketed: true"),
      s"rebucketed read lost the bucket layout:\n$pplan")
    val sel = """SelectedBucketsCount: (\d+) out of (\d+)""".r.findFirstMatchIn(pplan)
    assert(sel.isDefined && sel.get.group(2).toInt == k2 &&
      sel.get.group(1).toInt < k2,
      s"point read not bucket-pruned at the new count:\n$pplan")

    // a bucket-key aggregate over the compacted table plans zero
    // exchange (co-location holds at the new spec)
    val agg = spark.table(name).groupBy("cent_id").agg(count(lit(1)).as("n"))
    agg.collect()
    val aggPlan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"bucketed aggregate re-shuffled after rebucket:\n$aggPlan")

    // the lifecycle continues: later EVENTS still append at the
    // STORE's original spec (the store table keeps k1 — per-event
    // writes never rewrite it; the wider spec lives on the compacted
    // table, and the NEXT compaction re-lands everything at k2), and
    // the view serves the union correctly
    Layout.appendSegment(spark, dir, "rebkt", Some((k1, Seq("cent_id"))),
      Seq((5000L, 7L)).toDF("vec_id", "cent_id"))              // gen 5
    val after = spark.table(name).select("vec_id", "cent_id")
      .as[(Long, Long)].collect().toSet
    assert(after == before + ((5000L, 7L)),
      "post-rebucket append broke")
    val again = Layout.compactDeleted(spark, dir, "rebktupd",
      Some((k2, Seq("cent_id"))))                              // gen 6 at k2
    assert(again.select("vec_id", "cent_id").as[(Long, Long)]
      .collect().toSet == after)
    assert(again.inputFiles.length <= k2 && again.inputFiles.length > k1)
  }
}
