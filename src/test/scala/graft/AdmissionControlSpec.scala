package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{Layout, ShardSource}

/** Admission control on the tail stream (round 19 —
  * `option("maxFilesPerTrigger", n)`): tailing a layout after a bulk
  * backfill drains in BOUNDED, checkpointable micro-batches instead
  * of one giant batch — every intermediate offset is durable
  * progress, the file-source throttle at the delivery layer. */
class AdmissionControlSpec extends SparkSpec {

  private def eraRows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"t-$i", "en", 4L, i.toLong, (i % 4).toLong))
      .toDF("doc_id", "text", "lang", "n_chars", "u", "shard_id")
      .repartition(4, col("shard_id"))
  }

  test("maxFilesPerTrigger bounds each micro-batch; the capped drain " +
      "delivers everything exactly once across many batches") {
    val p = Layout.warehousePath(spark, Layout.tableName(sfDir, "acshards"))
    val ckpt = Layout.warehousePath(spark, Layout.tableName(sfDir, "acckpt"))
    Seq(p, ckpt).foreach(Layout.deleteWarehouseDir(spark, _))
    // 4 eras x 4 shards = 16 part files, 25 rows each
    eraRows(1 to 100).write.format("graft.sources.ShardSource")
      .option("path", p).mode("overwrite").save()
    Seq(101 to 200, 201 to 300, 301 to 400).foreach { r =>
      eraRows(r).write.format("graft.sources.ShardSource")
        .option("path", p).mode("append").save()
    }
    val sinkName = "ac_sink"
    val q = spark.readStream.format("graft.sources.ShardSource")
      .option("path", p).option("maxFilesPerTrigger", "3").load()
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // everything, exactly once
    val ids = spark.table(sinkName).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == (1L to 400L).toSeq,
      s"capped drain drifted: ${ids.size} rows")
    // ...across ceil(16/3) = 6 data batches, each at most 3 files =
    // 75 rows (progress is the runtime's own account of each batch)
    val sizes = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(sizes.length >= 6,
      s"the drain must take many bounded batches: $sizes")
    assert(sizes.forall(_ <= 75L),
      s"no batch may exceed maxFilesPerTrigger x rows-per-file: $sizes")
  }

  test("the uncapped default drains in one batch (the standing " +
      "behavior is unchanged)") {
    val p = Layout.warehousePath(spark, Layout.tableName(sfDir, "aushards"))
    val ckpt = Layout.warehousePath(spark, Layout.tableName(sfDir, "auckpt"))
    Seq(p, ckpt).foreach(Layout.deleteWarehouseDir(spark, _))
    eraRows(1 to 100).write.format("graft.sources.ShardSource")
      .option("path", p).mode("overwrite").save()
    eraRows(101 to 200).write.format("graft.sources.ShardSource")
      .option("path", p).mode("append").save()
    val q = spark.readStream.format("graft.sources.ShardSource")
      .option("path", p).load()
      .writeStream.format("memory").queryName("au_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("au_sink").count() == 200L)
    val sizes = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(sizes == Seq(200L),
      s"the uncapped drain must stay a single batch: $sizes")
  }
}
