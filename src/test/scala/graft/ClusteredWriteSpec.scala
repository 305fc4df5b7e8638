package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.sources.{Layout, ShardManifest, ShardSource}

/** Write-side distribution ownership (round 19 —
  * `RequiresDistributionAndOrdering`): with `option("distribute",
  * "shard")` the CONNECTOR requires clustering by `shard_id`, so a
  * query partitioned any old way still lands exactly ONE file per
  * touched shard per commit — the 100 TB small-files fix; with
  * `"shard_sorted"` rows additionally land doc-sorted so each file's
  * zone map is as tight as the data allows. The default (`"none"`)
  * advertises `Distributions.unspecified()` — the caller's layout,
  * byte-identical to the pre-round-19 writer. */
class ClusteredWriteSpec extends SparkSpec {

  // 13 key-less partitions (co-prime with the 4 shards): every task
  // holds rows of every shard — the worst-case un-clustered input
  private def unclustered(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"t-$i", "en", (i % 5 + 1).toLong,
        i.toLong, (i % 4).toLong))
      .toDF("doc_id", "text", "lang", "n_chars", "u", "shard_id")
      .repartition(13)
  }

  private def fresh(tag: String): String = {
    val p = Layout.warehousePath(spark, Layout.tableName(sfDir, tag))
    Layout.deleteWarehouseDir(spark, p)
    p
  }

  private def partFiles(p: String): Seq[String] = {
    val hconf = spark.sessionState.newHadoopConf()
    ShardManifest.listDataFiles(hconf, p).keys.toSeq
      .filter(_.split("/").last.startsWith("part-"))
  }

  test("distribute=shard: an un-clustered 13-task write lands exactly " +
      "one file per shard; the default pays task x shard") {
    val p1 = fresh("cwdist")
    unclustered(1 to 400).write.format("graft.sources.ShardSource")
      .option("path", p1).option("distribute", "shard")
      .mode("overwrite").save()
    val clustered = partFiles(p1)
    assert(clustered.size == 4,
      s"clustered write must land one file per shard: $clustered")
    assert(clustered.map(_.split("/")(0)).toSet.size == 4)
    // content identical to the input
    val got = spark.read.format("graft.sources.ShardSource")
      .option("path", p1).load()
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(got == (1L to 400L).toSeq)
    // the CONTROL: the same input without the requirement — every task
    // writes into every shard it holds (13 tasks x 4 shards)
    val p2 = fresh("cwfree")
    unclustered(1 to 400).write.format("graft.sources.ShardSource")
      .option("path", p2).mode("overwrite").save()
    val free = partFiles(p2)
    assert(free.size > 4,
      s"the un-clustered control must pay task x shard files: ${free.size}")
  }

  test("distribute=shard_sorted: rows land doc-sorted and the zone " +
      "maps are tight (file bounds == exact per-shard extrema)") {
    val p = fresh("cwsort")
    unclustered(1 to 400).write.format("graft.sources.ShardSource")
      .option("path", p).option("distribute", "shard_sorted")
      .mode("overwrite").save()
    val hconf = spark.sessionState.newHadoopConf()
    val (_, entries) = ShardManifest.readSnapshot(hconf, p).get
    assert(entries.size == 4 && entries.forall(_.files.size == 1))
    // one sorted file per shard: its zone map IS the shard's extrema
    entries.foreach { e =>
      val f = e.files.head
      assert(f.minDoc == e.minDoc && f.maxDoc == e.maxDoc &&
        f.minDoc.isDefined,
        s"zone map drifted on shard ${e.shardId}: $f vs $e")
    }
    // ...and the rows are physically doc-ordered within each file
    // (read back in file order — the reader preserves line order)
    val perShard = spark.read.format("graft.sources.ShardSource")
      .option("path", p).load()
      .select(col("shard_id"), col("doc_id")).collect()
      .groupBy(_.getLong(0)).map { case (sh, rows) =>
        sh -> rows.map(_.getLong(1)).toSeq
      }
    perShard.foreach { case (sh, ids) =>
      assert(ids == ids.sorted, s"shard $sh rows must land doc-sorted")
    }
  }

  test("the requirement composes with the streaming write and an " +
      "unknown mode refuses") {
    import org.apache.spark.sql.streaming.Trigger
    val srcP = fresh("cwssrc")
    val outP = fresh("cwsout")
    val ckpt = fresh("cwsckpt")
    unclustered(1 to 200).write.format("graft.sources.ShardSource")
      .option("path", srcP).option("distribute", "shard")
      .mode("overwrite").save()
    val q = spark.readStream.format("graft.sources.ShardSource")
      .option("path", srcP).load()
      .repartition(13) // degrade the stream's partitioning on purpose
      .writeStream.format("graft.sources.ShardSource")
      .option("path", outP).option("distribute", "shard")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(partFiles(outP).size == 4,
      "the streaming epoch must also land one file per shard")
    assert(spark.read.format("graft.sources.ShardSource")
      .option("path", outP).load().count() == 200L)
    val loud = intercept[Throwable] {
      unclustered(1 to 10).write.format("graft.sources.ShardSource")
        .option("path", fresh("cwbad")).option("distribute", "zorder")
        .mode("overwrite").save()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(loud).exists(_.contains("unknown distribute mode")))
  }
}
