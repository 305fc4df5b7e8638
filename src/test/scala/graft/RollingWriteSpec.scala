package graft

import org.apache.spark.sql.functions._
import graft.sources.{Layout, ShardManifest, ShardSource}

/** Bounded file sizes (round 19 — `option("targetFileBytes", n)`):
  * the per-(task, shard) writer rolls to `-rNNN` continuation files
  * at the serialized-text budget, each with its own zone map — a
  * huge shard never lands as one monolithic file, and under a sorted
  * write the rolled files' id ranges are DISJOINT, so file skipping
  * stays exactly as selective as the data allows. */
class RollingWriteSpec extends SparkSpec {

  private def rows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"text-payload-$i-" + ("x" * 40), "en",
        44L, i.toLong, (i % 4).toLong))
      .toDF("doc_id", "text", "lang", "n_chars", "u", "shard_id")
  }

  private def fresh(tag: String): String = {
    val p = Layout.warehousePath(spark, Layout.tableName(sfDir, tag))
    Layout.deleteWarehouseDir(spark, p)
    p
  }

  test("the writer rolls at the budget: several files per shard, " +
      "disjoint ordered zone maps, census exact, point reads open one") {
    val p = fresh("rollshards")
    rows(1 to 400).repartition(13)
      .write.format("graft.sources.ShardSource")
      .option("path", p)
      .option("distribute", "shard_sorted")
      .option("targetFileBytes", "2000")
      .mode("overwrite").save()
    val hconf = spark.sessionState.newHadoopConf()
    val (_, entries) = ShardManifest.readSnapshot(hconf, p).get
    assert(entries.size == 4)
    entries.foreach { e =>
      val parts = e.files.filter(_.name.split("/").last.startsWith("part-"))
        .sortBy(_.name)
      assert(parts.size >= 2,
        s"shard ${e.shardId} must roll at the 2000-byte budget: $parts")
      assert(parts.forall(f => f.minDoc.isDefined && f.maxDoc.isDefined))
      // disjoint AND ordered: name order == write order == id order
      parts.sliding(2).foreach {
        case Seq(a, b) => assert(a.maxDoc.get < b.minDoc.get,
          s"rolled zone maps must be disjoint in name order: $a then $b")
        case _ => ()
      }
    }
    // nothing lost, nothing doubled
    val got = spark.read.format("graft.sources.ShardSource")
      .option("path", p).load()
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(got == (1L to 400L).toSeq)
    // a point read opens exactly ONE of the shard's rolled files
    val f0 = ShardSource.openedFiles.get()
    assert(spark.read.format("graft.sources.ShardSource")
      .option("path", p).load()
      .filter(col("shard_id") === 1L && col("doc_id") === 201L)
      .count() == 1L)
    assert(ShardSource.openedFiles.get() - f0 == 1L,
      "disjoint rolled zone maps must confine a point read to one file")
  }

  test("without the budget nothing changes: one legacy-named file per " +
      "(task, shard), no -r suffixes") {
    val p = fresh("noroll")
    rows(1 to 100).repartition(4, col("shard_id"))
      .write.format("graft.sources.ShardSource")
      .option("path", p).mode("overwrite").save()
    val hconf = spark.sessionState.newHadoopConf()
    val names = ShardManifest.listDataFiles(hconf, p).keySet
    assert(names.size == 4)
    assert(names.forall(n => !n.contains("-r0")),
      s"budget-less writes must keep the standing names: $names")
  }

  test("rolling composes with the streaming write: an epoch's large " +
      "batch lands as several bounded files per shard") {
    import org.apache.spark.sql.streaming.Trigger
    val srcP = fresh("rollssrc")
    val outP = fresh("rollsout")
    val ckpt = fresh("rollsckpt")
    rows(1 to 300).repartition(4, col("shard_id"))
      .write.format("graft.sources.ShardSource")
      .option("path", srcP).mode("overwrite").save()
    val q = spark.readStream.format("graft.sources.ShardSource")
      .option("path", srcP).load()
      .writeStream.format("graft.sources.ShardSource")
      .option("path", outP)
      .option("distribute", "shard_sorted")
      .option("targetFileBytes", "2000")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val hconf = spark.sessionState.newHadoopConf()
    val (_, entries) = ShardManifest.readSnapshot(hconf, outP).get
    assert(entries.forall(_.files.size >= 2),
      "the epoch's files must roll at the budget")
    assert(spark.read.format("graft.sources.ShardSource")
      .option("path", outP).load().count() == 300L)
    assert(ShardManifest.readValidated(hconf, outP).isDefined)
  }
}
