package graft

import org.apache.spark.sql.functions._
import graft.sources.{Layout, ShardManifest, ShardSource}

/** Runtime filtering (round 19 — `SupportsRuntimeFiltering`): the
  * scan declares shard_id and doc_id filterable, so a join against a
  * selective dimension plants an IN-subquery fed by the broadcast
  * build side — when it materializes, the key set narrows the shard
  * directories AND (through the zone maps) the files, with zero
  * static predicate on the layout. Dynamic file pruning at the
  * delivery layer. */
class RuntimeFilterSpec extends SparkSpec {

  private def eraRows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"t-$i", "en", 4L, i.toLong, (i % 4).toLong))
      .toDF("doc_id", "text", "lang", "n_chars", "u", "shard_id")
      .repartition(4, col("shard_id"))
  }

  private def build(tag: String): String = {
    val p = Layout.warehousePath(spark, Layout.tableName(sfDir, tag))
    Layout.deleteWarehouseDir(spark, p)
    eraRows(1 to 100).write.format("graft.sources.ShardSource")
      .option("path", p).mode("overwrite").save()
    Seq(101 to 200, 201 to 300, 301 to 400).foreach { r =>
      eraRows(r).write.format("graft.sources.ShardSource")
        .option("path", p).mode("append").save()
    }
    p
  }

  private def src(p: String) = spark.read
    .format("graft.sources.ShardSource").option("path", p).load()

  test("a doc_id join runtime-prunes FILES through the zone maps — " +
      "no static predicate on the layout") {
    import spark.implicits._
    val p = build("rfshards")
    // a selective dimension: three ids, all in era 3 (201..300)
    val dim = spark.range(1L, 1000L)
      .select((col("id") + 200L).as("k"))
      .filter(col("k").isin(205L, 249L, 298L))
    val f0 = ShardSource.openedFiles.get()
    val got = src(p).join(dim, col("doc_id") === col("k"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val opened = ShardSource.openedFiles.get() - f0
    assert(got == Set(205L, 249L, 298L))
    // 16 files total; the three ids live in era-3 files only (one per
    // matching shard: 205%4=1, 249%4=1, 298%4=2 -> 2 era-3 files).
    // Without runtime filtering every file of every shard opens.
    assert(opened < 16L,
      s"runtime filtering must skip files: opened $opened of 16")
  }

  test("a shard_id join runtime-prunes shard directories") {
    import spark.implicits._
    val p = build("rsshards2")
    val dim = spark.range(0L, 100L).select((col("id") % 4L).as("sh"))
      .filter(col("sh") === 2L).distinct()
    val f0 = ShardSource.openedFiles.get()
    val n = src(p).join(dim, col("shard_id") === col("sh")).count()
    val opened = ShardSource.openedFiles.get() - f0
    assert(n == 100L)
    assert(opened < 16L,
      s"runtime shard pruning must skip directories: opened $opened of 16")
  }

  test("runtime narrowing is sound: it composes with a static shard " +
      "filter and never drops a matching row") {
    import spark.implicits._
    val p = build("rcshards")
    val dim = (1L to 400L).filter(_ % 37 == 0).toDF("k")
    val got = src(p).filter(col("shard_id") === 1L)
      .join(dim, col("doc_id") === col("k"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val exp = (1L to 400L).filter(i => i % 37 == 0 && i % 4 == 1).toSet
    assert(got == exp, s"composition drifted: $got vs $exp")
  }
}
