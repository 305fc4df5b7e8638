package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.{Layout, ShardSource}

/** q166 — the DataSourceV2 shard connector: full-read parity with the
  * native JSON reader, shard pruning measured by opened files, column
  * pruning visible in the scan output. */
class ShardConnectorSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    Pipeline.shardConnector(spark, sfDir).collect()

  private lazy val path: String =
    Layout.warehousePath(spark, Layout.tableName(sfDir, "dsvshards"))

  test("connector full read equals the native partitioned-JSON read") {
    out.length // force the gate (writes the export)
    val viaConnector = spark.read.format("graft.sources.ShardSource")
      .option("path", path).load()
      .select("doc_id", "text", "lang", "n_chars", "u", "shard_id")
      .collect().map(_.toSeq).toSet
    val viaJson = spark.read
      .schema("doc_id long, text string, lang string, n_chars long, u long")
      .json(path)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
        col("u"), col("shard_id").cast("long"))
      .collect().map(_.toSeq).toSet
    assert(viaConnector == viaJson)
  }

  test("pushdown decisions hold: shard pruning and column pruning") {
    def meta(k: Long): Row = out.find(_.getLong(0) == k).get
    assert(meta(99L).getLong(1) == 1L,
      "a shard_id IN read must open only the selected shards' files")
    assert(meta(100L).getLong(1) == 1L,
      "an n_chars aggregate's scan must not carry the text column")
  }

  test("an equality filter opens exactly one shard's files") {
    out.length // ensure the export exists
    val shards = Layout.listWarehouseNames(spark, path, dirsOnly = true)
      .filter(_.startsWith("shard_id="))
      .map(_.stripPrefix("shard_id=").toLong).sorted
    val sh = shards.head
    val expFiles = Layout.listWarehouseNames(spark, s"$path/shard_id=$sh")
      .count(_.startsWith("part-"))
    val c0 = ShardSource.openedFiles.get()
    val n = spark.read.format("graft.sources.ShardSource")
      .option("path", path).load()
      .filter(col("shard_id") === sh).count()
    val opened = ShardSource.openedFiles.get() - c0
    assert(opened == expFiles.toLong, s"opened $opened of $expFiles files")
    assert(n > 0)
  }
}
