package graft

import org.apache.spark.sql.Row
import graft.operators.Pipeline
import graft.sources.Layout

/** q159 — the physical shard export: one `.jsonl.zst` per shard of
  * q156's epoch-0 permutation, read back and censused. */
class ShardExportSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    Pipeline.shardExport(spark, sfDir).collect()

  test("the read-back census equals q156's epoch-0 logical census") {
    val logical = Pipeline.epochShuffle(spark, sfDir).collect()
      .filter(r => r.getLong(0) == 0L) // epoch 0 data rows
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val physical = out.filter(_.getLong(0) < 99L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(physical == logical,
      "the exported files must carry exactly the logical shard assignment")
  }

  test("layout decisions: one part file per shard, zstd magic on each") {
    def meta(k: Long): Row = out.find(_.getLong(0) == k).get
    assert(meta(99L).getLong(1) == 1L, "one part file per shard directory")
    assert(meta(100L).getLong(1) == 1L, "RFC 8878 frame magic on every part")
  }

  test("within-file line order is the (u, doc_id) permutation order") {
    // read ONE shard file as raw text: line order in a single file is
    // file order; the u sequence parsed back must be non-decreasing
    val path = Layout.warehousePath(spark,
      Layout.tableName(sfDir, "eposhards"))
    out.filter(_.getLong(0) < 99L).map(_.getLong(0)).foreach { sh =>
      val us = spark.read.json(s"$path/shard_id=$sh")
        .select("u").collect().map(_.getLong(0))
      val sorted = spark.read.textFile(s"$path/shard_id=$sh").collect()
        .map { line =>
          val m = "\"u\":(\\d+)".r.findFirstMatchIn(line)
          m.get.group(1).toLong
        }
      assert(sorted.sameElements(sorted.sorted),
        s"shard $sh lines must stream in u order")
      assert(us.sorted.sameElements(sorted.sorted),
        s"shard $sh json payload and text lines must agree")
    }
  }
}
