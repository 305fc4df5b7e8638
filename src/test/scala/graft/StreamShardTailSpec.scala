package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Layout
import graft.streaming.StreamDoor

/** q170 — the delivery tail door: the training reader consumes the
  * shard-export layout as a stream (base re-delivery, incremental
  * delta tail, post-fold re-delivery), all absorbed by the doc-keyed
  * store. */
class StreamShardTailSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    StreamDoor.streamShardTailDoor(spark, sfDir).collect()

  private def census: Map[Long, (Long, Long, Long)] =
    out.filter(_.getLong(0) < 99L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("door decisions: incremental tail, exact re-delivery, generations") {
    def meta(k: Long): Row = out.find(_.getLong(0) == k).get
    assert(meta(99L).getLong(1) == 1L,
      "the delta drain must deliver exactly the batch (no export re-read)")
    assert(meta(100L).getLong(1) == 1L,
      "base + post-fold drains must deliver exactly the re-exposed rows")
    assert(meta(101L).getLong(1) == 1L, "the run must span >= 3 micro-batches")
  }

  test("the served census equals the raw full-corpus derivation") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expect = docs.groupBy { case (id, _, _, _) =>
      java.lang.Long.parseLong(md5hex(s"tail0:$id").take(8), 16) >> 29
    }.map { case (sh, rows) =>
      sh -> (rows.length.toLong, rows.map(_._4).sum,
        rows.map { case (id, t, l, n) =>
          java.lang.Long.parseLong(md5hex(s"$id|$n|$l|${md5hex(t)}").take(8), 16)
        }.sum)
    }
    assert(census == expect)
  }

  test("replay idempotence: re-delivering EVERY file leaves the census fixed") {
    out.length // the door ran; the store and layout exist
    val path = Layout.warehousePath(spark, Layout.tableName(sfDir, "tailshards"))
    val before = census
    // batch-replay the whole layout as one more upsert event — the
    // doc-keyed store must absorb full re-delivery without a ripple
    val parsed = spark.read.text(s"$path/shard_id=*/part-*")
      .select(col("value"),
        regexp_extract(input_file_name(), "shard_id=(\\d+)", 1)
          .cast(LongType).as("shard_id"))
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType
        .fromDDL("doc_id long, text string, lang string, n_chars long")).as("j"),
        col("shard_id"))
      .select(col("j.doc_id").as("k"), col("j.lang").as("lang"),
        col("j.n_chars").as("n_chars"), md5(col("j.text")).as("tmd5"),
        col("shard_id"))
    StreamDoor.chunkedCountUpsert(spark, sfDir, "taildoor",
      Some((Layout.Buckets, Seq("k"))), parsed)
    val name = Layout.tableName(sfDir, "taildoorupd")
    val after = spark.table(name).groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(graft.functions.Fns.hash32(concat_ws("|", col("k"),
          col("n_chars"), col("lang"), col("tmd5")))).as("checksum"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(after == before, "full re-delivery changed the served census")
  }
}
