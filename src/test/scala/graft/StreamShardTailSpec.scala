package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Layout
import graft.streaming.StreamDoor

/** q170 — the delivery tail door: the training reader consumes the
  * shard-export layout as a stream THROUGH THE CONNECTOR (round 18:
  * MICRO_BATCH_READ — snapshot-scoped file discovery, tombstones
  * applied per batch): base re-delivery, tombstone-filtered delta
  * tail, post-fold re-delivery, all absorbed by the doc-keyed store. */
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
    assert(meta(102L).getLong(1) == 1L,
      "tombstoned rows of the landed-but-undrained delta must never " +
        "reach the sink, even transiently (the store is insert-only)")
  }

  test("the served census equals the raw derivation minus the takedown") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      // the interleaved takedown slice never reaches the store
      .filterNot { case (id, _, _, _) => id % 10 == 3 && id % 3 == 1 }
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
    // doc-keyed store must absorb full re-delivery without a ripple.
    // The replay reads THROUGH the connector (round 18): the snapshot
    // scopes the files (retired pre-fold generations are not layout
    // content) and the tombstones apply, exactly as a re-seeded
    // reader would see it
    val parsed = spark.read.format("graft.sources.ShardSource")
      .option("path", path).load()
      .select(col("doc_id").as("k"), col("lang"),
        col("n_chars"), md5(col("text")).as("tmd5"), col("shard_id"))
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
