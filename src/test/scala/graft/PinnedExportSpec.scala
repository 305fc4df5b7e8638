package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.Layout

/** q163 — the pinned export: shard delivery off a savepoint stays
  * point-in-time consistent across post-pin ingest and a pin-crossing
  * compaction. */
class PinnedExportSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    Pipeline.pinnedExport(spark, sfDir).collect()

  private def meta(k: Long): Row = out.find(_.getLong(0) == k).get

  test("the exported census equals a raw pinned-moment re-derivation") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val pinned = docs.filter { case (id, _, _, _) =>
      (id % 5 != 0 || id % 10 == 0) && id % 7 != 3 }
    val expect = pinned.groupBy { case (id, _, _, _) =>
      java.lang.Long.parseLong(md5hex(s"exp0:$id").take(8), 16) >> 29
    }.map { case (sh, rows) =>
      sh -> (rows.length.toLong, rows.map(_._4).sum,
        rows.map { case (id, t, l, nc) =>
          java.lang.Long.parseLong(md5hex(s"$id|$nc|$l|${md5hex(t)}")
            .take(8), 16) }.sum)
    }
    val got = out.filter(_.getLong(0) < 99L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
  }

  test("delivery decisions: file-per-shard, zstd magic, isolation") {
    assert(meta(99L).getLong(1) == 1L, "one part file per shard")
    assert(meta(100L).getLong(1) == 1L, "zstd frame magic on every part")
    assert(meta(101L).getLong(1) == 1L,
      "post-pin ingest must be at latest and absent from the export")
  }

  test("the pin survives further maintenance: a re-read is identical") {
    val before = Layout.readSavepoint(spark, sfDir, "q163", "pexpupd")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // more post-pin maintenance on the same store: a batch of
    // genuinely new rows (fresh keys via an id offset)
    val extra = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(10)) === 2)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("late "), col("text")).as("text"), col("lang"),
        col("n_chars"))
    Layout.appendSegment(spark, sfDir, "pexp",
      Some((Layout.Buckets, Seq("doc_id"))), extra)
    val after = Layout.readSavepoint(spark, sfDir, "q163", "pexpupd")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(before.sameElements(after),
      "the pinned read must not move under later events")
  }
}
