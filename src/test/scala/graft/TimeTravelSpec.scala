package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Round-13: TIME TRAVEL over the unified MVCC store
  * ([[Layout.storeAsOf]] / [[Layout.readableVersions]]). Every
  * lifecycle commit publishes its snapshot as `<name>__v<gen>` before
  * the stable-name swap, so per-generation reads are a free by-product
  * of the commit protocol; compaction is the retention horizon — older
  * versions' views are GC'd (their sidecars are cleared, so they could
  * no longer reconstruct honest history) and reading one fails LOUDLY.
  * q136 drives the same verb through the driver gate on the q131/q132
  * artifact; this spec pins the per-generation semantics against a
  * reference fold and the failure contract. */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").as[Long].collect().toSet

  test("storeAsOf reads every committed generation; compaction GCs history loudly") {
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("cent_id")))
    val base = (0L until 30L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")
    val batch1 = (100L until 110L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")
    val del = Seq(5L, 103L).toDF("vec_id")
    // batch2 re-ingests key 103 after its takedown (LWW)
    val batch2 = (Seq(103L) ++ (200L until 205L)).map(k => (k, k % 8))
      .toDF("vec_id", "cent_id")

    Layout.appendRewrite(spark, dir, "ttuni", bkt, batch1)(base)      // gens 1, 2
    Layout.deleteSegment(spark, dir, "ttuni", del, Seq("vec_id"))     // gen 3
    Layout.appendSegment(spark, dir, "ttuni", bkt, batch2)            // gen 4

    val baseIds = (0L until 30L).toSet
    val g2 = baseIds ++ (100L until 110L).toSet
    val g3 = g2 -- Set(5L, 103L)
    val g4 = g2 - 5L ++ (200L until 205L).toSet // 103 re-added

    assert(Layout.readableVersions(spark, dir, "ttuniupd") == Seq(1L, 2L, 3L, 4L))
    assert(idsOf(Layout.storeAsOf(spark, dir, "ttuniupd", 1)) == baseIds)
    assert(idsOf(Layout.storeAsOf(spark, dir, "ttuniupd", 2)) == g2)
    assert(idsOf(Layout.storeAsOf(spark, dir, "ttuniupd", 3)) == g3,
      "as-of the delete event must exclude the killed keys")
    assert(idsOf(Layout.storeAsOf(spark, dir, "ttuniupd", 4)) == g4,
      "as-of the re-ingest must carry the LWW re-add")

    // the stable name and the latest as-of view agree
    assert(idsOf(spark.table(Layout.tableName(dir, "ttuniupd"))) == g4)

    // the CDC read: changes(2 -> 4) = the net effect of the delete +
    // re-ingest events. Key 103's row is identical at both ends
    // (deleted at 3, re-added verbatim at 4) so it appears in NEITHER
    // side — snapshot-level CDC, not an event log
    val ch = Layout.storeChanges(spark, dir, "ttuniupd", 2, 4)
    assert(idsOf(ch.filter(col("change") === "insert")) ==
      (200L until 205L).toSet, "CDC inserts wrong")
    assert(idsOf(ch.filter(col("change") === "delete")) == Set(5L),
      "CDC deletes wrong")

    // compaction = retention horizon: gens 1-4 GC'd, 5 readable
    Layout.compactDeleted(spark, dir, "ttuniupd", bkt)                // gen 5
    assert(Layout.readableVersions(spark, dir, "ttuniupd") == Seq(5L))
    assert(idsOf(Layout.storeAsOf(spark, dir, "ttuniupd", 5)) == g4)
    val gcErr = intercept[IllegalArgumentException] {
      Layout.storeAsOf(spark, dir, "ttuniupd", 3)
    }
    assert(gcErr.getMessage.contains("retention horizon") &&
      gcErr.getMessage.contains("readable: 5"),
      s"GC'd read must name the readable range, got: ${gcErr.getMessage}")

    // post-compaction events extend the readable range; history stays
    Layout.deleteSegment(spark, dir, "ttuni", Seq(200L).toDF("vec_id"),
      Seq("vec_id"))                                                  // gen 6
    assert(Layout.readableVersions(spark, dir, "ttuniupd") == Seq(5L, 6L))
    assert(idsOf(Layout.storeAsOf(spark, dir, "ttuniupd", 5)) == g4,
      "a later event must not rewrite the horizon snapshot")
    assert(idsOf(Layout.storeAsOf(spark, dir, "ttuniupd", 6)) == g4 - 200L)
    val ch56 = Layout.storeChanges(spark, dir, "ttuniupd", 5, 6)
    assert(idsOf(ch56.filter(col("change") === "delete")) == Set(200L) &&
      ch56.filter(col("change") === "insert").count() == 0,
      "post-compaction CDC wrong")

    // a never-committed generation fails the same loud way
    val futErr = intercept[IllegalArgumentException] {
      Layout.storeAsOf(spark, dir, "ttuniupd", 7)
    }
    assert(futErr.getMessage.contains("not readable"))
  }
}
