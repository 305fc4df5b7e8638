package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** The cross-store savepoint verb (q150's mechanism): a committed
  * metadata manifest pins each member store's generation; reads
  * resolve through storeAsOf, so isolation from later events is the
  * version views' immutability, and the validity window is each
  * member's retention horizon (compaction GCs pinned generations —
  * the read must fail LOUDLY, never silently serve post-GC history). */
class SavepointSpec extends SparkSpec {
  import spark.implicits._

  test("savepoint pins generations; later events never leak into its reads") {
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("k")))
    val base = (0L until 100L).map(k => (k, k * 2)).toDF("k", "v")
    val b1 = (200L until 250L).map(k => (k, k * 2)).toDF("k", "v")
    Layout.appendRewrite(spark, dir, "svp1", bkt, b1)(base)   // gens 1-2
    Layout.appendRewrite(spark, dir, "svp2", bkt,
      (1000L until 1020L).map(k => (k, k)).toDF("k", "v"))(
      (900L until 950L).map(k => (k, k)).toDF("k", "v"))      // gens 1-2
    val sp = Layout.savepoint(spark, dir, "spec1", Seq("svp1upd", "svp2upd"))
    assert(sp.keySet == Set("svp1upd", "svp2upd"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("k", "v").as[(Long, Long)].collect().toSet
    val at1 = rows(Layout.readSavepoint(spark, dir, "spec1", "svp1upd"))
    val at2 = rows(Layout.readSavepoint(spark, dir, "spec1", "svp2upd"))
    assert(at1.size == 150 && at2.size == 70)

    // both stores advance: a delete on one, an append on the other
    Layout.deleteSegment(spark, dir, "svp1",
      (0L until 100L by 10L).toDF("k"), Seq("k"))             // gen 3
    Layout.appendSegment(spark, dir, "svp2", bkt,
      Seq((5000L, 5L)).toDF("k", "v"))                        // gen 3
    // the stable views moved...
    assert(rows(spark.table(Layout.tableName(dir, "svp1upd"))).size == 140)
    assert(rows(spark.table(Layout.tableName(dir, "svp2upd"))).size == 71)
    // ...the savepoint reads did not
    assert(rows(Layout.readSavepoint(spark, dir, "spec1", "svp1upd")) == at1,
      "post-savepoint delete leaked into the pinned read")
    assert(rows(Layout.readSavepoint(spark, dir, "spec1", "svp2upd")) == at2,
      "post-savepoint append leaked into the pinned read")
    // the manifest re-reads stably
    assert(Layout.savepointManifest(spark, dir, "spec1") == sp)
  }

  test("a compaction past the pinned generation fails the read loudly") {
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("k")))
    Layout.appendRewrite(spark, dir, "svp3", bkt,
      (50L until 80L).map(k => (k, k)).toDF("k", "v"))(
      (0L until 50L).map(k => (k, k)).toDF("k", "v"))
    Layout.savepoint(spark, dir, "spec2", Seq("svp3upd"))
    Layout.deleteSegment(spark, dir, "svp3",
      (0L until 10L).toDF("k"), Seq("k"))
    // the GC horizon moves past the pinned generation
    Layout.compactDeleted(spark, dir, "svp3upd", bkt)
    val e = intercept[IllegalArgumentException] {
      Layout.readSavepoint(spark, dir, "spec2", "svp3upd").count()
    }
    assert(e.getMessage.contains("retention horizon"),
      s"post-compaction savepoint read failed without the loud contract: $e")
  }

  test("unknown member and commit-free store fail loudly") {
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("k")))
    Layout.appendRewrite(spark, dir, "svp4", bkt,
      Seq((2L, 2L)).toDF("k", "v"))(Seq((1L, 1L)).toDF("k", "v"))
    Layout.savepoint(spark, dir, "spec3", Seq("svp4upd"))
    val e1 = intercept[IllegalArgumentException] {
      Layout.readSavepoint(spark, dir, "spec3", "nosuchupd")
    }
    assert(e1.getMessage.contains("no member"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.savepoint(spark, dir, "spec4", Seq("neverwrittenupd"))
    }
    assert(e2.getMessage.contains("no committed generations"))
  }
}
