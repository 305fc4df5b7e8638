package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Round-13: SCHEMA EVOLUTION on the MVCC generation store
  * ([[Layout.evolveSegment]]). The widening is METADATA-only (ALTER
  * TABLE ADD COLUMNS — no generation file is read or rewritten), old
  * generations read back NULL in columns they predate, version views
  * keep the schema of their own era (time travel returns each
  * generation's schema), and the tombstone lifecycle composes
  * unchanged over the widened store. q137 drives the era census
  * through the driver gate; this spec pins the physical and schema
  * contracts the census cannot see. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def fileState(name: String): Set[(String, Long, Long)] =
    spark.table(name).inputFiles.map { f =>
      val p = new java.io.File(new java.net.URI(f).getPath)
      (p.getPath, p.length(), p.lastModified())
    }.toSet

  test("evolveSegment widens metadata-only; eras read their own schema; deletes compose") {
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("id")))
    val base = (0L until 20L).map(k => (k, k * 10)).toDF("id", "v")
    val batch1 = (100L until 110L).map(k => (k, k * 10)).toDF("id", "v")
    Layout.appendRewrite(spark, dir, "evo", bkt, batch1)(base) // gens 1, 2
    val name = Layout.tableName(dir, "evoupd")
    val store = s"${name}store"

    // evolution event: +tag — the pre-event generation files must be
    // byte-identical afterwards (the ALTER is a catalog write)
    val pre = fileState(store)
    val g3 = (200L until 205L).map(k => (k, k * 10, s"t$k")).toDF("id", "v", "tag")
    Layout.evolveSegment(spark, dir, "evo", bkt, g3)           // gen 3
    val post = fileState(store)
    assert(pre.subsetOf(post),
      "evolution rewrote pre-event generation files (must be metadata-only)")
    assert((post -- pre).nonEmpty, "evolution landed no batch files")

    // old generations read back NULL in the new column; new rows carry it
    val now = spark.table(name)
    assert(now.columns.toSeq == Seq("id", "v", "tag"))
    assert(now.filter(col("id") < 200 && col("tag").isNotNull).count() == 0,
      "pre-evolution rows must read NULL in the added column")
    assert(now.filter(col("tag").isNotNull).count() == 5)

    // a second evolution composes; its batch carries BOTH added columns
    val g4 = (300L until 303L).map(k => (k, k * 10, s"t$k", s"s$k"))
      .toDF("id", "v", "tag", "src")
    Layout.evolveSegment(spark, dir, "evo", bkt, g4)           // gen 4
    assert(spark.table(name).columns.toSeq == Seq("id", "v", "tag", "src"))

    // CDC across a widening: changes(2 -> 4) compares the narrow-era
    // snapshot NULL-padded in the evolved columns (exactly how those
    // rows read back at gen 4) — all drifted rows are inserts, nothing
    // is spuriously deleted by the schema difference
    val ch = Layout.storeChanges(spark, dir, "evoupd", 2, 4)
    assert(ch.columns.toSeq == Seq("id", "v", "tag", "src", "change"))
    assert(ch.filter(col("change") === "delete").count() == 0,
      "schema widening must not fabricate CDC deletes")
    assert(ch.filter(col("change") === "insert").select("id").as[Long]
      .collect().toSet == ((200L until 205L) ++ (300L until 303L)).toSet)

    // time travel returns each era's OWN schema
    assert(Layout.storeAsOf(spark, dir, "evoupd", 2).columns.toSeq == Seq("id", "v"))
    assert(Layout.storeAsOf(spark, dir, "evoupd", 3).columns.toSeq ==
      Seq("id", "v", "tag"))
    assert(Layout.storeAsOf(spark, dir, "evoupd", 4).columns.toSeq ==
      Seq("id", "v", "tag", "src"))

    // the tombstone lifecycle composes over the widened store: kill an
    // old-era and a new-era key in one event
    Layout.deleteSegment(spark, dir, "evo", Seq(5L, 300L).toDF("id"), Seq("id"))
    val ids = spark.table(name).select("id").as[Long].collect().toSet
    assert(!ids.contains(5L) && !ids.contains(300L))
    assert(ids.contains(301L) && ids.contains(0L))

    // and compaction folds the widened schema (NULLs preserved)
    val compacted = Layout.compactDeleted(spark, dir, "evoupd", bkt)
    assert(compacted.columns.toSeq == Seq("id", "v", "tag", "src"))
    assert(compacted.filter(col("id") < 200 && col("tag").isNotNull).count() == 0)
    assert(compacted.filter(col("src").isNotNull).count() == 2) // 301, 302
    val plan = spark.table(name).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"compacted read still joins:\n$plan")

    // evolution composes AFTER compaction: the compacted table
    // predates the newest column and is NULL-padded in the view
    val nCompacted = compacted.count()
    val g5 = Seq((400L, 4000L, "t400", "s400", 7L))
      .toDF("id", "v", "tag", "src", "w")
    Layout.evolveSegment(spark, dir, "evo", bkt, g5)
    val widened = spark.table(name)
    assert(widened.columns.toSeq == Seq("id", "v", "tag", "src", "w"))
    assert(widened.count() == nCompacted + 1)
    assert(widened.filter(col("w").isNotNull).select("id").as[Long]
      .collect().toSeq == Seq(400L))
  }

  test("evolving upsert: widens, replaces by key, and a replayed batch is content-idempotent") {
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("id")))
    val base = (0L until 12L).map(k => (k, k * 10)).toDF("id", "v")
    val b1 = (50L until 55L).map(k => (k, k * 10)).toDF("id", "v")
    Layout.appendRewrite(spark, dir, "evoup", bkt, b1)(base)     // gens 1, 2
    val name = Layout.tableName(dir, "evoupupd")
    // the drifted batch REPLACES live keys 3 and 50 and inserts 900,
    // all carrying the new column — one evolving-upsert event
    val drift = Seq((3L, 333L, "x3"), (50L, 555L, "x50"), (900L, 9L, "x900"))
      .toDF("id", "v", "tag")
    Layout.upsertSegment(spark, dir, "evoup", bkt, drift, Seq("id"),
      evolve = true)                                             // gen 3
    def state(): Set[(Long, Long, Option[String])] =
      spark.table(name).select("id", "v", "tag")
        .as[(Long, Long, Option[String])].collect().toSet
    val after = state()
    assert(after.contains((3L, 333L, Some("x3"))) &&
      after.contains((50L, 555L, Some("x50"))) &&
      after.contains((900L, 9L, Some("x900"))),
      "drifted rows missing or not replaced")
    assert(!after.exists { case (id, v, _) => id == 3L && v == 30L },
      "upsert did not shadow the old row")
    assert(after.contains((0L, 0L, None)), "carried rows lost the NULL era")

    // a REPLAYED batch (the foreachBatch retry) lands at a higher
    // generation but leaves the view's content unchanged
    Layout.upsertSegment(spark, dir, "evoup", bkt, drift, Seq("id"),
      evolve = true)                                             // gen 4
    assert(state() == after, "replayed evolving upsert changed content")

    // RESTART over the widened store: the generation counter resumes
    // from the on-disk markers and a post-restart narrow-schema event
    // keeps composing (the widened schema lives in the catalog, not
    // in any in-memory state)
    Layout.resetPublishCounters()
    Layout.appendSegment(spark, dir, "evoup", bkt,
      Seq((901L, 91L)).toDF("id", "v"))                          // gen 5
    assert(state() == after + ((901L, 91L, None: Option[String])),
      "post-restart narrow append broke on the widened store")
    assert(Layout.readableVersions(spark, dir, "evoupupd").max == 5L,
      "generation sequence did not resume from markers after restart")
  }
}
