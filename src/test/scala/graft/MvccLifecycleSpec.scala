package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Round-13: the UNIFIED MVCC lifecycle and the compaction-trigger
  * policy. Appends ([[Layout.appendSegment]]), tombstone deletes
  * ([[Layout.deleteSegment]]) and compactions ([[Layout.compactDeleted]])
  * share one monotone generation sequence on one stable name, so they
  * compose in any order; the policy ([[Layout.shouldCompact]]) decides
  * WHEN the accrued merge-on-read debt warrants the gated compaction —
  * from mass-marker metadata alone, never a data scan. Also pins the
  * round-12 advice closures: sidecar-derived anti columns across
  * events with DIFFERENT purged-column sets, the integral-key
  * requirement, the post-compaction re-base, and the mass-takedown
  * broadcast boundary. */
class MvccLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def fileState(name: String): Set[(String, Long, Long)] =
    spark.table(name).inputFiles.map { f =>
      val p = new java.io.File(new java.net.URI(f).getPath)
      (p.getPath, p.length(), p.lastModified())
    }.toSet

  test("unified store lifecycle: append → delete → append (re-add LWW) → compact → more events") {
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("cent_id")))
    val base = (0L until 40L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")
    val batch1 = (100L until 120L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")
    val del = Seq(3L, 7L, 105L).toDF("vec_id")
    // batch2 RE-INGESTS key 105 after its takedown (LWW through the
    // generation-scoped tombstone rule) plus fresh keys
    val batch2 = (Seq(105L) ++ (200L until 210L)).map(k => (k, k % 8))
      .toDF("vec_id", "cent_id")

    Layout.appendRewrite(spark, dir, "lifeuni", bkt, batch1)(base) // gens 1, 2
    val name = Layout.tableName(dir, "lifeuniupd")
    def ids(): Set[Long] =
      spark.table(name).select("vec_id").as[Long].collect().toSet
    val afterAppend = ids()
    assert(afterAppend == ((0L until 40L) ++ (100L until 120L)).toSet)

    // delete event: store generation FILES stay byte-identical
    val storePre = fileState(s"${name}store")
    Layout.deleteSegment(spark, dir, "lifeuni", del, Seq("vec_id")) // gen 3
    assert(ids() == afterAppend -- Set(3L, 7L, 105L))
    assert(fileState(s"${name}store") == storePre,
      "delete event touched the store's generation files")

    // append after delete: fresh keys land AND the re-ingested key
    // 105 survives its older tombstone (gen 4 > gen 3)
    Layout.appendSegment(spark, dir, "lifeuni", bkt, batch2) // gen 4
    val expect2 = afterAppend -- Set(3L, 7L) ++ (200L until 210L).toSet
    assert(ids() == expect2, "re-added key did not survive its older tombstone")

    // compaction: same rows, join-free plan, one file per bucket
    val compacted = Layout.compactDeleted(spark, dir, "lifeuniupd", bkt)
    assert(compacted.select("vec_id").as[Long].collect().toSet == expect2)
    val plan = spark.table(name).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"compacted read still joins:\n$plan")
    assert(compacted.inputFiles.length <= Layout.Buckets)

    // the lifecycle CONTINUES over the compacted base: a later delete
    // must not resurrect pre-compaction kills, a later append lands
    Layout.deleteSegment(spark, dir, "lifeuni", Seq(200L).toDF("vec_id"),
      Seq("vec_id"))
    assert(ids() == expect2 - 200L,
      "post-compaction delete wrong (re-base on the compacted table)")
    Layout.appendSegment(spark, dir, "lifeuni", bkt,
      Seq((300L, 4L)).toDF("vec_id", "cent_id"))
    assert(ids() == expect2 - 200L + 300L)
    assert(!ids().contains(3L) && !ids().contains(7L),
      "pre-compaction kills resurrected after compaction")
  }

  test("events with different purged-column sets keep earlier kills (sidecar-derived predicate)") {
    val dir = sfDir
    Layout.materializedTable(spark, dir, "varycolbase",
      Some((Layout.Buckets, Seq("a")))) {
      (0L until 50L).map(i => (i, 1000L + i)).toDF("a", "b")
    }
    val baseName = Layout.tableName(dir, "varycolbase")
    // event 1 purges on column a; event 2 purges on column b ONLY —
    // before the round-12 advice fix, event 2's view was built from
    // its own column set and silently resurrected event 1's kills
    Layout.tombstoneEvent(spark, dir, "varycoldel", baseName, Seq("a", "b"),
      Seq("a" -> Seq(1L, 2L, 3L).toDF("a")), None,
      Some((Layout.Buckets, Seq("a"))))
    Layout.tombstoneEvent(spark, dir, "varycoldel", baseName, Seq("a", "b"),
      Seq("b" -> Seq(1044L, 1045L).toDF("b")), None,
      Some((Layout.Buckets, Seq("a"))))
    val got = spark.table(Layout.tableName(dir, "varycoldel"))
      .select("a").as[Long].collect().toSet
    assert(got == (0L until 50L).toSet -- Set(1L, 2L, 3L, 44L, 45L),
      s"kills lost across column-set change: got $got")
  }

  test("a non-integral delete key fails loudly at publish time") {
    val dir = sfDir
    Layout.materializedTable(spark, dir, "strkeybase", None) {
      (0L until 10L).map(i => (i, s"d$i")).toDF("doc_id", "tag")
    }
    val ex = intercept[IllegalArgumentException] {
      Layout.tombstoneEvent(spark, dir, "strkeydel",
        Layout.tableName(dir, "strkeybase"), Seq("doc_id", "tag"),
        Seq("tag" -> Seq("d3").toDF("tag")), None, None)
    }
    assert(ex.getMessage.contains("non-integral"))
  }

  test("takedown-density delete view anti-joins BROADCAST-sided over the untouched base") {
    // the merge-on-read trade's standing assumption, pinned: under
    // normal takedown density the tombstone relation broadcasts, so
    // reads stream map-side through the base scan — no shuffle, no SMJ
    val dir = sfDir
    Layout.materializedTable(spark, dir, "bpinbase",
      Some((Layout.Buckets, Seq("grp")))) {
      spark.range(2000L).select(col("id").as("doc_id"),
        pmod(col("id"), lit(16)).as("grp"))
    }
    val out = Layout.deleteRewrite(spark, dir, "bpinbase",
      Some((Layout.Buckets, Seq("grp"))),
      spark.range(0, 2000, 37).toDF("doc_id"), Seq("doc_id"))(
      spark.table(Layout.tableName(dir, "bpinbase")))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"delete view's anti join is not broadcast-sided:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"delete view shuffled its anti join:\n$plan")
  }

  test("mass takedown crosses the boundary: materialize instead of tombstone; store guard refuses") {
    val dir = sfDir
    spark.conf.set("spark.graft.massDeleteKeys", "10")
    try {
      Layout.materializedTable(spark, dir, "massbase", None) {
        spark.range(300L).select(col("id").as("doc_id"), (col("id") * 2).as("v"))
      }
      // 150 delete keys > 10: the publish must be the one-shot
      // materializing anti join — no tombstone sidecar, no read-side
      // join, no per-read debt
      val out = Layout.deleteRewrite(spark, dir, "massbase", None,
        spark.range(0, 300, 2).toDF("doc_id"), Seq("doc_id"))(
        spark.table(Layout.tableName(dir, "massbase")))
      assert(out.select("doc_id").as[Long].collect().toSet ==
        (0L until 300L).filter(_ % 2 == 1).toSet)
      assert(!spark.catalog.tableExists(
        s"${Layout.tableName(dir, "massbasedel")}tombs"),
        "mass takedown still tombstoned")
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"mass-delete read still joins:\n$plan")

      // the store lifecycle has the same boundary, as a loud refusal
      // (its recovery is compactDeleted, a caller decision)
      Layout.appendRewrite(spark, dir, "massstore", None,
        (100L until 110L).map(k => (k, k % 4)).toDF("vec_id", "cent_id"))(
        (0L until 50L).map(k => (k, k % 4)).toDF("vec_id", "cent_id"))
      val ex = intercept[IllegalArgumentException] {
        Layout.deleteSegment(spark, dir, "massstore",
          spark.range(0, 50L).toDF("vec_id"), Seq("vec_id"))
      }
      assert(ex.getMessage.contains("mass takedown"))
    } finally spark.conf.unset("spark.graft.massDeleteKeys")
  }

  test("a tombstone event composes after a mass takedown: re-base on the materialized survivors") {
    // the mass path publishes a survivors TABLE under the artifact
    // name; a later (normal-density) tombstone event must treat it as
    // current state — re-base on it, not drop it as stale history —
    // so the two delete shapes compose on one artifact
    val dir = sfDir
    spark.conf.set("spark.graft.massDeleteKeys", "10")
    try {
      Layout.materializedTable(spark, dir, "mixbase", None) {
        spark.range(100L).select(col("id").as("doc_id"), (col("id") * 2).as("v"))
      }
      val baseName = Layout.tableName(dir, "mixbase")
      // mass event: 50 keys > 10 → materializing publish
      Layout.deleteRewrite(spark, dir, "mixbase", None,
        spark.range(0, 100, 2).toDF("doc_id"), Seq("doc_id"))(
        spark.table(baseName))
      val delName = Layout.tableName(dir, "mixbasedel")
      // normal-density event ON the published artifact
      Layout.tombstoneEvent(spark, dir, "mixbasedel", baseName,
        Seq("doc_id", "v"), Seq("doc_id" -> Seq(1L, 3L).toDF("doc_id")),
        None, None)
      val got = spark.table(delName).select("doc_id").as[Long].collect().toSet
      assert(got == (0L until 100L).filter(_ % 2 == 1).toSet -- Set(1L, 3L),
        "tombstone event after a mass takedown lost the survivors or its own kills")
    } finally spark.conf.unset("spark.graft.massDeleteKeys")
  }

  test("post-compaction tombstone lifecycle re-bases on the compacted table with clean sidecars") {
    val dir = sfDir
    Layout.materializedTable(spark, dir, "pcbase",
      Some((Layout.Buckets, Seq("grp")))) {
      spark.range(200L).select(col("id").as("doc_id"),
        pmod(col("id"), lit(16)).as("grp"))
    }
    val baseName = Layout.tableName(dir, "pcbase")
    val delName = Layout.tableName(dir, "pcdel")
    Layout.tombstoneEvent(spark, dir, "pcdel", baseName, Seq("doc_id", "grp"),
      Seq("doc_id" -> Seq(1L, 2L).toDF("doc_id")), None,
      Some((Layout.Buckets, Seq("grp"))))
    Layout.compactDeleted(spark, dir, "pcdel", Some((Layout.Buckets, Seq("grp"))))
    // sidecars cleared at the compaction horizon
    assert(!spark.catalog.tableExists(s"${delName}tombs"))
    val compactedFiles = spark.table(delName).inputFiles.toSet
    // the next event starts a FRESH tombstone lifecycle whose base is
    // the compacted table — earlier kills hold without their tombstones
    Layout.tombstoneEvent(spark, dir, "pcdel", baseName, Seq("doc_id", "grp"),
      Seq("doc_id" -> Seq(5L).toDF("doc_id")), None,
      Some((Layout.Buckets, Seq("grp"))))
    val got = spark.table(delName).select("doc_id").as[Long].collect().toSet
    assert(got == (0L until 200L).toSet -- Set(1L, 2L, 5L),
      "post-compaction event resurrected pre-compaction kills or missed its own")
    assert(spark.table(s"${delName}tombs").count() == 1,
      "sidecar did not restart clean after compaction")
    // and the new view reads THROUGH the compacted table's files, not
    // the original base (the anti-join-free win survives the event,
    // modulo the one fresh tombstone)
    val readFiles = spark.table(delName).inputFiles.toSet
    assert((readFiles -- compactedFiles).forall(_.contains("tombs")),
      "post-compaction view fell back to the pre-compaction base")
  }

  test("property: random append/delete/upsert/evolve/compact interleavings on the store match the reference fold") {
    // seeded-random event sequences against an in-memory reference
    // model (the MvccDeleteSpec discipline, lifted to the UNIFIED
    // store): each step appends fresh rows (sometimes RE-ADDING a
    // previously deleted key — the LWW rule), deletes a random live
    // subset, upserts, EVOLVES the schema (rows carrying a `tag`
    // column the store starts without — later narrow-schema events
    // must keep composing, NULL-padded), or compacts; after every
    // step the stable view must equal the fold. This is the
    // composition argument q131/q137 gate at fixed shapes, proven
    // over arbitrary interleavings.
    val dir = sfDir
    val rnd = new scala.util.Random(31337)
    val bkt = Some((Layout.Buckets, Seq("cent_id")))
    var nextId = 1000L
    def fresh(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ => nextId += 1; (nextId, nextId % 8) }
    val base = fresh(30)
    val batch0 = fresh(10)
    Layout.appendRewrite(spark, dir, "lifeprop", bkt,
      batch0.toDF("vec_id", "cent_id"))(base.toDF("vec_id", "cent_id"))
    val name = Layout.tableName(dir, "lifepropupd")
    var model: Set[(Long, Long, Option[Long])] =
      (base ++ batch0).map { case (id, c) => (id, c, None: Option[Long]) }.toSet
    val deleted = scala.collection.mutable.Set.empty[Long]
    // savepoint arm (rounds 15-16): pins taken at random points must
    // read back EXACTLY the model at pin time regardless of every
    // later event. Since round 16 LIVE pins survive compactions (the
    // retention freeze); only a RELEASED pin is swept by the next
    // compaction, after which its generation must fail loudly, never
    // serve silently-wrong history.
    // (name, model-at-pin, pinned gen, released, swept)
    var pins: List[(String, Set[(Long, Long, Option[Long])], Long,
      Boolean, Boolean)] = Nil
    // stale prop* manifests from a prior run of this spec in the
    // shared warehouse could pin CURRENT generation numbers (the
    // version clock continues over the warehouse) and retain a
    // generation this run expects swept — release them all first
    (1 to 12).foreach(i =>
      Layout.releaseSavepoint(spark, dir, s"prop$i", ifExists = true))
    (1 to 12).foreach { i =>
      rnd.nextInt(5) match {
        case 0 =>
          val readd =
            if (deleted.nonEmpty && rnd.nextBoolean()) {
              val d = deleted.head; deleted -= d; Seq((d, d % 8))
            } else Nil
          val rows = fresh(1 + rnd.nextInt(4)) ++ readd
          Layout.appendSegment(spark, dir, "lifeprop", bkt,
            rows.toDF("vec_id", "cent_id"))
          model ++= rows.map { case (id, c) => (id, c, None) }
        case 1 =>
          val live = model.toSeq.map(_._1)
          val dels = rnd.shuffle(live).take(1 + rnd.nextInt(4))
          if (dels.nonEmpty) {
            Layout.deleteSegment(spark, dir, "lifeprop",
              dels.toDF("vec_id"), Seq("vec_id"))
            model = model.filterNot { case (id, _, _) => dels.contains(id) }
            deleted ++= dels
          }
        case 2 =>
          Layout.compactDeleted(spark, dir, "lifepropupd", bkt)
          // the GC horizon moved: LIVE pins are retained (frozen);
          // released pins' generations are swept by this compaction
          pins = pins.map { case (n, m, g, rel, sw) =>
            (n, m, g, rel, sw || rel)
          }
        case 3 =>
          // upsert: replace some live keys' rows with new payloads,
          // plus one brand-new key (insert-or-replace in one event);
          // the narrow payload reads back NULL in any evolved column
          val live = rnd.shuffle(model.toSeq.map(_._1)).take(1 + rnd.nextInt(3))
          val ins = fresh(1)
          val rows = live.map(id => (id, 100L + rnd.nextInt(8))) ++ ins
          Layout.upsertSegment(spark, dir, "lifeprop", bkt,
            rows.toDF("vec_id", "cent_id"), Seq("vec_id"))
          model = model.filterNot { case (id, _, _) => live.contains(id) } ++
            rows.map { case (id, c) => (id, c, None) }
        case 4 =>
          // schema evolution: fresh rows carrying `tag` (the first
          // such event widens the store; later ones just append)
          val rows = fresh(1 + rnd.nextInt(3))
            .map { case (id, c) => (id, c, id * 7) }
          Layout.evolveSegment(spark, dir, "lifeprop", bkt,
            rows.toDF("vec_id", "cent_id", "tag"))
          model ++= rows.map { case (id, c, t) => (id, c, Some(t)) }
      }
      val tbl = spark.table(name)
      val got: Set[(Long, Long, Option[Long])] =
        if (tbl.columns.contains("tag"))
          tbl.select("vec_id", "cent_id", "tag")
            .as[(Long, Long, Option[Long])].collect().toSet
        else tbl.select("vec_id", "cent_id").as[(Long, Long)].collect()
          .map { case (id, c) => (id, c, None: Option[Long]) }.toSet
      assert(got == model,
        s"step $i diverged: missing=${model -- got} extra=${got -- model}")
      if (rnd.nextInt(3) == 0) {
        // a leftover manifest from a PRIOR test run (shared
        // warehouse) is stale by construction — released first, the
        // per-snapshot discipline (declaring over a LIVE name is loud)
        Layout.releaseSavepoint(spark, dir, s"prop$i", ifExists = true)
        val g = Layout.savepoint(spark, dir, s"prop$i",
          Seq("lifepropupd"))("lifepropupd")
        pins ::= ((s"prop$i", model, g, false, false))
      }
      // release arm: a random live pin ends — the NEXT compaction may
      // sweep its generation; until then storeAsOf still serves it
      if (rnd.nextInt(4) == 0) {
        pins.find(p => !p._4) match {
          case Some((n, m, g, _, sw)) =>
            Layout.releaseSavepoint(spark, dir, n)
            pins = pins.map(p => if (p._1 == n) (n, m, g, true, sw) else p)
          case None => ()
        }
      }
    }
    // every pin reads back its own moment — or, once released AND
    // swept by a later compaction, fails loudly past the horizon
    def rowsAt(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Option[Long])] =
      if (df.columns.contains("tag"))
        df.select("vec_id", "cent_id", "tag")
          .as[(Long, Long, Option[Long])].collect().toSet
      else df.select("vec_id", "cent_id").as[(Long, Long)].collect()
        .map { case (id, c) => (id, c, None: Option[Long]) }.toSet
    assert(pins.nonEmpty, "seed produced no savepoints — re-seed the arm")
    pins.foreach { case (n, m, g, released, swept) =>
      if (!released) {
        val got = rowsAt(Layout.readSavepoint(spark, dir, n, "lifepropupd"))
        assert(got == m, s"savepoint $n drifted (live pins must survive " +
          s"compactions): missing=${m -- got} extra=${got -- m}")
      } else if (!swept) {
        // released but no compaction since: the generation still reads
        val got = rowsAt(Layout.storeAsOf(spark, dir, "lifepropupd", g))
        assert(got == m, s"released-unswept pin $n drifted: " +
          s"missing=${m -- got} extra=${got -- m}")
      } else {
        val e = intercept[IllegalArgumentException] {
          Layout.storeAsOf(spark, dir, "lifepropupd", g).count()
        }
        assert(e.getMessage.contains("retention horizon"),
          s"swept pin $n failed without the loud contract: $e")
      }
    }
    // leave no live pins behind: a later run's compactions in this
    // shared warehouse should not retain this run's moments
    pins.foreach { case (n, _, _, released, _) =>
      if (!released) Layout.releaseSavepoint(spark, dir, n)
    }
  }

  test("restart: the store resumes generations AND the compaction horizon from markers alone") {
    // the round-12 appendSegment restart case extended to the whole
    // unified lifecycle: after delete + compaction, a counter reset
    // (the in-memory state a real SparkContext restart loses) must
    // re-derive BOTH the next generation (from the _gen_ commit log —
    // including generations allocated by delete and compaction
    // events) and the compaction horizon (from the _compact_ marker),
    // so post-restart events extend the compacted state instead of
    // resurrecting pre-compaction history
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("cent_id")))
    val base = (0L until 20L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")
    val batch = (100L until 110L).map(k => (k, k % 8)).toDF("vec_id", "cent_id")
    Layout.appendRewrite(spark, dir, "liferestart", bkt, batch)(base) // gens 1, 2
    Layout.deleteSegment(spark, dir, "liferestart",
      Seq(1L, 2L).toDF("vec_id"), Seq("vec_id"))                      // gen 3
    Layout.compactDeleted(spark, dir, "liferestartupd", bkt)          // gen 4
    val name = Layout.tableName(dir, "liferestartupd")
    def ids(): Set[Long] =
      spark.table(name).select("vec_id").as[Long].collect().toSet
    val before = ids()
    assert(!before.contains(1L) && !before.contains(2L))

    Layout.resetPublishCounters() // simulate the restart

    Layout.appendSegment(spark, dir, "liferestart", bkt,
      Seq((900L, 4L)).toDF("vec_id", "cent_id"))                      // gen 5
    assert(ids() == before + 900L,
      "post-restart append lost the compacted state or pre-compaction kills")
    Layout.deleteSegment(spark, dir, "liferestart",
      Seq(900L).toDF("vec_id"), Seq("vec_id"))                        // gen 6
    assert(ids() == before,
      "post-restart delete resurrected history or missed its key")
    // generations stayed monotone across the reset: the stable view
    // points at __v6, not a recycled number
    val maxV = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(s"${name}__v"))
      .flatMap(n => scala.util.Try(n.stripPrefix(s"${name}__v").toLong).toOption).max
    assert(maxV == 6L, s"generation sequence restarted: max version $maxV")
  }

  test("compaction policy: no-op fresh, fires on tombstone mass, resets after compaction") {
    val dir = sfDir
    Layout.materializedTable(spark, dir, "polbase",
      Some((Layout.Buckets, Seq("grp")))) {
      spark.range(1000L).select(col("id").as("doc_id"),
        pmod(col("id"), lit(16)).as("grp"))
    }
    val baseName = Layout.tableName(dir, "polbase")
    def event(keys: Seq[Long]): Unit =
      Layout.tombstoneEvent(spark, dir, "poldel", baseName, Seq("doc_id", "grp"),
        Seq("doc_id" -> keys.toDF("doc_id")), None,
        Some((Layout.Buckets, Seq("grp"))))
    // fresh artifact: no sidecar mass, no compaction
    assert(!Layout.shouldCompact(spark, dir, "poldel"))
    assert(Layout.maintainDeleted(spark, dir, "poldel",
      Some((Layout.Buckets, Seq("grp")))).isEmpty)
    // 2 tombstones over a 1000-row base: under the 1% knee → no-op
    event(Seq(3L, 4L))
    assert(!Layout.shouldCompact(spark, dir, "poldel"),
      "policy fired below the tombFrac knee")
    // +20 tombstones → 22 > 1% of 1000 → the policy fires
    event((100L until 120L).toSeq)
    assert(Layout.shouldCompact(spark, dir, "poldel"),
      "policy did not fire past the tombFrac knee")
    val compacted = Layout.maintainDeleted(spark, dir, "poldel",
      Some((Layout.Buckets, Seq("grp"))))
    assert(compacted.isDefined)
    assert(compacted.get.select("doc_id").as[Long].collect().toSet ==
      (0L until 1000L).toSet -- Set(3L, 4L) -- (100L until 120L).toSet)
    // debt cleared with the sidecars: the policy restarts at zero
    assert(!Layout.shouldCompact(spark, dir, "poldel"))
    assert(Layout.maintainDeleted(spark, dir, "poldel",
      Some((Layout.Buckets, Seq("grp")))).isEmpty)
  }

  test("re-applying an upsert event is content-idempotent (the correction door's replay contract)") {
    // a foreachBatch lifecycle sink can re-run a committed batch after
    // a crash; the upsert semantics make the replay harmless — the
    // same rows land at a higher generation and shadow themselves, so
    // the view's CONTENT is unchanged (exactly-once in content, the
    // q134 door's argument)
    val dir = sfDir
    val bkt = Some((Layout.Buckets, Seq("cent_id")))
    Layout.appendRewrite(spark, dir, "idemp", bkt,
      (100L until 110L).map(k => (k, k % 8)).toDF("vec_id", "cent_id"))(
      (0L until 20L).map(k => (k, k % 8)).toDF("vec_id", "cent_id"))
    val name = Layout.tableName(dir, "idempupd")
    val batch = Seq((3L, 77L), (104L, 78L), (500L, 79L)).toDF("vec_id", "cent_id")
    Layout.upsertSegment(spark, dir, "idemp", bkt, batch, Seq("vec_id"))
    val once = spark.table(name).select("vec_id", "cent_id")
      .as[(Long, Long)].collect().toSet
    Layout.upsertSegment(spark, dir, "idemp", bkt, batch, Seq("vec_id")) // the replay
    val twice = spark.table(name).select("vec_id", "cent_id")
      .as[(Long, Long)].collect().toSet
    assert(twice == once, "replayed upsert changed the view's content")
    assert(once.contains((3L, 77L)) && once.contains((500L, 79L)))
  }

  test("mass markers record the event's sidecar mass at the event itself") {
    val dir = sfDir
    Layout.materializedTable(spark, dir, "massmarkbase",
      Some((Layout.Buckets, Seq("grp")))) {
      spark.range(400L).select(col("id").as("doc_id"),
        pmod(col("id"), lit(8)).as("grp"))
    }
    Layout.tombstoneEvent(spark, dir, "massmarkdel",
      Layout.tableName(dir, "massmarkbase"), Seq("doc_id", "grp"),
      Seq("doc_id" -> Seq(1L, 2L).toDF("doc_id"),
        "doc_id" -> Seq(5L).toDF("doc_id")),
      Some(Seq((5L, 5L)).toDF("doc_id", "grp")),
      Some((Layout.Buckets, Seq("grp"))))
    val m = Layout.latestMassMarker(spark,
      s"${Layout.tableName(dir, "massmarkdel")}tombs").get
    assert(m("tombRows") == 3, s"marker: $m")
    assert(m("baseRows") == 400, s"marker: $m")
    assert(m("segRows") == 1, s"marker: $m")
    assert(m("segFiles") > 0, s"refill files not counted at the event: $m")
    assert(m("events") == 1, s"marker: $m")
  }

  test("compaction policy: the maxEvents backstop fires on many tiny events") {
    val dir = sfDir
    Layout.materializedTable(spark, dir, "polbase2", None) {
      spark.range(100000L).select(col("id").as("doc_id"))
    }
    val baseName = Layout.tableName(dir, "polbase2")
    spark.conf.set("spark.graft.compact.maxEvents", "2")
    try {
      Layout.tombstoneEvent(spark, dir, "poldel2", baseName, Seq("doc_id"),
        Seq("doc_id" -> Seq(1L).toDF("doc_id")), None, None)
      assert(!Layout.shouldCompact(spark, dir, "poldel2"))
      Layout.tombstoneEvent(spark, dir, "poldel2", baseName, Seq("doc_id"),
        Seq("doc_id" -> Seq(2L).toDF("doc_id")), None, None)
      assert(Layout.shouldCompact(spark, dir, "poldel2"),
        "maxEvents backstop did not fire")
    } finally spark.conf.unset("spark.graft.compact.maxEvents")
  }
}
