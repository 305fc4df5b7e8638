package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Round-12 lead item: takedown WRITE I/O is O(affected). A delete
  * event against a catalog-backed artifact publishes as a TOMBSTONE
  * EVENT ([[Layout.tombstoneEvent]]): the carried rows' FILES are
  * physically untouched — the event writes only the tombstone rows
  * (O(delete set)) and, for refill deletes, the affected keys' new
  * rows (O(affected cone)). This spec asserts the file-set identity
  * the census gates can't see, the LWW-via-generation-scoped-
  * tombstone semantics, multi-event composition with version time
  * travel, and the ad-hoc-base fallback boundary. */
class MvccDeleteSpec extends SparkSpec {
  import spark.implicits._

  /** (path, length, lastModified) of every data file behind a catalog
    * relation — the identity that must survive a delete event. */
  private def fileState(name: String): Set[(String, Long, Long)] =
    spark.table(name).inputFiles.map { f =>
      val p = new java.io.File(new java.net.URI(f).getPath)
      (p.getPath, p.length(), p.lastModified())
    }.toSet

  test("pure-anti tombstone delete: carried files untouched, only tombstone bytes written") {
    val dir = sfDir
    val base = Layout.materializedTable(spark, dir, "mvccdelbase",
      Some((Layout.Buckets, Seq("grp")))) {
      spark.range(500L).select(col("id").as("doc_id"),
        pmod(col("id"), lit(16)).as("grp"))
    }
    val baseName = Layout.tableName(dir, "mvccdelbase")
    val pre = fileState(baseName)
    assert(pre.nonEmpty)

    val out = Layout.deleteRewrite(spark, dir, "mvccdelbase",
      Some((Layout.Buckets, Seq("grp"))),
      spark.range(0, 500, 7).toDF("doc_id"), Seq("doc_id"))(
      spark.table(baseName))

    // result = the anti join, exactly
    val got = out.select("doc_id").as[Long].collect().toSet
    assert(got == (0L until 500L).filterNot(_ % 7 == 0).toSet)
    // the base artifact's files: byte-identical, no file added/removed
    assert(fileState(baseName) == pre,
      "delete event touched the carried rows' files")
    // the delete's own write surface is the tombstone sidecar only —
    // no seg table (pure anti), and tombs is O(delete set)
    val delName = Layout.tableName(dir, "mvccdelbasedel")
    assert(spark.catalog.tableExists(s"${delName}tombs"))
    assert(!spark.catalog.tableExists(s"${delName}seg"))
    assert(spark.table(s"${delName}tombs").count() == (0L until 500L).count(_ % 7 == 0))
    // the published artifact reads THROUGH the base's files (zero copy)
    def paths(fs: Array[String]): Set[String] =
      fs.map(f => new java.io.File(new java.net.URI(f).getPath).getPath).toSet
    assert(paths(out.inputFiles).subsetOf(
      pre.map(_._1) ++ paths(spark.table(s"${delName}tombs").inputFiles)))
  }

  test("refill delete: LWW via generation-scoped tombstones, base files untouched, seg = O(affected)") {
    val dir = sfDir
    // a graph-shaped artifact: several rows per vertex
    val base = Layout.materializedTable(spark, dir, "mvccrefbase",
      Some((Layout.Buckets, Seq("vec_id")))) {
      spark.range(100L).select(col("id").as("vec_id"))
        .crossJoin(spark.range(4L).toDF("j"))
        .select(col("vec_id"), (col("vec_id") * 10 + col("j")).as("nbr"))
    }
    val baseName = Layout.tableName(dir, "mvccrefbase")
    val pre = fileState(baseName)

    val del = Seq(7L).toDF("vec_id")         // deleted vertex
    val affected = Seq(3L, 9L).toDF("vec_id") // vertices to refill
    val refill = Seq((3L, 777L), (9L, 888L), (9L, 999L)).toDF("vec_id", "nbr")
    val out = Layout.refillRewrite(spark, dir, "mvccrefdel",
      Some((Layout.Buckets, Seq("vec_id"))),
      Seq("vec_id" -> del, "nbr" -> del.select(col("vec_id")),
        "vec_id" -> affected), refill)(spark.table(baseName))

    val got = out.select("vec_id", "nbr").as[(Long, Long)].collect().toSet
    val expected =
      (0L until 100L).filter(v => v != 7L && v != 3L && v != 9L)
        .flatMap(v => (0L until 4L).map(j => (v, v * 10 + j))).toSet ++
        Set((3L, 777L), (9L, 888L), (9L, 999L))
    assert(got == expected,
      s"LWW view wrong: missing=${expected -- got} extra=${got -- expected}")
    assert(fileState(baseName) == pre,
      "refill delete touched the carried rows' files")
    val delName = Layout.tableName(dir, "mvccrefdel")
    // seg holds exactly the refilled rows (O(affected) write)
    assert(spark.table(s"${delName}seg").count() == 3)
    // prior-version time travel: __v1 is this event's snapshot
    assert(spark.catalog.tableExists(s"${delName}__v1") ||
      spark.catalog.listTables().collect().exists(_.name.startsWith(s"${delName}__v")))
  }

  test("multi-event tombstone deletes compose; earlier versions stay readable; base still untouched") {
    val dir = sfDir
    val baseName = Layout.tableName(dir, "mvccrefbase") // from the previous test
    val pre = fileState(baseName)
    val delName = Layout.tableName(dir, "mvccrefdel")
    // version numbers CONTINUE over whatever a persisted warehouse
    // holds (the priorMaxVersion contract), so discover the current
    // one instead of assuming __v1
    def maxVersion(): Long = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(s"${delName}__v"))
      .flatMap(n => scala.util.Try(n.stripPrefix(s"${delName}__v").toLong).toOption)
      .max
    val vBefore = maxVersion()
    val v1 = spark.table(delName).select("vec_id", "nbr")
      .as[(Long, Long)].collect().toSet

    // event 2: delete vertex 20, refill vertex 3 AGAIN (its event-1
    // refill rows must be shadowed by the newer generation)
    Layout.tombstoneEvent(spark, dir, "mvccrefdel", baseName,
      Seq("vec_id", "nbr"),
      Seq("vec_id" -> Seq(20L).toDF("vec_id"),
        "nbr" -> Seq(20L).toDF("vec_id"),
        "vec_id" -> Seq(3L).toDF("vec_id")),
      Some(Seq((3L, 333L)).toDF("vec_id", "nbr")),
      Some((Layout.Buckets, Seq("vec_id"))))

    val v2 = spark.table(delName).select("vec_id", "nbr")
      .as[(Long, Long)].collect().toSet
    // vertex 20 vanishes as a VERTEX and as a PAYLOAD (nbr), vertex
    // 3's event-1 refill is shadowed by its event-2 generation
    val expected2 =
      v1.filterNot { case (v, n) => v == 20L || v == 3L || n == 20L } + ((3L, 333L))
    assert(v2 == expected2,
      s"event-2 view wrong: missing=${expected2 -- v2} extra=${v2 -- expected2}")
    // the pre-event-2 version is unchanged (time travel)
    assert(maxVersion() == vBefore + 1, "event 2 did not allocate the next version")
    val stillV1 = spark.table(s"${delName}__v$vBefore").select("vec_id", "nbr")
      .as[(Long, Long)].collect().toSet
    assert(stillV1 == v1, "event 2 mutated the prior version")
    assert(fileState(baseName) == pre,
      "second delete event touched the carried rows' files")
  }

  test("compacting a tombstone-delete artifact: anti-join-free table, bucketing restored, rows identical") {
    val dir = sfDir
    // self-contained artifact + one refill event, then compaction
    Layout.materializedTable(spark, dir, "mvcccompbase",
      Some((Layout.Buckets, Seq("vec_id")))) {
      spark.range(80L).select(col("id").as("vec_id"))
        .crossJoin(spark.range(3L).toDF("j"))
        .select(col("vec_id"), (col("vec_id") * 10 + col("j")).as("nbr"))
    }
    Layout.refillRewrite(spark, dir, "mvcccompdel",
      Some((Layout.Buckets, Seq("vec_id"))),
      Seq("vec_id" -> Seq(5L).toDF("vec_id"),
        "nbr" -> Seq(5L).toDF("vec_id"),
        "vec_id" -> Seq(11L).toDF("vec_id")),
      Seq((11L, 1111L)).toDF("vec_id", "nbr"))(
      spark.table(Layout.tableName(dir, "mvcccompbase")))
    val delName = Layout.tableName(dir, "mvcccompdel")
    val before = spark.table(delName).select("vec_id", "nbr")
      .as[(Long, Long)].collect().toSet
    assert(before.contains((11L, 1111L)) && !before.exists(_._1 == 5L))
    val compacted = Layout.compactDeleted(spark, dir, "mvcccompdel",
      Some((Layout.Buckets, Seq("vec_id"))))
    val after = compacted.select("vec_id", "nbr").as[(Long, Long)].collect().toSet
    assert(after == before, "compaction changed the row set")
    // the stable name now resolves to a BUCKETED table — no anti join,
    // no union; the refill view's lost partitioning is restored
    val prefix = s"${delName}__v"
    val maxV = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption).max
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"$prefix$maxV"))
    assert(meta.tableType.name != "VIEW")
    assert(meta.bucketSpec.exists(b =>
      b.numBuckets == Layout.Buckets && b.bucketColumnNames == Seq("vec_id")))
    // one file per bucket (the compactBucketed invariant)
    val nFiles = compacted.inputFiles.length
    assert(nFiles <= Layout.Buckets, s"$nFiles files after compaction")
    // and the executed plan carries no join at all
    compacted.collect()
    val plan = spark.table(delName).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"compacted read still joins:\n$plan")
  }

  test("the pure-anti view keeps bucketed co-location: a bucket-key self-join plans zero shuffle") {
    // the 100 TB property the merge-on-read trade must NOT give up:
    // Filter + broadcast-anti over the bucketed base scan preserves
    // its output partitioning, so consumers joining on the bucket key
    // (q117's routing-refill shape) still plan with no
    // ShuffleExchange — the delete costs an anti join, never a
    // re-shuffle of the artifact
    // default confs on purpose: the tombstone side MUST broadcast (it
    // is takedown-sized by contract — with broadcasts globally
    // disabled the anti join itself would shuffle, an artifact no
    // deployment has)
    val dir = sfDir
    val v = spark.table(Layout.tableName(dir, "mvccdelbasedel")) // from test 1
    val j = v.as("a").join(v.as("b"), Seq("grp"))
      .groupBy(col("grp")).agg(count(lit(1)).as("n"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"delete view consumer re-shuffled on the bucket key:\n$plan")
    assert(plan.contains("Bucketed: true"), s"bucketed scan lost:\n$plan")
  }

  test("property: random multi-event delete/refill sequences match the reference fold, all versions") {
    // seeded-random event sequences against an in-memory reference
    // model (the DedupCapPropertySpec discipline): each event picks a
    // random delete set and a random refill set with fresh rows; after
    // every event the stable view must equal the reference fold, and
    // at the end every version view must equal its recorded snapshot
    // — the generation-scoped tombstone rule proven over arbitrary
    // event interleavings, not just the gates' fixed shapes
    val dir = sfDir
    val rnd = new scala.util.Random(20121)
    val keys: Seq[Long] = (0L until 60L).toSeq
    val base0 = keys.flatMap(k => (0L until 3L).map(j => (k, k * 100 + j)))
    Layout.materializedTable(spark, dir, "mvccpropbase",
      Some((Layout.Buckets, Seq("k")))) {
      base0.toDF("k", "v")
    }
    val baseName = Layout.tableName(dir, "mvccpropbase")
    val what = "mvccpropdel"
    val delName = Layout.tableName(dir, what)
    var model: Set[(Long, Long)] = base0.toSet
    var nextV = 900L // fresh refill payloads per event
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, Long)])]
    def maxVersion(): Long = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(s"${delName}__v"))
      .flatMap(n => scala.util.Try(n.stripPrefix(s"${delName}__v").toLong).toOption)
      .foldLeft(0L)(math.max)
    (1 to 4).foreach { _ =>
      val dels = rnd.shuffle(keys).take(1 + rnd.nextInt(5)).toSet
      val refills = rnd.shuffle(keys).take(1 + rnd.nextInt(5)).toSet -- dels
      val refillRows = refills.toSeq.flatMap(k =>
        (0 until 1 + rnd.nextInt(3)).map(_ => { nextV += 1; (k, nextV) }))
      // round-13 (round-12 advice): VARY the purged-column set between
      // events — some events additionally tombstone payload VALUES on
      // column v. The sidecar-derived anti predicate must keep those
      // kills through later k-only events (the resurrection hazard the
      // fixed-column property test couldn't see). Same-event refill
      // rows share the tombstones' generation, so they survive them.
      val vDels: Set[Long] =
        if (model.nonEmpty && rnd.nextInt(3) == 0)
          rnd.shuffle(model.toSeq.map(_._2)).take(1 + rnd.nextInt(2)).toSet
        else Set.empty
      val tombs =
        Seq("k" -> dels.toSeq.toDF("k"), "k" -> refills.toSeq.toDF("k")) ++
          (if (vDels.nonEmpty) Seq("v" -> vDels.toSeq.toDF("v")) else Nil)
      Layout.tombstoneEvent(spark, dir, what, baseName, Seq("k", "v"),
        tombs,
        Some(refillRows.toDF("k", "v")),
        Some((Layout.Buckets, Seq("k"))))
      model = model.filterNot { case (k, v) =>
        dels(k) || refills(k) || vDels(v) } ++ refillRows
      val got = spark.table(delName).select("k", "v").as[(Long, Long)].collect().toSet
      assert(got == model,
        s"event diverged: missing=${model -- got} extra=${got -- model}")
      snapshots += ((maxVersion(), model))
    }
    // time travel: every event's version view still serves its snapshot
    snapshots.foreach { case (v, snap) =>
      val got = spark.table(s"${delName}__v$v").select("k", "v")
        .as[(Long, Long)].collect().toSet
      assert(got == snap, s"version $v drifted")
    }
  }

  test("ad-hoc (non-catalog) bases fall back to the materializing publish") {
    val dir = sfDir
    val adhoc = spark.range(50L).select(col("id").as("doc_id"),
      (col("id") * 3).as("v"))
    val out = Layout.deleteRewrite(spark, dir, "mvccadhoc", None,
      spark.range(0, 50, 5).toDF("doc_id"), Seq("doc_id"))(adhoc)
    assert(out.select("doc_id").as[Long].collect().toSet ==
      (0L until 50L).filterNot(_ % 5 == 0).toSet)
    // the fallback materializes — no tombstone sidecar exists
    val delName = Layout.tableName(dir, "mvccadhocdel")
    assert(!spark.catalog.tableExists(s"${delName}tombs"))
  }
}
