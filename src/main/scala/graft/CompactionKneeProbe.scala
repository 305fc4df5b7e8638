package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Empirical READ-COST KNEE of the merge-on-read delete store
  * (round-13 lead item's measurement): the tombstone mechanism makes
  * takedown WRITES O(event), but every read then pays the LSM view —
  * broadcast anti join over the growing tombstone sidecar plus the
  * union of per-event refill segments (one small-file batch each).
  * This probe drives a sequence of delete+refill events against a
  * REAL corpus artifact (the window index over `documents`, h-bucketed)
  * and measures the stable view's read wall at growing event counts,
  * the policy's verdict at each point, and the recovered read after
  * [[Layout.compactDeleted]] — the numbers BASELINE.md's policy
  * defaults (tombFrac, segFilesMax, maxEvents) are calibrated against.
  *
  * Each event kills one doc_id slice (pure delete) and RE-INGESTS
  * another (tombstone + same-generation refill — the graph family's
  * write shape), so both sidecars grow the way a production lifecycle
  * grows them. One JSON line per sf:
  * `sbt "runMain graft.CompactionKneeProbe"`. */
object CompactionKneeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val maxEvents = sys.env.getOrElse("SPARK_GRAFT_KNEE_EVENTS", "16").toInt
    val points = Seq(1, 2, 4, 8, 16).filter(_ <= maxEvents)
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val bkt = Some((Layout.Buckets, Seq("h")))
      val base = Layout.materializedTable(spark, dir, "kneebase", bkt) {
        graft.operators.Dedup.corpusWindowIndex(spark, dir)
          .select(col("doc_id"), col("h"))
      }
      val baseName = Layout.tableName(dir, "kneebase")
      val delName = Layout.tableName(dir, "kneedel")
      val baseRows = base.count()
      val docs = graft.sources.Tables.documents(spark, dir).select(col("doc_id"))
      def slice(r: Int) = docs.filter(pmod(col("doc_id"), lit(50)) === r)
      // the window index covers the STANDING corpus (doc_id ≢ 0 mod 5),
      // so event slices must avoid residues ≡ 0 mod 5 or their kills
      // and refills would silently miss the artifact
      val killRes = (0 to 24).filterNot(_ % 5 == 0).take(points.max)
      val touchRes = (26 to 49).filterNot(_ % 5 == 0).take(points.max)

      def readWall(): Double = {
        // median of 3 counts of the stable view — the consumer's cost
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          spark.table(delName).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(1)
      }

      var fired = 0
      val rows = (1 to points.max).flatMap { i =>
        // event i: kill one residue slice, re-ingest another — slices
        // disjoint across events, so the reference count below is exact
        val kill = slice(killRes(i - 1))
        val touch = slice(touchRes(i - 1))
        val refill = base.join(touch, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("h"))
        Layout.tombstoneEvent(spark, dir, "kneedel", baseName,
          Seq("doc_id", "h"), Seq("doc_id" -> kill, "doc_id" -> touch),
          Some(refill), bkt)
        if (Layout.shouldCompact(spark, dir, "kneedel") && fired == 0) fired = i
        if (!points.contains(i)) None
        else {
          val m = Layout.latestMassMarker(spark, s"${delName}tombs")
            .getOrElse(Map.empty[String, Long])
          Some((i, readWall(), m.getOrElse("tombRows", 0L),
            m.getOrElse("segRows", 0L), m.getOrElse("segFiles", 0L)))
        }
      }
      // correctness anchor: the final view = base minus the killed
      // slices' rows (re-ingested slices carry identical rows)
      val killed = base.join(
        docs.filter(pmod(col("doc_id"), lit(50))
          .isInCollection(killRes.map(_.toLong))),
        Seq("doc_id"), "left_semi").count()
      val finalRows = spark.table(delName).count()
      require(finalRows == baseRows - killed,
        s"$sf: view $finalRows rows != expected ${baseRows - killed}")

      val t0 = System.nanoTime()
      Layout.compactDeleted(spark, dir, "kneedel", bkt)
      val compactSec = (System.nanoTime() - t0) / 1e9
      val compactedRead = readWall()
      require(spark.table(delName).count() == finalRows,
        s"$sf: compaction changed the row set")

      val pts = rows.map { case (i, w, tr, sr, sfl) =>
        s"""{"events":$i,"read_sec":${math.rint(w * 1000) / 1000},""" +
          s""""tomb_rows":$tr,"seg_rows":$sr,"seg_files":$sfl}"""
      }.mkString("[", ",", "]")
      println(s"""{"probe":"compaction_knee","sf":"$sf","base_rows":$baseRows,""" +
        s""""points":$pts,"policy_fired_at_event":$fired,""" +
        s""""compact_sec":${math.rint(compactSec * 1000) / 1000},""" +
        s""""compacted_read_sec":${math.rint(compactedRead * 1000) / 1000}}""")
    }
    spark.stop()
  }
}
