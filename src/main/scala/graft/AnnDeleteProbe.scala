package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Empirical scaling probe for the graph-delete REFILL (round-11 lead
  * item's cost claim): a takedown of FIXED absolute size (one vector)
  * against corpora of growing size must touch an affected cone whose
  * size tracks the graph DEGREE (A1 ≈ pool-mates of the deleted
  * vector, A2 adds their in-neighbors — both bounded by degree², not
  * corpus size), while the purge scan is the only corpus-sized term.
  * Reports, per oracle scale: corpus rows, |A1-implied refill rows|,
  * |A2|, the maintained-delete wall and the from-scratch rebuild wall
  * (the cost the refill avoids). One JSON line per sf:
  * `sbt "runMain graft.AnnDeleteProbe"`. */
object AnnDeleteProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      // fixed-size takedown: ONE vector (the smallest qualifying id)
      val del = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id")).orderBy(col("vec_id")).limit(1)
      // warm the once-per-snapshot artifacts (held graph, assignment,
      // quantizer) out of the timed region — they are snapshot-build
      // cost, paid by every lifecycle path alike
      Similarity.nnGraphDeleteMaintainedFor(spark, dir, del)._1.count()
      Similarity.nnGraphRebuiltFor(spark, dir, del).count()
      val t0 = System.nanoTime()
      val (maintained, a2) = Similarity.nnGraphDeleteMaintainedFor(spark, dir, del)
      val mRows = maintained.count()
      val maintainedSec = (System.nanoTime() - t0) / 1e9
      val nA2 = a2.count()
      val nVerts = maintained.select("vec_id").distinct().count()
      val t1 = System.nanoTime()
      val rRows = Similarity.nnGraphRebuiltFor(spark, dir, del).count()
      val rebuildSec = (System.nanoTime() - t1) / 1e9
      require(mRows == rRows, s"$sf: maintained $mRows rows != rebuild $rRows")
      println(s"""{"probe":"ann_delete_cone","sf":"$sf","corpus_vertices":$nVerts,""" +
        s""""a2":$nA2,"a2_frac":${math.rint(1000.0 * nA2 / nVerts) / 1000},""" +
        s""""maintained_sec":${math.rint(maintainedSec * 100) / 100},""" +
        s""""rebuild_sec":${math.rint(rebuildSec * 100) / 100}}""")

      // ---- WRITE-side probe (round-12 lead item): the PUBLISHED
      // tombstone-delete's I/O contract. q123's production-density
      // takedown (1 vector per 997) publishes through
      // Layout.refillRewrite: the event writes ONLY the tombstone
      // rows + the A2 cone's refreshed segment — the held graph's
      // files are untouched (MvccDeleteSpec asserts identity; this
      // row measures the bytes). Across the 10× corpus step the base
      // artifact's bytes grow ~10× while the delete event's bytes
      // track the degree-bounded cone — the takedown write cost a
      // 100 TB deployment actually pays.
      import graft.sources.Layout
      def tableBytes(table: String): Long = {
        if (!spark.catalog.tableExists(table)) return 0L
        val loc = new java.io.File(spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
        Option(loc.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(_.getName.startsWith("part-")).map(_.length).sum
      }
      Similarity.annDeleteSparse(spark, dir).collect()
      val delName = Layout.tableName(dir, "nngraphdelsparse")
      val baseBytes = tableBytes(Layout.tableName(dir, "nngraph"))
      val tombBytes = tableBytes(delName + "tombs")
      val segBytes = tableBytes(delName + "seg")
      println(s"""{"probe":"ann_delete_write","sf":"$sf",""" +
        s""""base_graph_bytes":$baseBytes,"tombstone_bytes":$tombBytes,""" +
        s""""refill_segment_bytes":$segBytes,""" +
        s""""event_bytes_frac_of_base":${
          math.rint(1000.0 * (tombBytes + segBytes) / math.max(1L, baseBytes)) / 1000}}""")
    }
    spark.stop()
  }
}
