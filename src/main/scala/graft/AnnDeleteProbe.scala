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
    }
    spark.stop()
  }
}
