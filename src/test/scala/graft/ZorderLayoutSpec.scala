package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.sources.{Layout, Tables}

/** Round-8 item 7: the Z-ORDER clustered documents layout
  * ([[Layout.zorderedDocs]]). One written copy must serve BOTH
  * predicate families — ingest ranges (doc_id) and dedup-hash ranges /
  * probe sets (nh) — reading a fraction of the files each time, with
  * results identical to the unclustered scan. */
class ZorderLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
  }

  private lazy val z = Layout.zorderedDocs(spark, sfDir)
  private lazy val raw = Tables.documents(spark, sfDir)
    .withColumn("nh", Fns.hash60(Fns.normText(col("text"))))

  test("z layout is row-identical to the raw docs+hash relation") {
    val a = z.select("doc_id", "source", "nh").as[(Long, String, Long)].collect().toSet
    val b = raw.select("doc_id", "source", "nh").as[(Long, String, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
    assert(z.inputFiles.length >= (1 << (2 * Layout.ZBitsPerDim)),
      "expected one file per z cell at minimum")
  }

  test("hash-range and id-range scans each prune to ~2^bits of the 4^bits cells") {
    val total = z.inputFiles.length
    // hash dimension: nh in the hTop=1 quarter of the 60-bit space
    val lo = 1L << 58
    val hi = 2L << 58
    val hPruned = z.filter(col("zb").isInCollection(Layout.zCellsForHashTop(1)) &&
      col("nh") >= lo && col("nh") < hi)
    assert(hPruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val hFiles = scanFiles(hPruned)
    assert(hFiles <= total / 2, s"hash-range scan read $hFiles of $total files")
    val hWant = raw.filter(col("nh") >= lo && col("nh") < hi)
      .select("doc_id").as[Long].collect().toSet
    assert(hPruned.select("doc_id").as[Long].collect().toSet == hWant && hWant.nonEmpty)

    // id dimension: the second quarter of the id range — the cell set
    // comes from the reader-side contract (idTopOf must agree with the
    // writer's exact integral division on both endpoints)
    val maxId = raw.agg(max(col("doc_id"))).head().getLong(0)
    val idLo = (maxId + 1) / 4
    val idHi = (maxId + 1) / 2
    assert(Layout.idTopOf(idLo, maxId) == 1 && Layout.idTopOf(idHi - 1, maxId) == 1)
    val iPruned = z.filter(col("zb").isInCollection(Layout.zCellsForIdTop(1)) &&
      col("doc_id") >= idLo && col("doc_id") < idHi)
    val iFiles = scanFiles(iPruned)
    assert(iFiles <= total / 2, s"id-range scan read $iFiles of $total files")
    val iWant = raw.filter(col("doc_id") >= idLo && col("doc_id") < idHi)
      .select("doc_id").as[Long].collect().toSet
    assert(iPruned.select("doc_id").as[Long].collect().toSet == iWant && iWant.nonEmpty)
  }

  test("incremental exact-dedup probe (q43's shape) reads a fraction of the corpus files") {
    val total = z.inputFiles.length
    // a small ingest batch whose hashes all live in one hash quarter —
    // its probe set maps to 2^bits of the 4^bits cells
    val batch = raw.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id", "nh").as[(Long, Long)].collect()
      .filter { case (_, nh) => Layout.hashTopOf(nh) == 0 }
      .take(3)
    assert(batch.nonEmpty, "fixture: no batch doc in hash quarter 0")
    val cells = batch.map { case (_, nh) => Layout.hashTopOf(nh) }.distinct
      .flatMap(Layout.zCellsForHashTop).distinct.toSeq
    val batchDf = batch.toSeq.toDF("doc_id", "nh")
    // the probe: corpus-side hashes read ONLY from the batch's cells —
    // sound by construction (a corpus doc with a matching hash shares
    // its hash top bits, hence lives in a probed cell)
    val prunedProbe = z.filter(pmod(col("doc_id"), lit(5)) =!= 0 &&
        col("zb").isInCollection(cells))
      .select(col("nh")).distinct()
    val newDocs = batchDf.join(prunedProbe, Seq("nh"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    // identical to the unpruned full-corpus probe
    val fullProbe = raw.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("nh")).distinct()
    val want = batchDf.join(fullProbe, Seq("nh"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(newDocs == want)
    // and the probe touched only the batch's cells' files
    val probeScan = z.filter(pmod(col("doc_id"), lit(5)) =!= 0 &&
      col("zb").isInCollection(cells))
    val files = scanFiles(probeScan)
    assert(files < total,
      s"probe read all $total files despite the clustered layout")
    assert(files <= total / 2,
      s"probe read $files of $total files; expected <= half for one hash quarter")
  }
}
