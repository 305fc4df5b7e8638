package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The decode plumbing is verified end-to-end: mapPartitions features
  * must equal a pure-SQL recomputation from the md5 hex string (the
  * payload is md5(text) bytes × 4 by construction). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mediaTable schema and payload shape") {
    val m = Multimodal.mediaTable(spark, sfDir).collect()
    assert(m.length == 500)
    assert(m.forall(_.payload.length == 64))
    assert(m.map(_.kind).toSet == Set("image", "audio", "video"))
    assert(m.forall(r => r.width >= 1 && r.width <= 256 &&
      r.height >= 1 && r.height <= 256))
  }

  test("decodeStub features equal the md5-arithmetic recomputation") {
    val feats = Multimodal.decodeStub(Multimodal.mediaTable(spark, sfDir))
      .toDF().as[(Long, String, Int, Long, Int, Long)].collect()
      .map(r => r._1 -> r).toMap

    val expected = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)].collect()
    assert(expected.length == feats.size)
    expected.foreach { case (id, hex) =>
      val bytes = hex.grouped(2).map(Integer.parseInt(_, 16)).toSeq
      val (_, _, nBytes, byteSum, first, frameSum) = feats(id)
      assert(nBytes == 64)
      assert(byteSum == 4L * bytes.sum)
      assert(first == bytes.head)
      assert(frameSum == 4L * (bytes(0) + bytes(8)))
    }
  }
}
