package graft

import org.apache.spark.sql.functions._
import graft.sources.{Layout, ZstdCodec}

/** The zstd text-interchange codec (q154's mechanism): a Hadoop
  * CompressionCodec over zstd-jni. Pins the stream contract directly
  * (roundtrip, finish-vs-close, concatenated frames, RFC 8878 magic)
  * and the Spark integration (FQCN compression option on write,
  * extension dispatch on read). */
class ZstdCodecSpec extends SparkSpec {
  import spark.implicits._

  private val codec = new ZstdCodec

  test("stream roundtrip preserves bytes and emits the frame magic") {
    val payload = (0 until 50000).map(i => s"line $i with some text\n")
      .mkString.getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val out = codec.createOutputStream(bos)
    out.write(payload, 0, payload.length)
    out.close()
    val packed = bos.toByteArray
    assert(packed.length < payload.length / 4,
      s"zstd did not compress repetitive text (${packed.length} of ${payload.length})")
    ZstdCodec.Magic.zipWithIndex.foreach { case (m, i) =>
      assert((packed(i) & 0xff) == m, s"magic byte $i: ${packed(i) & 0xff} != $m")
    }
    val in = codec.createInputStream(new java.io.ByteArrayInputStream(packed))
    val back = in.readAllBytes()
    in.close()
    assert(java.util.Arrays.equals(back, payload), "roundtrip drifted")
  }

  test("finish() ends the frame without closing the sink; concatenated frames read as one stream") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = codec.createOutputStream(bos)
    out.write("first frame ".getBytes("UTF-8"))
    out.finish()          // frame ends, sink stays open
    out.resetState()      // a new frame over the same sink
    out.write("second frame".getBytes("UTF-8"))
    out.close()
    val in = codec.createInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(new String(in.readAllBytes(), "UTF-8") == "first frame second frame")
    in.close()
  }

  test("frame-per-block: the writer rotates frames at the budget; the stream reads back whole") {
    // a small frame budget makes the seekable-ready layout visible:
    // ~64 KiB of text under a 16 KiB budget must land as >= 4 frames
    // (each starting with the RFC 8878 magic), and the continuous
    // reader must consume them as one stream
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.setLong("graft.zstd.frameBytes", 16 * 1024)
    val c = new ZstdCodec
    c.setConf(conf)
    val payload = (0 until 4000).map(i => s"line $i with some text\n")
      .mkString.getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val out = c.createOutputStream(bos)
    out.write(payload, 0, payload.length)
    out.close()
    val packed = bos.toByteArray
    def magicAt(i: Int): Boolean =
      i + 4 <= packed.length && ZstdCodec.Magic.zipWithIndex.forall {
        case (m, j) => (packed(i + j) & 0xff) == m
      }
    val magics = (0 until packed.length).count(magicAt)
    assert(magics >= payload.length / (16 * 1024),
      s"expected >= ${payload.length / (16 * 1024)} frame magics, saw $magics")
    val in = c.createInputStream(new java.io.ByteArrayInputStream(packed))
    assert(java.util.Arrays.equals(in.readAllBytes(), payload),
      "frame-per-block roundtrip drifted")
    in.close()
  }

  test("Spark writes .zst text via the FQCN option and reads it back by extension") {
    val path = Layout.warehousePath(spark, "graft_zstspec_text")
    Layout.deleteWarehouseDir(spark, path)
    val rows = (0L until 5000L).map(i => s"row-$i-é€")
    rows.toDF("value").repartition(3)
      .write.option("compression", classOf[ZstdCodec].getName).text(path)
    val parts = Layout.listWarehouseNames(spark, path).filter(_.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".zst")),
      s"part files not .zst: $parts")
    parts.foreach { f =>
      val magic = Layout.headBytes(spark, s"$path/$f", 4)
      ZstdCodec.Magic.zipWithIndex.foreach { case (m, i) =>
        assert((magic(i) & 0xff) == m, s"$f magic byte $i off")
      }
    }
    val back = spark.read.text(path).as[String].collect().toSet
    assert(back == rows.toSet, "Spark .zst roundtrip drifted")
    Layout.deleteWarehouseDir(spark, path)
  }
}
