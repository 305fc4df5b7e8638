package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStreamNoFinalizer, ZstdOutputStreamNoFinalizer}
import org.apache.hadoop.io.compress.{
  CompressionCodec, CompressionInputStream, CompressionOutputStream,
  Compressor, Decompressor}

/** A Hadoop `CompressionCodec` for ZSTANDARD text interchange
  * (`.jsonl.zst` corpora), backed by the zstd-jni library Spark
  * already ships for its internal codecs — Hadoop's own
  * `ZStandardCodec` binds to a NATIVE libhadoop zstd that most
  * deployments (and this container) don't carry, and Spark's
  * text/json sinks only speak Hadoop codecs. Registering this class
  * in `io.compression.codecs` (graft.Sessions does) routes every
  * `.zst` read through it by extension, and passing its class name as
  * the writer's `compression` option produces standard zstd frames
  * any zstd tool (DuckDB included) reads.
  *
  * READ-TASK BUDGET MATH (vs gzip, the q151/q154 layout rule): both
  * gzip and single-frame zstd are NON-SPLITTABLE — one file is one
  * read task, so a corpus written as few huge files serializes the
  * scan no matter how many executors wait. The layout rule is
  * therefore identical for both: write ≈ (cluster cores × waves)
  * files sized well under the per-task memory budget. What zstd
  * changes is the COST PER TASK: decompression runs ~4-7× faster than
  * gzip at an equal-or-better ratio, so the same file layout scans
  * several times faster — and zstd's frame format has a standard
  * SEEKABLE variant (frame-per-block + frame index) that makes
  * splitting a format feature rather than a codec rewrite, the
  * production path to true intra-file parallelism (implementable here
  * as a `SplittableCompressionCodec` over the same zstd-jni streams).
  *
  * The stream pair: zstd-jni's NoFinalizer streams (deterministic
  * close, no GC finalization cost on executor threads). `finish()`
  * ends the zstd frame WITHOUT closing the raw sink (frame-on-flush),
  * matching the Hadoop contract TextOutputFormat relies on; the input
  * side is `continuous`, so concatenated frames — the shape a
  * frame-per-block writer produces — read as one stream.
  * Compressor/Decompressor pooling is stream-internal to zstd-jni, so
  * the codec exposes none (Hadoop's CodecPool null-checks both
  * directions); `createInputStream(in, decompressor)` ignores the
  * pooled argument by contract. */
final class ZstdCodec extends CompressionCodec
    with org.apache.hadoop.conf.Configurable {

  private var conf: org.apache.hadoop.conf.Configuration = _
  override def setConf(c: org.apache.hadoop.conf.Configuration): Unit = conf = c
  override def getConf: org.apache.hadoop.conf.Configuration = conf

  private def frameBytes: Long =
    Option(conf).map(_.getLong("graft.zstd.frameBytes",
      ZstdCodec.DefaultFrameBytes)).getOrElse(ZstdCodec.DefaultFrameBytes)

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdCodec.ZstdOut(out, frameBytes)

  override def createOutputStream(out: OutputStream,
      compressor: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def getCompressorType: Class[_ <: Compressor] = null

  override def createCompressor(): Compressor = null

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdCodec.ZstdIn(in)

  override def createInputStream(in: InputStream,
      decompressor: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def getDecompressorType: Class[_ <: Decompressor] = null

  override def createDecompressor(): Decompressor = null

  override def getDefaultExtension: String = ".zst"
}

object ZstdCodec {
  /** The 4-byte little-endian zstd frame magic (RFC 8878): what the
    * q154 decision row checks ON DISK — a codec that silently no-ops
    * would still roundtrip, so the bytes are gated, not the option. */
  val Magic: Array[Int] = Array(0x28, 0xb5, 0x2f, 0xfd)

  /** Raw bytes per frame before the writer ends it and starts the
    * next (`graft.zstd.frameBytes` overrides): FRAME-PER-BLOCK is the
    * layout the zstd SEEKABLE format standardizes — each frame is an
    * independent decompression point, so a split reader (or the
    * standard seekable-format index, a skippable frame of
    * (compressed, raw) sizes any zstd tool understands) can enter the
    * file mid-stream. Writing the layout costs ~nothing at 4 MiB
    * granularity (zstd's window resets at frame ends; ratio loss is
    * noise for text), and the continuous reader consumes the frames
    * transparently — this is the half of splittability the FORMAT
    * owns; the `SplittableCompressionCodec` reader over these
    * boundaries is the documented production extension. */
  val DefaultFrameBytes: Long = 4L << 20

  private final class ZstdOut(raw: OutputStream, frameBytes: Long)
      extends CompressionOutputStream(raw) {
    private var z = newFrame()
    private var inFrame = 0L

    private def newFrame(): ZstdOutputStreamNoFinalizer = {
      val s = new ZstdOutputStreamNoFinalizer(raw)
      // flush() then ENDS the current frame (still without closing
      // raw) — exactly Hadoop's finish() contract
      s.setCloseFrameOnFlush(true)
      s
    }

    private def rotateIfFull(): Unit =
      if (inFrame >= frameBytes) { z.flush(); z = newFrame(); inFrame = 0L }

    override def write(b: Int): Unit = {
      rotateIfFull(); z.write(b); inFrame += 1
    }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      // honor the frame budget EXACTLY even for single large buffers
      // (a caller streaming one partition-sized array must still get
      // the frame-per-block layout): fill the current frame's
      // remaining budget, rotate, repeat
      var o = off
      var l = len
      while (l > 0) {
        rotateIfFull()
        val take = math.min(l.toLong, frameBytes - inFrame).toInt
        z.write(b, o, take)
        inFrame += take
        o += take
        l -= take
      }
    }
    override def finish(): Unit = z.flush()
    // block-format writers (SequenceFile) reset between records: a
    // fresh frame over the same sink
    override def resetState(): Unit = { z.flush(); z = newFrame(); inFrame = 0L }
    override def close(): Unit = {
      try { finish(); z.close() } finally raw.close()
    }
  }

  private final class ZstdIn(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val z = {
      val s = new ZstdInputStreamNoFinalizer(raw)
      s.setContinuous(true) // concatenated frames read as one stream
      s
    }
    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      z.read(b, off, len)
    override def available(): Int = z.available()
    override def resetState(): Unit = ()
    override def close(): Unit = {
      try z.close() finally raw.close()
    }
  }
}
