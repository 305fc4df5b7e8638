package graft.functions

/** A REAL binary image codec — the non-stub instance of the
  * multimodal decode contract (round-10 item 6).
  *
  * The container ships no JPEG/PNG libraries, so every multimodal
  * operator so far ran on documented md5 stand-ins behind a pluggable
  * boundary. Netpbm P6 (binary PPM) needs no library: it is a real,
  * widely-produced image format (ImageMagick/Netpbm default
  * interchange) whose spec is small enough to implement faithfully —
  * which retires the "stub" caveat with an actual header+pixel parser
  * while keeping the container hermetic.
  *
  * Format (Netpbm spec): magic `P6`, then whitespace-separated ASCII
  * `width height maxval`, where any amount of whitespace separates
  * tokens and a `#` starts a comment running to end-of-line; after
  * `maxval` exactly ONE whitespace byte, then `3*width*height` binary
  * RGB samples (maxval ≤ 255 → 1 byte/sample; 2-byte samples for
  * maxval > 255 are rejected as unsupported rather than misparsed).
  *
  * Pure JVM byte-level code, zero Spark imports: the Spark wiring
  * (schema, mapPartitions batching, per-partition codec init) lives in
  * [[graft.operators.Multimodal]]'s per-partition decode stages. */
object Ppm {

  /** Decoded image: dimensions + raw RGB plane (3·w·h bytes). */
  final case class Image(width: Int, height: Int, maxval: Int, rgb: Array[Byte])

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0x0b || b == '\f'

  /** Encode an image as spec-conformant P6 bytes (canonical header). */
  def encodeP6(img: Image): Array[Byte] = {
    require(img.rgb.length == 3 * img.width * img.height,
      s"rgb length ${img.rgb.length} != 3*${img.width}*${img.height}")
    require(img.maxval >= 1 && img.maxval <= 255, s"maxval ${img.maxval}")
    val header = s"P6\n${img.width} ${img.height}\n${img.maxval}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    header ++ img.rgb
  }

  /** Parse P6 bytes. None on ANY malformation (bad magic, missing or
    * non-numeric header token, unsupported maxval, truncated pixel
    * payload) — a corrupt blob in a 100 TB crawl must skip-and-count,
    * never throw a task. */
  def decodeP6(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    // read the next ASCII integer token, skipping whitespace and
    // #-comments (which run to end-of-line), per the Netpbm spec
    def nextInt(): Option[Int] = {
      while (i < bytes.length && (isWs(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else i += 1
      }
      if (i >= bytes.length || bytes(i) < '0' || bytes(i) > '9') return None
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        if (v > Int.MaxValue) return None
        i += 1
      }
      Some(v.toInt)
    }
    // the magic must be FOLLOWED by whitespace or a comment — "P6x"
    // is not a P6 header
    if (i < bytes.length && !isWs(bytes(i)) && bytes(i) != '#') return None
    for {
      w <- nextInt()
      h <- nextInt()
      m <- nextInt()
      if w > 0 && h > 0 && m >= 1 && m <= 255
      // exactly one whitespace byte after maxval, then raster
      if i < bytes.length && isWs(bytes(i))
      start = i + 1
      if bytes.length - start >= 3 * w * h
    } yield Image(w, h, m, java.util.Arrays.copyOfRange(bytes, start, start + 3 * w * h))
  }

  /** Integer luma proxy per pixel: R + G + B (order-preserving for
    * thresholding, no division — both engines reproduce it exactly). */
  def lumas(img: Image): Array[Int] = {
    val n = img.width * img.height
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      out(k) = (img.rgb(3 * k) & 0xff) + (img.rgb(3 * k + 1) & 0xff) +
        (img.rgb(3 * k + 2) & 0xff)
      k += 1
    }
    out
  }

  /** REAL raster resize, stride 2 (round-11 item 4 — q51's codec
    * scaler): keep every second column and every second row (even x,
    * even y), so a w×h image becomes ⌈w/2⌉×⌈h/2⌉ with each surviving
    * pixel's RGB triplet copied verbatim (nearest-neighbor
    * downsample — the base case every real scaler degenerates to at
    * integer strides). */
  def resizeStride2(img: Image): Image = {
    val w2 = (img.width + 1) / 2
    val h2 = (img.height + 1) / 2
    val out = new Array[Byte](3 * w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = 3 * (2 * y * img.width + 2 * x)
        val dst = 3 * (y * w2 + x)
        out(dst) = img.rgb(src)
        out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, img.maxval, out)
  }

  /** A REAL average-hash over the decoded raster: bit k of the 60-bit
    * fingerprint = 1 iff pixel k's luma is strictly above the image
    * mean (compared as n·luma_k > Σ luma — integer, no rounding
    * drift). Locality-PRESERVING, unlike the md5 stand-in: flipping a
    * few pixels flips a few bits, so the q84 band/Hamming plan finds
    * true near-dups with it. Images other than 60 pixels fold their
    * bits onto the 60-bit ring (bit k → k mod 60) so any geometry
    * fingerprints; the gated table uses exactly 10×6. */
  def aHash60(img: Image): Long = {
    val ls = lumas(img)
    val n = ls.length.toLong
    var tot = 0L
    ls.foreach(tot += _)
    var fp = 0L
    var k = 0
    while (k < ls.length) {
      if (ls(k) * n > tot) fp ^= 1L << (k % 60)
      k += 1
    }
    fp
  }
}
