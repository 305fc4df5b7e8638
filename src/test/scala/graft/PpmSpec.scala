package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Ppm
import graft.operators.Multimodal

/** The REAL codec behind the multimodal contract (round-10 item 6):
  * a genuine Netpbm P6 parser, property-tested the way the stand-ins
  * were contract-tested — plus the proof that the q84 band/Hamming
  * dedup plan finds true near-duplicate IMAGES (not just identical
  * blobs) when fed the real average-hash. Properties sample scalacheck
  * generators under fixed seeds (the `DedupCapPropertySpec`
  * discipline: deterministic, re-runnable failures). */
class PpmSpec extends SparkSpec {

  private val genImage: Gen[Ppm.Image] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    m <- Gen.choose(1, 255)
    rgb <- Gen.containerOfN[Array, Byte](3 * w * h, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield Ppm.Image(w, h, m, rgb)

  private def sample[T](g: Gen[T], i: Int): T =
    g.pureApply(Gen.Parameters.default, Seed(0xBEEFL + i))

  test("encode → decode round-trips every image exactly") {
    (1 to 100).foreach { i =>
      val img = sample(genImage, i)
      val back = Ppm.decodeP6(Ppm.encodeP6(img))
      assert(back.isDefined)
      val b = back.get
      assert(b.width == img.width && b.height == img.height && b.maxval == img.maxval)
      assert(java.util.Arrays.equals(b.rgb, img.rgb))
    }
  }

  test("all spec-valid header dialects parse to the same image") {
    val rgb = Array.tabulate(3 * 10 * 6)(i => ((i * 37) % 251).toByte)
    val px = new String(rgb.map(_.toChar)) // ISO-8859-1-ish raw byte carrier
    def bytes(hdr: String): Array[Byte] =
      hdr.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ rgb
    val dialects = Seq(
      "P6\n10 6\n255\n",            // canonical
      "P6 10 6 255\n",              // single line, space-separated
      "P6\n10  6\t255 ",            // mixed runs of whitespace
      "P6\n# a comment\n10 6\n# another\n255\n", // comments anywhere between tokens
      "P6\r\n10\r6\r255\n")         // CR as whitespace
    val decoded = dialects.map(d => Ppm.decodeP6(bytes(d)))
    decoded.foreach { d =>
      assert(d.isDefined)
      assert(d.get.width == 10 && d.get.height == 6 && d.get.maxval == 255)
      assert(java.util.Arrays.equals(d.get.rgb, rgb))
    }
    assert(px.length == 180) // carrier sanity, keeps scalac from eliding it
  }

  test("malformed blobs are rejected, never misparsed or thrown") {
    val good = Ppm.encodeP6(Ppm.Image(4, 4, 255, new Array[Byte](48)))
    assert(Ppm.decodeP6(Array[Byte]()) == None)
    assert(Ppm.decodeP6("P5\n4 4\n255\n".getBytes ++ new Array[Byte](48)) == None)
    assert(Ppm.decodeP6("P6x4 4 255\n".getBytes ++ new Array[Byte](48)) == None)
    assert(Ppm.decodeP6("P6\n4 4\n999\n".getBytes ++ new Array[Byte](48)) == None)
    assert(Ppm.decodeP6("P6\n4 nope\n255\n".getBytes ++ new Array[Byte](48)) == None)
    assert(Ppm.decodeP6(good.dropRight(1)) == None) // truncated raster
    assert(Ppm.decodeP6(good.take(7)) == None)      // truncated header
    // trailing junk after a complete raster is tolerated (concatenated
    // streams are common in practice); the image itself is unchanged
    val extra = Ppm.decodeP6(good ++ Array[Byte](1, 2, 3))
    assert(extra.isDefined && extra.get.width == 4)
  }

  test("aHash60 is locality-preserving: one pixel flip moves few bits; distinct images differ") {
    (1 to 100).foreach { i =>
      val k = sample(Gen.choose(0, 59), i)
      val rnd = new scala.util.Random(1000L + i)
      val rgb = Array.fill[Byte](180)(rnd.nextInt(256).toByte)
      val img = Ppm.Image(10, 6, 255, rgb)
      val mutated = rgb.clone()
      mutated(3 * k) = (~mutated(3 * k)).toByte // flip one pixel's R hard
      val h1 = Ppm.aHash60(img)
      val h2 = Ppm.aHash60(Ppm.Image(10, 6, 255, mutated))
      // one pixel changes its own bit and can drag the global mean
      // across a few near-threshold pixels — but never many
      assert(java.lang.Long.bitCount(h1 ^ h2) <= 8,
        s"one-pixel flip moved ${java.lang.Long.bitCount(h1 ^ h2)} bits")
    }
  }

  test("the q84 plan over real aHash pairs a planted near-duplicate image") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill[Byte](180)(rnd.nextInt(256).toByte)
    val nearDup = base.clone(); nearDup(0) = (~nearDup(0)).toByte
    val unrelated = Array.fill[Byte](180)(rnd.nextInt(256).toByte)
    val media = Seq(
      1L -> Ppm.encodeP6(Ppm.Image(10, 6, 255, base)),
      2L -> Ppm.encodeP6(Ppm.Image(10, 6, 255, nearDup)),
      3L -> Ppm.encodeP6(Ppm.Image(10, 6, 255, unrelated)),
    ).toDF("media_id", "payload")
    val fp = Multimodal.ppmDecode(media).toDF()
      .filter(col("ok")).select(col("media_id"), col("ahash").as("fp"))
    val pairs = Multimodal.bandedFpPairs(fp, 1000)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      s"near-dup image pair not found (got $pairs)")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated image spuriously paired (got $pairs)")
  }

  test("the gated census decodes every dialect and rejects exactly the planted corrupt subset") {
    val census = Multimodal.ppmDecodeCensus(spark, sfDir).collect()
    val nImgs = census.map(_.getAs[Long]("n_imgs")).sum
    val nBad = census.map(_.getAs[Long]("n_bad")).sum
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(nImgs + nBad == nDocs)
    val expectedBad = graft.sources.Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(97)) === 0).count()
    assert(nBad == expectedBad, s"bad=$nBad expected=$expectedBad")
    // dims came from the parsed headers: every good image is 10×6
    census.foreach { r =>
      assert(r.getAs[Long]("sum_w") == 10 * r.getAs[Long]("n_imgs"))
      assert(r.getAs[Long]("sum_h") == 6 * r.getAs[Long]("n_imgs"))
    }
  }
}
