package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Y4m

/** The YUV4MPEG2 codec contract (the Ppm/Wav discipline applied to
  * video): spec-conformant parse across colourspace dialects,
  * corrupt-reject on every malformation class, and a cross-frame
  * locality-preserving fingerprint the q84/q153 band/Hamming plan
  * finds true near-dup clips with. Properties sample scalacheck
  * generators under fixed seeds (deterministic failures). */
class Y4mSpec extends SparkSpec {

  private def bytes(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed * 97) % 256).toByte)

  private def clip(cs: String, w: Int, h: Int, nFrames: Int,
      seed: Int): Y4m.Clip = {
    val (ySz, uvSz) = cs match {
      case "444" => (w * h, w * h)
      case "mono" => (w * h, 0)
      case _ => (w * h, (w / 2) * (h / 2))
    }
    Y4m.Clip(w, h, cs, Vector.tabulate(nFrames)(f =>
      Y4m.Frame(bytes(ySz, seed + f), bytes(uvSz, seed + f + 1000),
        bytes(uvSz, seed + f + 2000))))
  }

  private val genGeom: Gen[(String, Int, Int, Int)] = for {
    cs <- Gen.oneOf("444", "mono", "420jpeg", "420mpeg2")
    w <- Gen.choose(1, 12).map(x => if (cs.startsWith("420")) x * 2 else x)
    h <- Gen.choose(1, 8).map(x => if (cs.startsWith("420")) x * 2 else x)
    n <- Gen.choose(1, 6)
  } yield (cs, w, h, n)

  private def sample[T](g: Gen[T], i: Int): T =
    g.pureApply(Gen.Parameters.default, Seed(0xF11E0L + i))

  test("property: encode → decode roundtrip is the identity across colourspaces") {
    (1 to 100).foreach { i =>
      val (cs, w, h, n) = sample(genGeom, i)
      val c = clip(cs, w, h, n, i)
      val back = Y4m.decode(Y4m.encode(c))
      assert(back.isDefined, s"i=$i $cs ${w}x$h")
      val d = back.get
      assert(d.width == w && d.height == h && d.colorspace == cs &&
        d.frames.length == n, s"i=$i geometry drifted")
      d.frames.zip(c.frames).zipWithIndex.foreach { case ((a, b), f) =>
        assert(a.y.sameElements(b.y) && a.u.sameElements(b.u) &&
          a.v.sameElements(b.v), s"i=$i frame $f planes drifted")
      }
    }
  }

  test("header extensions and FRAME parameters are walked past") {
    val c = clip("444", 5, 4, 3, 7)
    val enc = Y4m.encode(c, headerExtras = " Xgraft Xmore", frameParams = " Xf1")
    val d = Y4m.decode(enc)
    assert(d.exists(_.frames.length == 3), "extension tokens broke the parse")
    assert(d.get.frames.head.y.sameElements(c.frames.head.y))
  }

  test("malformations reject, never throw: magic, geometry, colourspace, truncation, bad FRAME") {
    val good = Y4m.encode(clip("444", 5, 4, 2, 3))
    assert(Y4m.decode(good).isDefined)
    // bad magic
    assert(Y4m.decode("YUV4MPEG1 W5 H4 C444\n".getBytes ++ good.drop(21)).isEmpty)
    // non-numeric width
    assert(Y4m.decode(new String(good.takeWhile(_ != '\n'), "US-ASCII")
      .replace("W5", "Wx").getBytes ++ good.dropWhile(_ != '\n')).isEmpty)
    // unsupported colourspace (spec-valid C422 — PCM-of-planes
    // decoders reject rather than misparse)
    assert(Y4m.decode(new String(good, "US-ASCII")
      .replace("C444", "C422").getBytes("ISO-8859-1")).isEmpty)
    // odd geometry under 420 subsampling
    assert(Y4m.decode(Y4m.encode(clip("444", 5, 4, 1, 3)).map(identity)
      match { case b => new String(b, "ISO-8859-1")
        .replace("C444", "C420jpeg").getBytes("ISO-8859-1") }).isEmpty)
    // truncated last frame
    assert(Y4m.decode(good.dropRight(1)).isEmpty)
    // a FRAME marker that isn't
    val broken = new String(good, "ISO-8859-1").replaceFirst("FRAME", "FRAMX")
    assert(Y4m.decode(broken.getBytes("ISO-8859-1")).isEmpty)
    // empty stream after header is a valid zero-frame clip
    assert(Y4m.decode("YUV4MPEG2 W5 H4 C444\n".getBytes("US-ASCII"))
      .exists(_.frames.isEmpty))
  }

  test("vHash60 is locality-preserving across frames and gain-invariant in shape") {
    val base = clip("mono", 5, 4, 3, 11) // 60 luma samples, the q153 shape
    val fp = Y4m.vHash60(base)
    // perturb ONE pixel of the MIDDLE frame far from the mean
    val y1 = base.frames(1).y.clone()
    y1(7) = (~y1(7)).toByte
    val near = base.copy(frames = base.frames.updated(1,
      base.frames(1).copy(y = y1)))
    val d = java.lang.Long.bitCount(fp ^ Y4m.vHash60(near))
    assert(d >= 1 && d <= 8, s"one-pixel perturbation flipped $d bits")
    // a different clip is far
    val other = clip("mono", 5, 4, 3, 99)
    assert(java.lang.Long.bitCount(fp ^ Y4m.vHash60(other)) > 8)
    // chroma must NOT change identity: the same luma under C444
    // (different chroma planes) fingerprints identically
    val c444 = Y4m.Clip(5, 4, "444", base.frames.map(f =>
      Y4m.Frame(f.y, bytes(20, 5), bytes(20, 6))))
    assert(Y4m.vHash60(c444) == fp, "chroma leaked into the fingerprint")
  }
}
