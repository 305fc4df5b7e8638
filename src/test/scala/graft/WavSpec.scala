package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Wav
import graft.operators.{Dedup, Multimodal}

/** The RIFF/WAVE PCM codec contract (the [[graft.functions.Ppm]]
  * discipline applied to audio): spec-conformant parse across dialect
  * variants, corrupt-reject on every malformation class, and a
  * locality-preserving fingerprint the q84 band/Hamming plan finds
  * true near-dups with. Properties sample scalacheck generators under
  * fixed seeds (the PpmSpec discipline: deterministic, re-runnable
  * failures). */
class WavSpec extends SparkSpec {
  import spark.implicits._

  private def pcm8(bytes: Array[Int]): Wav.Pcm = Wav.Pcm(1, 8000, 8, bytes)

  private val gen8: Gen[Array[Int]] = for {
    n <- Gen.choose(1, 300)
    bs <- Gen.listOfN(n, Gen.choose(0, 255))
  } yield bs.toArray

  private val gen16: Gen[Array[Int]] = for {
    n <- Gen.choose(1, 200)
    ss <- Gen.listOfN(n, Gen.choose(-32768, 32767))
  } yield ss.toArray

  private def sample[T](g: Gen[T], i: Int): T =
    g.pureApply(Gen.Parameters.default, Seed(0xA0D10L + i))

  test("property: encode → decode roundtrip is the identity (8- and 16-bit)") {
    (1 to 100).foreach { i =>
      val p8 = pcm8(sample(gen8, i))
      val back8 = Wav.decodeWav(Wav.encodeWav(p8))
      assert(back8.exists(d => d.bits == 8 && d.channels == 1 &&
        d.sampleRate == 8000 && d.samples.sameElements(p8.samples)), s"8-bit i=$i")
      val ss = sample(gen16, i)
      val p16 = Wav.Pcm(2, 44100, 16, ss ++ ss) // stereo: whole frames
      val back16 = Wav.decodeWav(Wav.encodeWav(p16))
      assert(back16.exists(d => d.bits == 16 && d.channels == 2 &&
        d.sampleRate == 44100 && d.samples.sameElements(p16.samples)), s"16-bit i=$i")
    }
  }

  test("unknown chunks are walked past, including the odd-size pad byte") {
    val data = (0 until 60).map(i => (i * 7) % 256).toArray
    val raw = data.map(_.toByte)
    for (junk <- Seq(
      Wav.extraChunk("LIST", "INFO".getBytes("US-ASCII")),      // even
      Wav.extraChunk("LIST", "tag".getBytes("US-ASCII")),       // odd → pad
      Wav.extraChunk("JUNK", Array.empty[Byte]),                // zero-size
      Wav.extraChunk("LIST", "INFOabc".getBytes("US-ASCII")) ++ // two chunks
        Wav.extraChunk("fact", Array[Byte](60, 0, 0, 0)))) {
      val bytes = Wav.header(1, 8000, 8, 60, junk) ++ raw
      val d = Wav.decodeWav(bytes)
      assert(d.exists(_.samples.sameElements(data)),
        s"junk chunk of ${junk.length} bytes broke the parse")
    }
  }

  test("16-bit samples decode signed little-endian") {
    // bytes (0x00,0x80) → -32768; (0xff,0x7f) → 32767; (0x01,0x00) → 1
    val bytes = Wav.header(1, 8000, 16, 6) ++
      Array(0x00, 0x80, 0xff, 0x7f, 0x01, 0x00).map(_.toByte)
    val d = Wav.decodeWav(bytes)
    assert(d.exists(_.samples.sameElements(Array(-32768, 32767, 1))))
    assert(d.get.amplitudes.sameElements(Array(0, 65535, 32769)))
  }

  test("every malformation class rejects (None), never throws or misparses") {
    val good = Wav.encodeWav(pcm8((0 until 60).toArray))
    def mutate(f: Array[Byte] => Array[Byte]): Option[Wav.Pcm] =
      Wav.decodeWav(f(good.clone()))
    assert(mutate(b => { b(3) = 'X'; b }).isEmpty, "bad RIFF magic")
    assert(mutate(b => { b(10) = 'X'; b }).isEmpty, "bad WAVE tag")
    assert(mutate(b => { b(20) = 3; b }).isEmpty, "non-PCM format tag")
    assert(mutate(b => { b(34) = 12; b }).isEmpty, "unsupported bit width")
    assert(mutate(b => { b(32) = 7; b }).isEmpty, "inconsistent block align")
    assert(mutate(_.dropRight(1)).isEmpty, "truncated data payload")
    assert(mutate(_.take(40)).isEmpty, "truncated header")
    assert(Wav.decodeWav(Array[Byte]()).isEmpty)
    assert(Wav.decodeWav("P6\n10 6\n255\n".getBytes("US-ASCII")).isEmpty,
      "a P6 image is not a WAV")
    // data chunk before any fmt chunk: structurally present, must reject
    val noFmt = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](16, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII") ++
      "data".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    assert(Wav.decodeWav(noFmt).isEmpty, "data before fmt")
  }

  test("property: ampHash60 is locality-preserving — one perturbed sample flips few bits") {
    val gen = for {
      bs <- Gen.listOfN(60, Gen.choose(0, 255)).map(_.toArray)
      k <- Gen.choose(0, 59)
      d <- Gen.choose(1, 255)
    } yield (bs, k, d)
    (1 to 100).foreach { i =>
      val (bs, k, d) = sample(gen, i)
      val a = pcm8(bs)
      val mutated = bs.clone(); mutated(k) = (mutated(k) + d) % 256
      val b = pcm8(mutated)
      val hamming = java.lang.Long.bitCount(Wav.ampHash60(a) ^ Wav.ampHash60(b))
      // one sample moves the mean by < 255/60 ≈ 4.3 — only samples
      // within that slack of the threshold can flip alongside bit k
      assert(hamming <= 12, s"one-sample perturbation flipped $hamming bits (i=$i)")
    }
  }

  test("ampHash60 is invariant under uniform gain (8- vs scaled-16-bit)") {
    val bs = (0 until 60).map(i => (i * 37 + 11) % 256).toArray
    val a8 = Wav.ampHash60(pcm8(bs))
    // ×256 gain in amplitude space: samples (b·256 − 32768) in 16-bit
    val a16 = Wav.ampHash60(Wav.Pcm(1, 8000, 16, bs.map(_ * 256 - 32768)))
    assert(a8 == a16)
  }

  test("planted near-dup WAV clips pair through the band/cap/Hamming plan") {
    // the Spark-side arm, mirroring MultimodalSpec's image proof: the
    // locality-preserving fingerprint makes the q84 plan find true
    // near-dups on the audio modality, not just exact dups
    def clip(seed: Int, perturb: Int): Array[Byte] = {
      val samples = (0 until 60).map { i =>
        (((seed * 31 + i * 97) % 200) + (if (i == perturb) 55 else 0)) % 256
      }.toArray
      Wav.encodeWav(Wav.Pcm(1, 8000, 8, samples))
    }
    val rows = Seq(
      (1L, clip(7, 5)), (2L, clip(7, 40)), (3L, clip(99, 0)))
      .toDF("media_id", "payload")
    val fp = Multimodal.wavDecode(rows).toDF()
      .filter(col("ok")).select(col("media_id"), col("fp"))
    val pairs = Multimodal.bandedFpPairs(fp, Dedup.MaxLshBucket)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup pair missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated clip spuriously paired")
  }
}
