package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

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

  test("q31: real-decode frame sample agrees with the q47 frame fan-out (two codec paths)") {
    // round-12 item 4: q31's stride-2 frame feature and q47's per-row
    // frame sample are INDEPENDENT walks of the same decoded rasters —
    // per-kind sums must agree exactly (and with the corrupt subset
    // excluded from both)
    val q31 = Multimodal.mediaFeatures(spark, sfDir)
      .select("kind", "frame_sum").as[(String, Long)].collect().toMap
    val fromFrames = Multimodal.ppmFrameSample(Multimodal.ppmMediaTable(spark, sfDir))
      .toDF()
      .filter(pmod(col("frame_idx"), lit(2)) === 0)
      .withColumn("kind",
        when(pmod(col("media_id"), lit(3)) === 0, "image")
          .when(pmod(col("media_id"), lit(3)) === 1, "audio")
          .otherwise("video"))
      .groupBy("kind")
      .agg(sum(col("r_sum") + col("g_sum") + col("b_sum")).as("f"))
      .as[(String, Long)].collect().toMap
    assert(q31.keySet == Set("image", "audio", "video"))
    assert(q31 == fromFrames, s"q31=$q31 frames=$fromFrames")
    // byte stats are real payload bytes: every blob is header + 180
    val nb = Multimodal.mediaFeatures(spark, sfDir)
      .agg(sum(col("total_bytes")), sum(col("n_media"))).as[(Long, Long)].head()
    assert(nb._1 > nb._2 * 180, "total_bytes must include real header bytes")
  }

  test("q84: planted duplicate payloads pair up; distinct payloads don't") {
    val mk = (i: Long, seed: String) =>
      (i, java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8")) ++ Array.fill[Byte](16)(0x7))
    val media = (Seq(mk(1L, "dup"), mk(2L, "dup"), mk(3L, "other")) :+ mk(4L, "dup"))
      .toDF("media_id", "payload")
    val pairs = Multimodal.mediaDedupPairsFrom(media, Dedup.MaxLshBucket)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    // three identical payloads -> all three pairs; the distinct one pairs with none
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("q84: the media hot-bucket cap fires observably on a boilerplate blob cluster") {
    val payload = Array.fill[Byte](32)(0x5)
    val media = ((1L to 150L).map(i => (i, payload)) ++ Seq(
      (901L, Array.fill[Byte](32)(0x9)), (902L, Array.fill[Byte](32)(0x9))))
      .toDF("media_id", "payload")
    val capped = Multimodal.mediaDedupPairsFrom(media, 100)
    val rows = capped.collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((901L, 902L)),
      s"cap must keep only the normal pair, got ${got.size} pairs")
    val m = capped.queryExecution.observedMetrics("graft.cap(media:band,bval)")
    // one identical blob -> one 150-member bucket in each of 4 bands
    assert(m.getAs[Long]("hot_buckets") == 4L && m.getAs[Long]("dropped_rows") == 600L,
      m.toString)
    val uncapped = Multimodal.mediaDedupPairsFrom(media, Int.MaxValue).count()
    assert(uncapped == 150L * 149 / 2 + 1)
  }

  test("q84 property: with a locality-preserving fingerprint the plan finds planted NEAR-dups") {
    // toy locality-preserving fingerprint: bit i = sign of payload
    // byte i — flipping k bytes flips exactly k bits, the property a
    // real pHash has and md5 destroys. Product payloads use bytes
    // ±100, so every bit is decisively set.
    val toyFp = udf { (b: Array[Byte]) =>
      var fp = 0L; var i = 0
      while (i < 60 && i < b.length) { if (b(i) > 0) fp |= (1L << i); i += 1 }
      fp
    }
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val bases = Array.fill(30)(Array.fill[Byte](60)(
        if (rnd.nextBoolean()) 100 else -100))
      // near-dup partner: flip 1..8 byte signs at positions >= 15, so
      // band 0 (bits 0-14) stays identical — banding MUST bucket the
      // pair — while the Hamming distance equals the planted flip count
      val flips = Array.tabulate(30) { i =>
        val k = 1 + rnd.nextInt(8)
        rnd.shuffle((15 until 60).toList).take(k)
      }
      val rows = (0 until 30).flatMap { i =>
        val dup = bases(i).clone()
        flips(i).foreach(p => dup(p) = (-dup(p)).toByte)
        Seq((2L * i, bases(i)), (2L * i + 1, dup))
      }
      val got = Multimodal.mediaDedupPairsFrom(
          rows.toDF("media_id", "payload"), Dedup.MaxLshBucket,
          fingerprint = toyFp(_))
        .as[(Long, Long, Int)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val want = (0 until 30).map(i =>
        (2L * i, 2L * i + 1) -> flips(i).size).toMap
      // every planted near-dup found at exactly its flip distance; no
      // cross-base pair sneaks in (distinct random bases are ~30 bits
      // apart — far beyond the Hamming gate)
      assert(got == want, s"seed=$seed got=${got.size} want=${want.size}")
    }
  }
}
