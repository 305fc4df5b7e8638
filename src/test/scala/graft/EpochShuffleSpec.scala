package graft

import org.apache.spark.sql.Row
import graft.operators.Pipeline

/** q156 — the deterministic epoch shuffle: per-epoch md5 permutation
  * realized as (shard, u) sort keys, censused per (epoch, shard) with
  * an order checksum, plus decorrelation/plan facts as rows. */
class EpochShuffleSpec extends SparkSpec {

  private lazy val out: Array[Row] =
    Pipeline.epochShuffle(spark, sfDir).collect()

  private def metaRow(k: Long): Row =
    out.find(r => r.getLong(0) == 99L && r.getLong(1) == k).get

  test("census covers both epochs, every shard in range, full corpus") {
    val data = out.filter(_.getLong(0) != 99L)
    assert(data.map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(data.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    Seq(0L, 1L).foreach { ep =>
      assert(data.filter(_.getLong(0) == ep).map(_.getLong(2)).sum == n,
        s"epoch $ep shard counts must partition the corpus")
    }
  }

  test("the shuffle is deterministic: a re-run reproduces every row") {
    val again = Pipeline.epochShuffle(spark, sfDir).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("epochs decorrelate: same-shard overlap is a strict subset") {
    val ov = metaRow(0L)
    val overlap = ov.getLong(2)
    val n = ov.getLong(3)
    // a permutation-per-epoch must NOT keep docs in their shard; with
    // S=8 the expectation is n/8 — accept anything well below n
    assert(overlap < n / 2, s"overlap $overlap of $n: epochs correlated")
    assert(overlap >= 0)
  }

  test("plan facts hold: one hash exchange, one corpus scan") {
    assert(metaRow(1L).getLong(2) == 1L,
      "window + census aggregate must share one (epoch, shard) exchange")
    assert(metaRow(2L).getLong(2) == 1L,
      "both epochs must ride a single documents scan (explode)")
  }

  test("order checksum is order-sensitive: independent recompute matches") {
    // independent driver-side derivation of epoch 0, shard of doc 's'
    // order — any wrong within-shard order flips sum(u * rank)
    import java.security.MessageDigest
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def u(ep: Long, id: Long): Long = {
      val h = MessageDigest.getInstance("MD5")
        .digest(s"epoch$ep:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
    }
    val expect = (for { ep <- Seq(0L, 1L); (id, nc) <- docs } yield {
      val uu = u(ep, id)
      (ep, uu >> 29, id, nc, uu)
    }).groupBy(t => (t._1, t._2)).map { case ((ep, sh), rows) =>
      val sorted = rows.sortBy(t => (t._5, t._3))
      val ck = sorted.zipWithIndex.map { case (t, i) => t._5 * (i + 1) }.sum
      (ep, sh, rows.size.toLong, rows.map(_._4).sum, ck)
    }.toSet
    val got = out.filter(_.getLong(0) != 99L)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
  }
}
