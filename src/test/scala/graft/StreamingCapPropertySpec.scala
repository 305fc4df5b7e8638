package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup
import graft.streaming.DocIngest

/** Round-8 item 8: the ADVERSARIAL-SCALE shapes of
  * `DedupCapPropertySpec` driven through the STREAMING ingest front
  * doors. A dup-heavy corpus (a boilerplate cluster far above the
  * hot-bucket cap) must not blow up a trigger: the near-dup door's
  * cap confines the emission to exactly the planted cross-boundary
  * pairs — across triggers, with replays suppressed — while the
  * uncapped control on the same shape emits the full quadratic
  * fan-out (proving the generated cluster really was pathological,
  * i.e. the cap is what kept the trigger O(batch)). The span door's
  * coverage scoring stays exact under the same boilerplate-saturated
  * index. */
class StreamingCapPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 48

  private def draw[A](g: Gen[A], i: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(0x5EED5L + i))

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private case class Shape(mCorpus: Int, mBatch: Int, planted: Int,
                           hotWords: Seq[String], pairWords: Seq[Seq[String]]) {
    def hotText: String = hotWords.zipWithIndex.map { case (w, k) => s"h${k}_$w" }.mkString(" ")
    def pairText(j: Int): String =
      pairWords(j).zipWithIndex.map { case (w, k) => s"p${j}_${k}_$w" }.mkString(" ")
  }

  private def shapeGen(pairLen: Int): Gen[Shape] = for {
    mCorpus <- Gen.chooseNum(Cap + 1, 160)
    mBatch <- Gen.chooseNum(2, 8)
    planted <- Gen.chooseNum(1, 3)
    hotLen <- Gen.chooseNum(4, 9)
    hot <- Gen.listOfN(hotLen, word)
    pairs <- Gen.listOfN(planted, Gen.listOfN(pairLen, word))
  } yield Shape(mCorpus, mBatch, planted, hot, pairs)

  /** Corpus: the hot boilerplate replicated mCorpus times + one corpus
    * half of each planted pair. Stream rows: mBatch hot replicas + the
    * batch halves, split across two triggers with a replay. */
  private def frames(sh: Shape) = {
    val corpus = ((1L to sh.mCorpus.toLong).map(i => (i, sh.hotText)) ++
      (0 until sh.planted).map(j => (3001L + j, sh.pairText(j)))).toDF("doc_id", "text")
    val streamRows: Seq[(Long, String)] =
      (1L to sh.mBatch.toLong).map(i => (1000L + i, sh.hotText)) ++
        (0 until sh.planted).map(j => (2001L + j, sh.pairText(j)))
    (corpus, streamRows)
  }

  test("streaming near-dup door: hot-bucket cap keeps exactly the planted pairs across triggers") {
    (0 until 3).foreach { i =>
      val sh = draw(shapeGen(pairLen = 6), i)
      val (corpus, rows) = frames(sh)
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = DocIngest.nearDupIngest(mem.toDF().toDF("doc_id", "text"),
          Dedup.bandTable(corpus), Cap)
        .writeStream.format("memory").queryName(s"cap_stream_$i")
        .outputMode("append").start()
      try {
        val (t1, t2) = rows.splitAt(rows.length / 2)
        mem.addData(t1: _*)
        q.processAllAvailable()
        // trigger 2 adds the rest PLUS a replay of trigger 1's head
        mem.addData((t2 ++ t1.take(1)): _*)
        q.processAllAvailable()
        val got = spark.table(s"cap_stream_$i")
          .select("doc_new", "doc_corpus").as[(Long, Long)].collect().toSet
        val want = (0 until sh.planted).map(j => (2001L + j, 3001L + j)).toSet
        assert(got == want, s"shape $i ($sh): got $got want $want")
      } finally q.stop()
    }
  }

  test("streaming near-dup door: the same shape UNCAPPED floods the sink (the cap is the O(batch) guarantee)") {
    val sh = draw(shapeGen(pairLen = 6), 50)
    val (corpus, rows) = frames(sh)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = DocIngest.nearDupIngest(mem.toDF().toDF("doc_id", "text"),
        Dedup.bandTable(corpus), Int.MaxValue)
      .writeStream.format("memory").queryName("uncap_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val n = spark.table("uncap_stream").count()
      assert(n == sh.mBatch.toLong * sh.mCorpus + sh.planted,
        s"uncapped shape should emit the full fan-out, got $n")
      assert(n > sh.planted + Cap, "shape was not pathological")
    } finally q.stop()
  }

  test("streaming span door: coverage scoring stays exact under a boilerplate-saturated index") {
    (0 until 3).foreach { i =>
      val sh0 = draw(shapeGen(pairLen = Dedup.WindowLen), 100 + i)
      val sh = sh0.copy(hotWords = draw(
        Gen.listOfN(Dedup.WindowLen, word), 200 + i))
      // corpus: hot window replicated mCorpus times (+ unique tails) +
      // the known half of each planted pair
      val corpus = ((1L to sh.mCorpus.toLong).map(k => (k, s"${sh.hotText} t$k")) ++
        (0 until sh.planted).map(j => (3001L + j, sh.pairText(j)))).toDF("doc_id", "text")
      // stream: hot replicas (coverage 1.0 — all-known), planted known
      // docs (1.0) and planted UNKNOWN docs (0.0, fresh vocabulary)
      val unknown = (0 until sh.planted).map(j =>
        (4001L + j, (1 to Dedup.WindowLen).map(k => s"u${i}_${j}_$k").mkString(" ")))
      val rows: Seq[(Long, String)] =
        (1L to sh.mBatch.toLong).map(k => (1000L + k, sh.hotText)) ++
          (0 until sh.planted).map(j => (2001L + j, sh.pairText(j))) ++ unknown
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = DocIngest.spanIngest(mem.toDF().toDF("doc_id", "text"),
          Dedup.windowTable(corpus))
        .writeStream.format("memory").queryName(s"span_cap_$i")
        .outputMode("append").start()
      try {
        val (t1, t2) = rows.splitAt(rows.length / 2)
        mem.addData(t1: _*)
        q.processAllAvailable()
        mem.addData((t2 ++ t1.take(1)): _*) // replay suppressed by state
        q.processAllAvailable()
        val got = spark.table(s"span_cap_$i")
          .select("doc_id", "coverage").as[(Long, Double)].collect().toMap
        rows.foreach { case (id, _) =>
          val want = if (id >= 4001L) 0.0 else 1.0
          assert(got(id) == want, s"shape $i doc $id: coverage ${got(id)} want $want")
        }
        assert(got.size == rows.length, "replay emitted a duplicate coverage row")
      } finally q.stop()
    }
  }
}
