package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.TextAnalysis

/** q73's funnel counts must be monotone by construction (each stage is
  * an AND of the previous), and the keep rate the implied ratio. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("filterFunnel stages are monotone and keep_rate consistent") {
    val rows = TextAnalysis.filterFunnel(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, l, lq, k, rate) =>
      assert(n >= l && l >= lq && lq >= k && k >= 0, s"non-monotone funnel for $src")
      assert(rate == k.toDouble / n.toDouble)
    }
    // the funnel must actually discriminate on this data: some docs
    // pass all gates (n_kept > 0), some fail at least one
    assert(rows.map(_._5).sum > 0)
    assert(rows.map(r => r._2 - r._5).sum > 0)
  }

  test("streaming filter funnel matches batch (complete mode quality monitor)") {
    // one doc per outcome: keeps, fails lang, fails length, fails
    // repetition (passes lang+length first)
    val enLong = "the and of to a in is it you that one two three four " +
      "five six seven eight nine ten eleven twelve thirteen fourteen " +
      "fifteen sixteen"                       // 26 toks, en, low repetition
    val repHeavy = ("the and of " * 10).trim  // 30 toks, en, rep 25/28 > 0.2
    val rows = Seq(
      (1L, enLong, "en", "s1", 0L),
      (2L, enLong, "de", "s1", 0L),           // pred en != de
      (3L, "the and of to", "en", "s1", 0L),  // 4 toks < 25
      (4L, repHeavy, "en", "s2", 0L))
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

    val batch = TextAnalysis.filterFunnelFrom(rows.toDF(cols: _*))
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    assert(batch.map(r => (r._1, r._5)) == Set(("s1", 1L), ("s2", 0L)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = TextAnalysis.filterFunnelFrom(mem.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("funnel_parity")
        .as[(String, Long, Long, Long, Long, Double)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }
}
